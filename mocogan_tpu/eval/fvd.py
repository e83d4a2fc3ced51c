"""FVD (Fréchet Video Distance) harness (BASELINE B5).

The reference publishes no quantitative metrics (BASELINE.md); FVD parity is
a build-side requirement. FVD = Fréchet distance between Gaussian fits of
video features from a 3D conv network, canonically an I3D pretrained on
Kinetics.

This environment is fully offline, so pretrained I3D weights are not
obtainable; the harness therefore separates the METRIC (exact Fréchet
computation, feature batching, statistics) from the FEATURE EXTRACTOR:

  * `I3DFeatures(weights_path)` — loads real I3D-style weights from an .npz
    if the user provides one; raises a clear error otherwise.
  * `RandomProjectionFeatures` — a fixed-seed random 3D conv net. Random
    convolutional features are a documented, commonly-used proxy for
    relative comparisons (same extractor both sides); absolute values are
    NOT comparable to published FVD numbers.

Both run jitted on TPU.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mocogan_tpu.ops import layers

# Bumped on ANY change to the eval panel's numerical semantics (extractor
# architecture, feature batching, panel formulas). Round 4 proved that
# eval-code drift silently invalidates longitudinal fvd_proxy comparisons
# (docs/results/flagship_5Xk_compare: losses bit-identical, fvd nabc 3.29
# purely from a mid-round eval change) — so every panel record now carries
# `extractor_fingerprint(...)`, which hashes this version together with
# the extractor's actual weights, and eval/compare_runs.py refuses to
# read fvd divergence as a training signal across differing fingerprints.
# History: 1 = rounds 1-2 (dim 256); 2 = rounds 3-4 (dim 64, chunked
# host-side panel); 3 = round 5 (fused single-dispatch panel program —
# verified numerically equivalent to v2 in tests/test_panel.py).
EVAL_VERSION = 3


def extractor_fingerprint(extractor) -> str:
    """Self-describing identity of an eval feature extractor:
    ``v{EVAL_VERSION}-{sha256(dim || weights)[:12]}``. Logged with every
    eval-panel record so cross-run fvd_proxy comparisons can detect
    eval-code/extractor drift (VERDICT r4 weak #4)."""
    import hashlib

    h = hashlib.sha256()
    h.update(str(EVAL_VERSION).encode())
    h.update(str(getattr(extractor, "dim", "?")).encode())
    for leaf in jax.tree.leaves(getattr(extractor, "params", {})):
        h.update(np.asarray(jax.device_get(leaf)).tobytes())
    return f"v{EVAL_VERSION}-{h.hexdigest()[:12]}"


def gaussian_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mean (D,), covariance (D, D))."""
    mu = features.mean(axis=0)
    cov = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(cov)


def _trace_sqrt_product(sigma1: np.ndarray, sigma2: np.ndarray) -> float:
    """Tr(sqrt(S1 S2)) via symmetric eigendecompositions only.

    S1 S2 is not symmetric, but sqrt(S1) S2 sqrt(S1) is symmetric PSD with
    the same eigenvalues as S1 S2, so the trace of the matrix square root
    equals the sum of the square roots of its (clipped) eigenvalues. This
    is numerically stabler than a general sqrtm on the non-symmetric
    product and avoids complex round-off leaking into the distance."""
    vals1, vecs1 = np.linalg.eigh(sigma1)
    sq1 = (vecs1 * np.sqrt(np.clip(vals1, 0.0, None))) @ vecs1.T
    prod = sq1 @ sigma2 @ sq1
    vals = np.linalg.eigvalsh((prod + prod.T) / 2.0)
    return float(np.sqrt(np.clip(vals, 0.0, None)).sum())


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray,
                     sigma2: np.ndarray, eps: float = 1e-6) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)), the FID/FVD
    Fréchet form, with the cross term from `_trace_sqrt_product`."""
    diff = mu1 - mu2
    tsp = _trace_sqrt_product(sigma1, sigma2)
    if not np.isfinite(tsp):
        offset = np.eye(sigma1.shape[0]) * eps
        tsp = _trace_sqrt_product(sigma1 + offset, sigma2 + offset)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * tsp)


@dataclasses.dataclass
class RandomProjectionFeatures:
    """Fixed-seed random 3D conv feature net: 4 stride-2 conv3d stages +
    global average pool + random projection to `dim` features.

    ``dim`` defaults to 64 so that the Fréchet statistics are estimable
    from the default eval budget: FVD fits a dim x dim covariance, which
    needs clip count >= ~4x dim for the estimate to not be dominated by
    sampling noise (with N < dim the sample covariance is rank-deficient).
    The trainer's default ``eval_clips=256`` keeps that 4x ratio; raise
    both together if you raise either. (Round 2 shipped dim=256 with 64
    eval clips — a rank-64 estimate of a 256x256 covariance — which made
    in-run fvd_proxy excursions mostly estimator noise; VERDICT r2 weak
    #2. Absolute values are NOT comparable across dims.)"""

    dim: int = 64
    width: int = 32
    seed: int = 0

    def __post_init__(self):
        key = jax.random.key(self.seed)
        ks = jax.random.split(key, 5)
        c = self.width

        def he(k, kshape, cin, cout):
            fan_in = int(np.prod(kshape)) * cin
            w = jax.random.normal(k, (*kshape, cin, cout), jnp.float32)
            return {"w": w * np.sqrt(2.0 / fan_in),
                    "b": jnp.zeros((cout,), jnp.float32)}

        self.params = {
            "conv0": he(ks[0], (3, 4, 4), 3, c),
            "conv1": he(ks[1], (3, 4, 4), c, c * 2),
            "conv2": he(ks[2], (3, 4, 4), c * 2, c * 4),
            "conv3": he(ks[3], (3, 4, 4), c * 4, c * 8),
            "proj": {
                "w": jax.random.normal(ks[4], (c * 8, self.dim), jnp.float32)
                * np.sqrt(1.0 / (c * 8)),
                "b": jnp.zeros((self.dim,), jnp.float32),
            },
        }

    @functools.cached_property
    def _apply(self) -> Callable[[jax.Array], jax.Array]:
        params = self.params

        @jax.jit
        def apply(videos: jax.Array) -> jax.Array:
            h = videos.astype(jnp.float32)  # (B,T,H,W,C) in [-1,1]
            for i in range(4):
                st = (1, 2, 2) if i == 0 else (2, 2, 2)
                h = layers.conv3d(params[f"conv{i}"], h, stride=st)
                h = layers.leaky_relu(h)
            h = h.mean(axis=(1, 2, 3))
            return layers.dense(params["proj"], h)

        return apply

    def __call__(self, videos: jax.Array) -> np.ndarray:
        return np.asarray(jax.device_get(self._apply(videos)))


def I3DFeatures(weights_path: str, *, features: str = "logits",
                resize_to: int = 224):
    """Real I3D features from user-supplied Kinetics weights (offline env:
    none are bundled, but the full inflated-Inception-v1 architecture is
    implemented and unit-tested — see eval/i3d.py for the documented npz
    weight layout; loading validates every tensor's shape).

    A weights file is REQUIRED here: a falsy path would silently produce
    random-weight features labeled as absolute I3D-FVD. For relative
    tracking without weights use RandomProjectionFeatures or
    I3DExtractor(None, seed=...) explicitly."""
    if not weights_path:
        raise ValueError(
            "I3DFeatures requires a weights npz path; absolute FVD from "
            "random weights would be meaningless. Use "
            "RandomProjectionFeatures() (or i3d.I3DExtractor(None)) for "
            "relative-only comparisons.")
    from mocogan_tpu.eval.i3d import I3DExtractor

    return I3DExtractor(weights_path, features=features,
                        resize_to=resize_to)


def batched_features(videos: np.ndarray,
                     extractor: Callable[[jax.Array], np.ndarray],
                     batch_size: int = 32) -> np.ndarray:
    """Extractor features over N videos in bounded dispatches -> (N, dim).
    Shared by fvd() and the trainer's eval panel (which also derives
    spread/diversity statistics from the same features)."""
    out = []
    for i in range(0, len(videos), batch_size):
        out.append(extractor(jnp.asarray(videos[i:i + batch_size])))
    return np.concatenate(out)


def fvd(videos_a: np.ndarray, videos_b: np.ndarray,
        extractor: Optional[Callable[[jax.Array], np.ndarray]] = None,
        batch_size: int = 32) -> float:
    """FVD between two sets of videos (N, T, H, W, C) in [-1, 1]."""
    extractor = extractor or RandomProjectionFeatures()
    mu_a, s_a = gaussian_statistics(
        batched_features(videos_a, extractor, batch_size))
    mu_b, s_b = gaussian_statistics(
        batched_features(videos_b, extractor, batch_size))
    return frechet_distance(mu_a, s_a, mu_b, s_b)
