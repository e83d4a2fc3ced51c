"""I3D (Inflated 3D Inception-v1, Carreira & Zisserman 2017) — the
canonical FVD feature extractor (BASELINE B5; VERDICT round-1 weak #7).

Pretrained Kinetics-400 weights are not obtainable in this offline
environment, so this module ships the complete ARCHITECTURE, jitted and
unit-tested with random weights; absolute FVD then needs only a weight
file in the documented layout below ("drop a file in, not write code").

Weight file layout (flat .npz, all float32):

    <unit>/w      conv kernel, DHWIO (kd, kh, kw, cin, cout)
    <unit>/beta   BatchNorm shift (cout,)   [TF I3D BN: center, no scale]
    <unit>/mean   BN moving mean (cout,)
    <unit>/var    BN moving variance (cout,)
    Logits/Conv3d_0c_1x1/w   (1, 1, 1, 1024, 400)
    Logits/Conv3d_0c_1x1/b   (400,)

Unit names follow the public kinetics-i3d checkpoint naming so converting
it is a mechanical rename, e.g.::

    Conv3d_1a_7x7
    Conv3d_2b_1x1, Conv3d_2c_3x3
    Mixed_3b/Branch_0/Conv3d_0a_1x1
    Mixed_3b/Branch_1/Conv3d_0a_1x1, Mixed_3b/Branch_1/Conv3d_0b_3x3
    Mixed_3b/Branch_2/Conv3d_0a_1x1, Mixed_3b/Branch_2/Conv3d_0b_3x3
    Mixed_3b/Branch_3/Conv3d_0b_1x1
    ... (3c, 4b-4f, 5b, 5c)

FVD protocol: videos in [-1, 1], resized to 224x224 (bilinear, half-pixel
centers — ops/preproc.py matrices), >= 9 frames; features are the 400-d
pre-softmax logits (TF-GAN convention) or the 1024-d average-pooled
embedding (``features="pool"``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Inception-v1 module channel table: (b0, b1_reduce, b1, b2_reduce, b2, b3).
_MIXED: Dict[str, Tuple[int, int, int, int, int, int]] = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}

NUM_CLASSES = 400
EMBED_DIM = 1024
_BN_EPS = 1e-3


def _mixed_out(spec) -> int:
    return spec[0] + spec[2] + spec[4] + spec[5]


def conv_units() -> List[Tuple[str, Tuple[int, int, int], int, int]]:
    """All BN conv units as (name, kernel, cin, cout), in forward order."""
    units: List[Tuple[str, Tuple[int, int, int], int, int]] = [
        ("Conv3d_1a_7x7", (7, 7, 7), 3, 64),
        ("Conv3d_2b_1x1", (1, 1, 1), 64, 64),
        ("Conv3d_2c_3x3", (3, 3, 3), 64, 192),
    ]
    cin = 192
    for name, s in _MIXED.items():
        b0, b1r, b1, b2r, b2, b3 = s
        units += [
            (f"{name}/Branch_0/Conv3d_0a_1x1", (1, 1, 1), cin, b0),
            (f"{name}/Branch_1/Conv3d_0a_1x1", (1, 1, 1), cin, b1r),
            (f"{name}/Branch_1/Conv3d_0b_3x3", (3, 3, 3), b1r, b1),
            (f"{name}/Branch_2/Conv3d_0a_1x1", (1, 1, 1), cin, b2r),
            (f"{name}/Branch_2/Conv3d_0b_3x3", (3, 3, 3), b2r, b2),
            (f"{name}/Branch_3/Conv3d_0b_1x1", (1, 1, 1), cin, b3),
        ]
        cin = _mixed_out(s)
    return units


def expected_shapes() -> Dict[str, Tuple[int, ...]]:
    """The documented npz contract, key -> shape."""
    out: Dict[str, Tuple[int, ...]] = {}
    for name, k, cin, cout in conv_units():
        out[f"{name}/w"] = (*k, cin, cout)
        for p in ("beta", "mean", "var"):
            out[f"{name}/{p}"] = (cout,)
    out["Logits/Conv3d_0c_1x1/w"] = (1, 1, 1, EMBED_DIM, NUM_CLASSES)
    out["Logits/Conv3d_0c_1x1/b"] = (NUM_CLASSES,)
    return out


def init_random(key: jax.Array) -> Dict[str, np.ndarray]:
    """He-normal random weights in the documented layout (tests; relative
    FVD with random I3D features is itself a documented proxy)."""
    params: Dict[str, np.ndarray] = {}
    shapes = expected_shapes()
    keys = jax.random.split(key, len(shapes))
    for (name, shape), k in zip(sorted(shapes.items()), keys):
        if name.endswith("/w"):
            fan_in = int(np.prod(shape[:-1]))
            params[name] = np.asarray(
                jax.random.normal(k, shape, jnp.float32)
                * np.sqrt(2.0 / fan_in))
        elif name.endswith("/var"):
            params[name] = np.ones(shape, np.float32)
        else:
            params[name] = np.zeros(shape, np.float32)
    return params


def load_npz(path: str) -> Dict[str, np.ndarray]:
    """Load + validate a weight file against the documented contract."""
    raw = dict(np.load(path))
    want = expected_shapes()
    missing = [k for k in want if k not in raw]
    bad = [(k, tuple(raw[k].shape), want[k]) for k in want
           if k in raw and tuple(raw[k].shape) != want[k]]
    if missing or bad:
        msg = []
        if missing:
            msg.append(f"missing {len(missing)} keys, e.g. {missing[:4]}")
        if bad:
            msg.append("shape mismatches: "
                       + "; ".join(f"{k}: got {g}, want {w}"
                                   for k, g, w in bad[:4]))
        raise ValueError(f"I3D weight file {path} invalid: "
                         + " | ".join(msg))
    return {k: np.asarray(raw[k], np.float32) for k in want}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _unit(params, name: str, x: jax.Array,
          stride: Tuple[int, int, int] = (1, 1, 1)) -> jax.Array:
    """Conv3D(SAME) + BN(inference; center only) + ReLU."""
    y = jax.lax.conv_general_dilated(
        x, params[f"{name}/w"], window_strides=stride, padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    inv = jax.lax.rsqrt(params[f"{name}/var"] + _BN_EPS)
    y = (y - params[f"{name}/mean"]) * inv + params[f"{name}/beta"]
    return jax.nn.relu(y)


def _maxpool(x: jax.Array, k: Tuple[int, int, int],
             s: Tuple[int, int, int]) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, *k, 1), (1, *s, 1), "SAME")


def _mixed(params, name: str, x: jax.Array) -> jax.Array:
    b0 = _unit(params, f"{name}/Branch_0/Conv3d_0a_1x1", x)
    b1 = _unit(params, f"{name}/Branch_1/Conv3d_0a_1x1", x)
    b1 = _unit(params, f"{name}/Branch_1/Conv3d_0b_3x3", b1)
    b2 = _unit(params, f"{name}/Branch_2/Conv3d_0a_1x1", x)
    b2 = _unit(params, f"{name}/Branch_2/Conv3d_0b_3x3", b2)
    b3 = _maxpool(x, (3, 3, 3), (1, 1, 1))
    b3 = _unit(params, f"{name}/Branch_3/Conv3d_0b_1x1", b3)
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def apply(params, videos: jax.Array, features: str = "logits") -> jax.Array:
    """videos: (B, T, H, W, C) float in [-1, 1] ->
    (B, 400) logits or (B, 1024) pooled embedding."""
    x = videos.astype(jnp.float32)
    x = _unit(params, "Conv3d_1a_7x7", x, stride=(2, 2, 2))
    x = _maxpool(x, (1, 3, 3), (1, 2, 2))
    x = _unit(params, "Conv3d_2b_1x1", x)
    x = _unit(params, "Conv3d_2c_3x3", x)
    x = _maxpool(x, (1, 3, 3), (1, 2, 2))
    x = _mixed(params, "Mixed_3b", x)
    x = _mixed(params, "Mixed_3c", x)
    x = _maxpool(x, (3, 3, 3), (2, 2, 2))
    for n in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        x = _mixed(params, n, x)
    x = _maxpool(x, (2, 2, 2), (2, 2, 2))
    x = _mixed(params, "Mixed_5b", x)
    x = _mixed(params, "Mixed_5c", x)
    # Canonical kinetics-i3d head: avg_pool3d window (2, 7, 7), VALID,
    # stride 1 over the Mixed_5c map, then the (linear) logits conv per
    # window position averaged over time. Averaging window outputs FIRST
    # is identical by linearity, and for T' > 2 (32-frame clips) it weights
    # interior frames (1,2,2,...,2,1)/(2(T'-1)) — a uniform global mean
    # would deviate from published FVD for anything longer than 16 frames.
    # Windows clamp to the map size so sub-224 inputs (random-weight
    # relative mode) still work; at 224x224x16f (T'=2, 7x7) this reduces
    # to the single full-map window.
    bt, h5, w5 = x.shape[1], x.shape[2], x.shape[3]
    k = (min(2, bt), min(7, h5), min(7, w5))
    win = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, *k, 1),
                                (1, 1, 1, 1, 1), "VALID")
    pooled = (win / float(k[0] * k[1] * k[2])).mean(axis=(1, 2, 3))
    if features == "pool":
        return pooled
    if features != "logits":
        raise ValueError(f"features must be 'logits' or 'pool', "
                         f"got {features!r}")
    w = params["Logits/Conv3d_0c_1x1/w"][0, 0, 0]     # (1024, 400)
    return pooled @ w + params["Logits/Conv3d_0c_1x1/b"]


def resize_videos(videos: jax.Array, size: int = 224) -> jax.Array:
    """FVD protocol resize (bilinear, half-pixel centers) on [-1,1] floats,
    expressed as the same two matmuls the ingest kernel uses."""
    from mocogan_tpu.ops.preproc import bilinear_matrix

    b, t, h, w, c = videos.shape
    if (h, w) == (size, size):
        return videos
    rh = jnp.asarray(bilinear_matrix(h, size))
    rw = jnp.asarray(bilinear_matrix(w, size))
    x = jnp.einsum("sh,bthwc->btswc", rh, videos.astype(jnp.float32))
    return jnp.einsum("vw,btswc->btsvc", rw, x)


class I3DExtractor:
    """Callable extractor for eval/fvd.py: videos (B,T,H,W,C) in [-1,1]
    -> np features. Weights from an npz in the documented layout, or
    random (seed) for relative-only comparisons."""

    def __init__(self, weights_path: str | None = None, *,
                 features: str = "logits", resize_to: int | None = 224,
                 seed: int = 0):
        self.params = (load_npz(weights_path) if weights_path
                       else init_random(jax.random.key(seed)))
        self.params = jax.tree.map(jnp.asarray, self.params)
        self.features = features
        self.resize_to = resize_to

    @functools.cached_property
    def _apply(self):
        feats, rs = self.features, self.resize_to

        @jax.jit
        def run(params, videos):
            if rs:
                videos = resize_videos(videos, rs)
            return apply(params, videos, features=feats)

        return run

    def __call__(self, videos: jax.Array) -> np.ndarray:
        return np.asarray(jax.device_get(self._apply(self.params, videos)))
