"""Classical per-frame video quality metrics: PSNR and SSIM.

Complements the distributional metrics (fvd_proxy) and the trainer's
balance panel (gen_spread_ratio / dv_margin) with REFERENCE-based,
absolute per-frame scores — the standard instruments for
reconstruction-style checks (import parity, preprocessing fidelity,
cross-implementation comparisons) where Fréchet statistics are the wrong
tool. Also provides a pairwise-SSIM sample-diversity score: near-1 mean
pairwise SSIM between independently generated clips is a mode-collapse
signature that feature-space spread can miss when the collapse is
low-frequency.

All math is jnp and jittable; inputs are (..., H, W, C) in [-1, 1] (the
pipeline's video range — converted internally to [0, 1] where the metric
definitions assume it).

SSIM follows Wang et al. 2004 with the standard 11x11 Gaussian window
(sigma 1.5), K1=0.01, K2=0.03, implemented as depthwise convolutions so
XLA lowers it to MXU-friendly convs rather than host loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _to_unit(x: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] video range -> [0, 1] metric range, clipped."""
    return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)


def psnr(a: jnp.ndarray, b: jnp.ndarray,
         axis=(-3, -2, -1)) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB over `axis` (default: per frame).

    a, b: same shape, [-1, 1]. Identical inputs give +inf (standard
    convention — guard upstream if averaging).
    """
    a = _to_unit(jnp.asarray(a, jnp.float32))
    b = _to_unit(jnp.asarray(b, jnp.float32))
    mse = jnp.mean((a - b) ** 2, axis=axis)
    return 10.0 * (jnp.log10(1.0) - jnp.log10(mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-0.5 * ((np.arange(size) - (size - 1) / 2) / sigma) ** 2)
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2D valid-mode filtering of (N, H, W, C)."""
    c = x.shape[-1]
    k = jnp.broadcast_to(kernel[:, :, None, None],
                         (*kernel.shape, 1, c))  # HWIO, feature_group=C
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


@functools.partial(jax.jit, static_argnames=("window", "sigma"))
def ssim(a: jnp.ndarray, b: jnp.ndarray, *, window: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM per image: (..., H, W, C) x2 -> (...,). H, W >= window.

    Leading dims are flattened into a batch for the depthwise convs and
    restored, so frames, clips, and batches of clips all work.
    """
    a = _to_unit(jnp.asarray(a, jnp.float32))
    b = _to_unit(jnp.asarray(b, jnp.float32))
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    lead = a.shape[:-3]
    a4 = a.reshape((-1, *a.shape[-3:]))
    b4 = b.reshape((-1, *b.shape[-3:]))
    kern = jnp.asarray(_gaussian_kernel(window, sigma))
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu_a = _filter2d(a4, kern)
    mu_b = _filter2d(b4, kern)
    var_a = _filter2d(a4 * a4, kern) - mu_a * mu_a
    var_b = _filter2d(b4 * b4, kern) - mu_b * mu_b
    cov = _filter2d(a4 * b4, kern) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den, axis=(-3, -2, -1)).reshape(lead)


def clip_psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) x2 -> (B,) mean per-frame PSNR per clip."""
    return jnp.mean(psnr(a, b), axis=-1)


def clip_ssim(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) x2 -> (B,) mean per-frame SSIM per clip."""
    return jnp.mean(ssim(a, b), axis=-1)


def frame_content_features(videos: jnp.ndarray) -> jnp.ndarray:
    """Per-frame content descriptor: spatial mean per channel.

    (..., T, H, W, C) in [-1, 1] -> (..., T, C) in [0, 1]. This is the
    pixel-space descriptor the MoCoGAN paper uses for ACD on non-face
    datasets (per-frame average color); for faces the paper substitutes
    OpenFace embeddings — pass such features directly to
    ``acd_from_features`` when an embedding model is available.
    """
    return jnp.mean(_to_unit(jnp.asarray(videos, jnp.float32)),
                    axis=(-3, -2))


@jax.jit
def acd_from_features(feats: jnp.ndarray) -> jnp.ndarray:
    """Average Content Distance from per-frame features.

    feats: (B, T, D). For each clip: mean L2 distance over all ordered
    frame pairs (i != j); returned as the mean over clips. 0 means the
    content descriptor is constant through time (perfectly preserved
    identity); large values mean the clip's content drifts frame to
    frame — the failure mode MoCoGAN's content/motion decomposition is
    designed to prevent, and the reason the paper reports this metric.
    """
    feats = jnp.asarray(feats, jnp.float32)
    if feats.ndim != 3:
        raise ValueError(f"expected (B, T, D) features, got {feats.shape}")
    t = feats.shape[1]
    if t < 2:
        raise ValueError(f"need >= 2 frames for ACD, got {t}")
    d = jnp.linalg.norm(feats[:, :, None, :] - feats[:, None, :, :],
                        axis=-1)                       # (B, T, T)
    off = jnp.sum(d, axis=(-2, -1)) / (t * (t - 1))    # diagonal is 0
    return jnp.mean(off)


def acd(videos: jnp.ndarray, feature_fn=None) -> float:
    """Average Content Distance of (B, T, H, W, C) clips in [-1, 1].

    The MoCoGAN paper's quantitative metric (Tulyakov et al. 2018, §4:
    lower = better content consistency across frames of one video).
    feature_fn maps videos -> (B, T, D) per-frame features; default is
    the pixel-space mean-color descriptor. Report alongside the same
    metric on real clips — the real-data ACD is the anchor (natural
    videos have nonzero content drift from motion alone).
    """
    feats = (feature_fn or frame_content_features)(videos)
    return float(acd_from_features(feats))


def pair_indices(n: int, max_pairs: int = 64, seed: int = 0) -> np.ndarray:
    """Deterministic distinct clip pairs (P, 2) for the diversity probe.
    Factored out so the fused eval-panel program (eval/panel.py) bakes in
    EXACTLY the pairs `pairwise_ssim_diversity` would draw."""
    if n < 2:
        raise ValueError(f"need >= 2 clips, got {n}")
    rng = np.random.default_rng(seed)
    n_pairs = min(max_pairs, n * (n - 1) // 2)
    seen = set()
    while len(seen) < n_pairs:
        i, j = rng.integers(0, n, size=2)
        if i != j:
            seen.add((min(i, j), max(i, j)))
    return np.array(sorted(seen))


def pairwise_ssim_diversity(videos: jnp.ndarray, max_pairs: int = 64,
                            seed: int = 0) -> float:
    """Mode-collapse probe: mean SSIM over random DISTINCT clip pairs.

    videos: (N, T, H, W, C), N >= 2. Near 1.0 -> the generator emits
    near-identical clips; healthy diverse samples sit well below.
    Deterministic (fixed-seed pair choice without replacement).
    """
    idx = pair_indices(videos.shape[0], max_pairs, seed)
    s = clip_ssim(jnp.asarray(videos)[idx[:, 0]],
                  jnp.asarray(videos)[idx[:, 1]])
    return float(jnp.mean(s))
