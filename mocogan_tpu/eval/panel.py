"""Fused single-dispatch eval panel (VERDICT r4 weak #3 / next-round #6).

The round-4 panel was device-resident but host-ORCHESTRATED: chunked
generate (4 dispatches), feature extraction in 32-clip dispatches (8 per
side), ACD, pairwise-SSIM and two D_V dispatches — ~20 round trips over
the axon tunnel at 0.3-0.5 s each, stalling training 7.5-9 s per eval
(docs/results/flagship50k_r4), and a tunnel stall inside any of them
blocked training entirely.

TPU-native fix: the WHOLE panel is one jitted program — generation
(lax.map over the exact chunk/key schedule of
``generator.generate_chunked_device``), feature extraction for both
sides, ACD, pairwise-SSIM and the eval-mode D_V logits — returning only
small arrays (N x dim features + scalars, ~70 KB), fetched with ONE
``jax.device_get``. Fréchet statistics stay on the host (eigh on tiny
64x64 matrices). Numerical equivalence with the round-4 chunked panel is
asserted in tests/test_panel.py; every record carries
``fvd.extractor_fingerprint`` so any future drift is self-describing.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mocogan_tpu.configs import ExperimentConfig
from mocogan_tpu.eval import fvd as fvd_mod
from mocogan_tpu.eval import video_metrics
from mocogan_tpu.models import discriminators, generator

_GEN_CHUNK = 64   # generate_chunked_device's default chunk (key schedule)
_FEAT_CHUNK = 32  # batched_features' default batch_size
_SSIM_CLIPS = 32  # legacy panel: pairwise SSIM over vids[:min(n, 32)]
_SSIM_PAIRS = 32
_DV_CLIPS = 64    # legacy panel: mean D_V logit over min(n, 64) clips


class PanelRunner:
    """Builds and caches the fused panel program for one experiment.

    __call__(state, real_pool, key) -> the metric dict the Trainer logs:
    fvd_proxy, gen_spread_ratio, acd_gen, acd_real, gen_pairwise_ssim,
    dv_margin (when the config has a video discriminator).
    """

    def __init__(self, cfg: ExperimentConfig, extractor=None):
        self.cfg = cfg
        self.extractor = extractor or fvd_mod.RandomProjectionFeatures()
        self.fingerprint = fvd_mod.extractor_fingerprint(self.extractor)
        self._programs: Dict[int, Any] = {}     # n -> jitted program
        self._pool_dev = None                   # (host ref, device array)

    # -- program construction ---------------------------------------------

    def _build(self, n: int):
        mc = self.cfg.model
        extract = self.extractor._apply  # jitted; inlines under trace
        use_dv = mc.use_video_discriminator
        n_ssim = min(n, _SSIM_CLIPS)
        idx = (video_metrics.pair_indices(n_ssim, _SSIM_PAIRS)
               if n >= 2 else None)
        m_dv = min(n, _DV_CLIPS)

        def feats_of(v):
            m = v.shape[0]
            pad = (-m) % _FEAT_CHUNK
            if pad:  # zero rows are per-sample independent; sliced off
                v = jnp.concatenate(
                    [v, jnp.zeros((pad, *v.shape[1:]), v.dtype)])
            chunks = v.reshape(-1, _FEAT_CHUNK, *v.shape[1:])
            f = jax.lax.map(extract, chunks)
            return f.reshape(-1, f.shape[-1])[:m]

        def run(gen_params, gen_bn, dv_params, dv_bn, real, key):
            # Chunk/key schedule identical to generate_chunked_device:
            # chunk i of size _GEN_CHUNK uses fold_in(key, i).
            nk, rem = divmod(n, _GEN_CHUNK)
            parts = []
            if nk:
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(key, i))(jnp.arange(nk))
                v = jax.lax.map(
                    lambda k: generator.generate(gen_params, gen_bn, k,
                                                 _GEN_CHUNK, mc), keys)
                parts.append(v.reshape(nk * _GEN_CHUNK, *v.shape[2:]))
            if rem:
                parts.append(generator.generate(
                    gen_params, gen_bn, jax.random.fold_in(key, nk),
                    rem, mc))
            vids = parts[0] if len(parts) == 1 else jnp.concatenate(parts)

            out = {
                "feats_gen": feats_of(vids),
                "feats_real": feats_of(real),
                "acd_gen": video_metrics.acd_from_features(
                    video_metrics.frame_content_features(vids)),
                "acd_real": video_metrics.acd_from_features(
                    video_metrics.frame_content_features(real)),
            }
            if idx is not None:
                out["pair_ssim"] = jnp.mean(video_metrics.clip_ssim(
                    vids[idx[:, 0]], vids[idx[:, 1]]))
            if use_dv:
                out["dv_gen"] = discriminators.video_apply(
                    dv_params, dv_bn, vids[:m_dv], mc,
                    train=False)[0].mean()
                out["dv_real"] = discriminators.video_apply(
                    dv_params, dv_bn, real[:m_dv], mc,
                    train=False)[0].mean()
            return out

        return jax.jit(run)

    # -- pool placement ----------------------------------------------------

    def _pool_device(self, real_pool, n: int) -> jax.Array:
        """Device copy of real_pool[:n], cached while the SAME host pool
        object recurs (the device-cache path reuses one pool all run —
        one upload total). Device-array pools are used as-is."""
        if isinstance(real_pool, jax.Array):
            return real_pool[:n]
        if self._pool_dev is None or self._pool_dev[0] is not real_pool:
            self._pool_dev = (real_pool, jnp.asarray(real_pool[:n]))
        return self._pool_dev[1]

    # -- the panel ---------------------------------------------------------

    def __call__(self, params: Dict[str, Any], bn: Dict[str, Any],
                 real_pool, key: jax.Array,
                 n: Optional[int] = None) -> Dict[str, float]:
        n = min(n or self.cfg.train.eval_clips, len(real_pool))
        if n <= 0:
            raise ValueError(f"panel needs clips; real pool {len(real_pool)}")
        if n not in self._programs:
            self._programs[n] = self._build(n)
        use_dv = self.cfg.model.use_video_discriminator
        raw = jax.device_get(self._programs[n](
            params["gen"], bn["gen"],
            params.get("dv") if use_dv else None,
            bn.get("dv") if use_dv else None,
            self._pool_device(real_pool, n), key))

        mu_g, s_g = fvd_mod.gaussian_statistics(raw["feats_gen"])
        mu_r, s_r = fvd_mod.gaussian_statistics(raw["feats_real"])
        out = {"fvd_proxy": fvd_mod.frechet_distance(mu_g, s_g, mu_r, s_r)}
        spread_g = float(np.mean(np.linalg.norm(
            raw["feats_gen"] - mu_g, axis=1)))
        spread_r = float(np.mean(np.linalg.norm(
            raw["feats_real"] - mu_r, axis=1)))
        out["gen_spread_ratio"] = spread_g / max(spread_r, 1e-12)
        out["acd_gen"] = float(raw["acd_gen"])
        out["acd_real"] = float(raw["acd_real"])
        if "pair_ssim" in raw:
            out["gen_pairwise_ssim"] = float(raw["pair_ssim"])
        if use_dv:
            out["dv_margin"] = float(raw["dv_real"]) - float(raw["dv_gen"])
        return out
