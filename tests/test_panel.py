"""The fused single-dispatch eval panel (eval/panel.py) must be
numerically equivalent to the round-4 host-orchestrated panel it replaced
— same generated clips (same chunk/key schedule), same features, same
scalars — otherwise the fvd_proxy continuity claim across rounds breaks
(EVAL_VERSION would have to be bumped and longitudinal comparisons cut).
The legacy computation is reproduced inline here from its building blocks
(generate_chunked_device + batched_features + acd + pairwise_ssim +
video_apply), which still exist as public API.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocogan_tpu import get_config
from mocogan_tpu.data import synthetic
from mocogan_tpu.eval import fvd as fvd_mod
from mocogan_tpu.eval import video_metrics
from mocogan_tpu.eval.panel import PanelRunner
from mocogan_tpu.models import discriminators, generator
from mocogan_tpu.train import state as train_state

TINY = {"model.image_size": 32, "model.video_length": 8,
        "model.gen_features": 8, "model.disc_features": 8,
        "train.batch_size": 8}


def _cfg(**kw):
    ov = dict(TINY)
    ov.update(kw)
    return get_config("mug", **ov)


def _legacy_panel(cfg, state, real_pool, key, n, extractor):
    """The round-4 Trainer.eval_metrics computation, verbatim in shape."""
    vids = generator.generate_chunked_device(
        state.params["gen"], state.bn["gen"], key, n, cfg.model)
    real = jnp.asarray(real_pool[:n])
    feats_gen = fvd_mod.batched_features(vids, extractor)
    feats_real = fvd_mod.batched_features(real, extractor)
    mu_g, s_g = fvd_mod.gaussian_statistics(feats_gen)
    mu_r, s_r = fvd_mod.gaussian_statistics(feats_real)
    out = {"fvd_proxy": fvd_mod.frechet_distance(mu_g, s_g, mu_r, s_r)}
    spread_g = float(np.mean(np.linalg.norm(feats_gen - mu_g, axis=1)))
    spread_r = float(np.mean(np.linalg.norm(feats_real - mu_r, axis=1)))
    out["gen_spread_ratio"] = spread_g / max(spread_r, 1e-12)
    out["acd_gen"] = video_metrics.acd(vids)
    out["acd_real"] = video_metrics.acd(real)
    out["gen_pairwise_ssim"] = video_metrics.pairwise_ssim_diversity(
        vids[:min(n, 32)], max_pairs=32)
    if cfg.model.use_video_discriminator:
        m = min(n, 64)
        fn = jax.jit(lambda p, b, v: discriminators.video_apply(
            p, b, v, cfg.model, train=False)[0].mean())
        logit = lambda v: float(jax.device_get(fn(  # noqa: E731
            state.params["dv"], state.bn["dv"], jnp.asarray(v))))
        out["dv_margin"] = logit(real[:m]) - logit(vids[:m])
    return out


@pytest.mark.parametrize("n", [10, 70])
def test_fused_panel_matches_legacy(n):
    """n=10 exercises the remainder-only generate path; n=70 exercises
    lax.map chunking (64) + remainder (6) + feature padding (70 -> 96)."""
    cfg = _cfg()
    state = train_state.create(cfg)
    pool, _ = synthetic.make_batch(7, n, t=cfg.model.video_length,
                                   size=cfg.model.image_size)
    key = jax.random.key(3)
    runner = PanelRunner(cfg)
    got = runner(state.params, state.bn, pool, key, n=n)
    want = _legacy_panel(cfg, state, pool, key, n, runner.extractor)
    assert set(got) == set(want), (sorted(got), sorted(want))
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-4 * max(1.0, abs(want[k])), (
            k, got[k], want[k])


def test_panel_without_video_discriminator():
    cfg = get_config("mug", **dict(
        TINY, **{"model.use_video_discriminator": False}))
    state = train_state.create(cfg)
    pool, _ = synthetic.make_batch(1, 8, t=cfg.model.video_length,
                                   size=cfg.model.image_size)
    out = PanelRunner(cfg)(state.params, state.bn, pool, jax.random.key(0))
    assert "dv_margin" not in out
    assert np.isfinite(out["fvd_proxy"])


def test_panel_pool_device_cache_reuses_upload():
    cfg = _cfg()
    state = train_state.create(cfg)
    pool, _ = synthetic.make_batch(2, 8, t=cfg.model.video_length,
                                   size=cfg.model.image_size)
    runner = PanelRunner(cfg)
    runner(state.params, state.bn, pool, jax.random.key(0))
    dev_first = runner._pool_dev[1]
    runner(state.params, state.bn, pool, jax.random.key(1))
    assert runner._pool_dev[1] is dev_first  # same host pool -> one upload
    other, _ = synthetic.make_batch(3, 8, t=cfg.model.video_length,
                                    size=cfg.model.image_size)
    runner(state.params, state.bn, other, jax.random.key(2))
    assert runner._pool_dev[1] is not dev_first


def test_extractor_fingerprint_identity():
    """Same extractor weights -> same fingerprint; different seed or a
    bumped EVAL_VERSION -> different. The string embeds the version so
    logs are self-describing."""
    a = fvd_mod.RandomProjectionFeatures()
    b = fvd_mod.RandomProjectionFeatures()
    c = fvd_mod.RandomProjectionFeatures(seed=1)
    fa, fb, fc = map(fvd_mod.extractor_fingerprint, (a, b, c))
    assert fa == fb
    assert fa != fc
    assert fa.startswith(f"v{fvd_mod.EVAL_VERSION}-")
