"""Unit tests: shapes, dtypes, determinism for R1-R4 + the generate() (R9)
fidelity contract (SURVEY.md §4 'Unit')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocogan_tpu.models import discriminators, generator, motion
from mocogan_tpu.train import state as train_state


def test_motion_sampler_shapes(tiny_cfg):
    m = tiny_cfg.model
    params = motion.init(jax.random.key(0), m)
    z = motion.sample_motion(params, jax.random.key(1), 4, m)
    assert z.shape == (4, m.video_length, m.dim_motion)
    assert z.dtype == jnp.float32
    assert np.isfinite(np.asarray(z)).all()


def test_motion_sampler_is_temporal(tiny_cfg):
    """Motion codes must differ across time (the GRU actually rolls)."""
    m = tiny_cfg.model
    params = motion.init(jax.random.key(0), m)
    z = np.asarray(motion.sample_motion(params, jax.random.key(1), 2, m))
    assert not np.allclose(z[:, 0], z[:, 1])


def test_generator_shapes_and_range(tiny_cfg):
    m = tiny_cfg.model
    params, st = generator.init(jax.random.key(0), m)
    vids, new_st, labels = generator.sample_videos(
        params, st, jax.random.key(1), 3, m, train=True)
    assert vids.shape == (3, m.video_length, m.image_size, m.image_size,
                          m.channels)
    assert labels is None
    v = np.asarray(vids)
    assert v.min() >= -1.0 and v.max() <= 1.0
    # train mode must update BN running stats
    leaves_old = jax.tree.leaves(st)
    leaves_new = jax.tree.leaves(new_st)
    assert any(not np.allclose(a, b) for a, b in zip(leaves_old, leaves_new))


def test_generate_bitwise_deterministic(tiny_cfg):
    """BASELINE fidelity contract: generate() bit-for-bit at fp32 from
    (params, key) — across calls and across jit/no-jit."""
    m = tiny_cfg.model
    params, st = generator.init(jax.random.key(0), m)
    key = jax.random.key(7)
    v1 = generator.generate(params, st, key, 2, m)
    v2 = generator.generate(params, st, key, 2, m)
    assert (np.asarray(v1) == np.asarray(v2)).all()
    v3 = jax.jit(lambda: generator.generate(params, st, key, 2, m))()
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v3),
                               rtol=0, atol=1e-6)


def test_generate_video_length_override(tiny_cfg):
    m = tiny_cfg.model
    params, st = generator.init(jax.random.key(0), m)
    v = generator.generate(params, st, jax.random.key(1), 2, m,
                           video_length=m.video_length * 2)
    assert v.shape[1] == m.video_length * 2


def test_to_uint8_roundtrip():
    x = jnp.array([-1.0, 0.0, 1.0])
    u = generator.to_uint8(x)
    assert u.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(u), [0, 128, 255])


def test_image_discriminator(tiny_cfg):
    m = tiny_cfg.model
    params, st = discriminators.image_init(jax.random.key(0), m)
    x = jax.random.normal(jax.random.key(1),
                          (5, m.image_size, m.image_size, m.channels))
    logits, _ = discriminators.image_apply(params, st, x, m, train=True)
    assert logits.shape == (5, 1)
    assert jnp.isfinite(logits).all()


def test_video_discriminator(tiny_cfg):
    m = tiny_cfg.model
    params, st = discriminators.video_init(jax.random.key(0), m)
    x = jax.random.normal(
        jax.random.key(1),
        (3, m.video_length, m.image_size, m.image_size, m.channels))
    logits, cls, _ = discriminators.video_apply(params, st, x, m, train=True)
    assert logits.shape == (3, 1)
    assert cls is None


def test_video_discriminator_conditional(tiny_cat_cfg):
    m = tiny_cat_cfg.model
    params, st = discriminators.video_init(jax.random.key(0), m)
    x = jax.random.normal(
        jax.random.key(1),
        (3, m.video_length, m.image_size, m.image_size, m.channels))
    logits, cls, _ = discriminators.video_apply(params, st, x, m, train=True)
    assert cls.shape == (3, m.n_classes)


def test_conditional_generator_uses_labels(tiny_cat_cfg):
    m = tiny_cat_cfg.model
    params, st = generator.init(jax.random.key(0), m)
    key = jax.random.key(3)
    l0 = jnp.zeros((2,), jnp.int32)
    l1 = jnp.ones((2,), jnp.int32)
    v0 = generator.generate(params, st, key, 2, m, labels=l0)
    v1 = generator.generate(params, st, key, 2, m, labels=l1)
    assert not np.allclose(np.asarray(v0), np.asarray(v1))


def test_param_counts_positive(tiny_cfg):
    s = train_state.create(tiny_cfg)
    counts = train_state.param_count(s)
    assert set(counts) == {"gen", "di", "dv"}
    assert all(c > 0 for c in counts.values())


def test_generate_chunked_matches_generate_fast(tiny_cfg):
    """generate_chunked == concatenation of fold_in-keyed generate_fast
    chunks; loud error on n <= 0."""
    import pytest

    from mocogan_tpu.train import state as train_state

    s = train_state.create(tiny_cfg)
    key = jax.random.key(5)
    got = generator.generate_chunked(s.params["gen"], s.bn["gen"], key, 5,
                                     tiny_cfg.model, chunk=2)
    assert got.shape[0] == 5
    want = np.concatenate([
        np.asarray(jax.device_get(generator.generate_fast(
            s.params["gen"], s.bn["gen"], jax.random.fold_in(key, i), m,
            tiny_cfg.model)))
        for i, m in enumerate([2, 2, 1])])
    np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match="n >= 1"):
        generator.generate_chunked(s.params["gen"], s.bn["gen"], key, 0,
                                   tiny_cfg.model)
