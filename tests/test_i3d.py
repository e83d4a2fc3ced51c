"""I3D architecture tests (random weights — the weight FILE is the only
missing ingredient for absolute FVD; VERDICT round-1 weak #7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocogan_tpu.eval import i3d


def _vids(b=2, t=16, s=64, seed=0):
    return jnp.asarray(np.random.default_rng(seed).uniform(
        -1, 1, size=(b, t, s, s, 3)).astype(np.float32))


def test_expected_shapes_contract():
    shapes = i3d.expected_shapes()
    # 3 stem units + 9 mixed modules x 6 units, 4 tensors each + logits w/b
    assert len(shapes) == (3 + 9 * 6) * 4 + 2
    assert shapes["Conv3d_1a_7x7/w"] == (7, 7, 7, 3, 64)
    assert shapes["Mixed_5c/Branch_1/Conv3d_0b_3x3/w"] == (3, 3, 3, 192, 384)
    assert shapes["Logits/Conv3d_0c_1x1/w"] == (1, 1, 1, 1024, 400)


def test_forward_shapes_and_determinism():
    params = jax.tree.map(jnp.asarray, i3d.init_random(jax.random.key(0)))
    v = _vids()
    fn = jax.jit(lambda p, x: i3d.apply(p, x))
    logits = np.asarray(jax.device_get(fn(params, v)))
    assert logits.shape == (2, 400)
    assert np.isfinite(logits).all()
    pooled = np.asarray(jax.device_get(
        jax.jit(lambda p, x: i3d.apply(p, x, features="pool"))(params, v)))
    assert pooled.shape == (2, 1024)
    logits2 = np.asarray(jax.device_get(fn(params, v)))
    np.testing.assert_array_equal(logits, logits2)


def test_forward_32_frames():
    """The scaled config's 32-frame clips reach the head with T' = 4: the
    canonical avg_pool3d((2,7,7), VALID) + temporal window averaging must
    handle T' > 2 (weights (1,2,...,2,1)/(2(T'-1)), not a uniform mean)."""
    params = jax.tree.map(jnp.asarray, i3d.init_random(jax.random.key(3)))
    v = _vids(b=1, t=32, s=64, seed=4)
    logits = np.asarray(jax.device_get(
        jax.jit(lambda p, x: i3d.apply(p, x))(params, v)))
    assert logits.shape == (1, 400)
    assert np.isfinite(logits).all()
    pooled = np.asarray(jax.device_get(
        jax.jit(lambda p, x: i3d.apply(p, x, features="pool"))(params, v)))
    assert pooled.shape == (1, 1024)


def test_resize_protocol_matches_preproc_oracle():
    from mocogan_tpu.ops import preproc

    v = np.random.default_rng(1).uniform(
        -1, 1, size=(1, 2, 36, 36, 3)).astype(np.float32)
    got = np.asarray(jax.device_get(i3d.resize_videos(jnp.asarray(v), 48)))
    # the preproc oracle is uint8 in / normalize out; invert its affine
    u8 = ((v + 1) * 127.5)
    rh = preproc.bilinear_matrix(36, 48)
    want = np.einsum("vw,btswc->btsvc", rh,
                     np.einsum("sh,bthwc->btswc", rh, u8)) / 127.5 - 1.0
    np.testing.assert_allclose(got, want, atol=1e-4)
    # same-size input passes through untouched
    same = np.asarray(jax.device_get(i3d.resize_videos(jnp.asarray(v), 36)))
    np.testing.assert_array_equal(same, v)


def test_npz_load_validates_shapes(tmp_path):
    params = i3d.init_random(jax.random.key(1))
    path = str(tmp_path / "i3d.npz")
    np.savez(path, **params)
    loaded = i3d.load_npz(path)
    assert set(loaded) == set(i3d.expected_shapes())

    bad = dict(params)
    bad["Conv3d_1a_7x7/w"] = bad["Conv3d_1a_7x7/w"][..., :32]
    np.savez(str(tmp_path / "bad.npz"), **bad)
    with pytest.raises(ValueError, match="shape mismatches"):
        i3d.load_npz(str(tmp_path / "bad.npz"))
    del bad["Mixed_5c/Branch_3/Conv3d_0b_1x1/beta"]
    np.savez(str(tmp_path / "missing.npz"), **bad)
    with pytest.raises(ValueError, match="missing"):
        i3d.load_npz(str(tmp_path / "missing.npz"))


def test_fvd_with_i3d_extractor(tmp_path):
    """FVD harness end-to-end through the I3D extractor slot: identical
    sets -> ~0; disjoint sets -> > 0."""
    from mocogan_tpu.eval import fvd as fvd_mod

    params = i3d.init_random(jax.random.key(2))
    path = str(tmp_path / "w.npz")
    np.savez(path, **params)
    ex = fvd_mod.I3DFeatures(path, resize_to=None)  # no resize: CPU-speed
    a = np.random.default_rng(3).uniform(
        -1, 1, size=(8, 16, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + 0.5, -1, 1)
    d_same = fvd_mod.fvd(a, a.copy(), extractor=ex, batch_size=4)
    d_diff = fvd_mod.fvd(a, b, extractor=ex, batch_size=4)
    assert abs(d_same) < 1e-3
    assert d_diff > d_same + 1e-2


def test_i3dfeatures_requires_weights_path():
    """A falsy weights path must raise, not silently compute 'absolute'
    FVD from random weights."""
    from mocogan_tpu.eval import fvd as fvd_mod

    with pytest.raises(ValueError, match="requires a weights npz"):
        fvd_mod.I3DFeatures(None)
    with pytest.raises(ValueError, match="requires a weights npz"):
        fvd_mod.I3DFeatures("")
