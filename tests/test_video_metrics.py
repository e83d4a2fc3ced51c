"""PSNR/SSIM property tests: analytic identities, known closed-form
cases, range/monotonicity, and the pairwise-diversity collapse probe."""

import jax.numpy as jnp
import numpy as np
import pytest

from mocogan_tpu.eval import video_metrics as vm


def _frames(seed, n=2, h=24, w=24, c=3):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=(n, h, w, c)).astype(np.float32)


def test_psnr_identity_is_infinite():
    x = _frames(0)
    assert np.all(np.isinf(np.asarray(vm.psnr(x, x))))


def test_psnr_known_value():
    # constant offset d in [0,1]-space: mse = d^2, psnr = -20 log10(d)
    x = np.full((1, 16, 16, 1), -1.0, np.float32)     # unit-space 0.0
    y = np.full((1, 16, 16, 1), -0.8, np.float32)     # unit-space 0.1
    got = float(np.asarray(vm.psnr(x, y))[0])
    assert got == pytest.approx(-20 * np.log10(0.1), abs=1e-3)


def test_psnr_monotone_in_noise():
    x = _frames(1)
    n = np.random.default_rng(2).normal(size=x.shape).astype(np.float32)
    p1 = np.asarray(vm.psnr(x, x + 0.01 * n))
    p2 = np.asarray(vm.psnr(x, x + 0.1 * n))
    assert np.all(p1 > p2)


def test_ssim_identity_is_one():
    x = _frames(3)
    s = np.asarray(vm.ssim(jnp.asarray(x), jnp.asarray(x)))
    assert s.shape == (2,)
    assert np.allclose(s, 1.0, atol=1e-5)


def test_ssim_range_and_monotone():
    x = _frames(4)
    n = np.random.default_rng(5).normal(size=x.shape).astype(np.float32)
    s_small = np.asarray(vm.ssim(x, np.clip(x + 0.05 * n, -1, 1)))
    s_big = np.asarray(vm.ssim(x, np.clip(x + 0.5 * n, -1, 1)))
    assert np.all(s_small <= 1.0) and np.all(s_big >= -1.0)
    assert np.all(s_small > s_big)
    # structural destruction: an uncorrelated image scores near 0
    other = _frames(6)
    assert float(np.asarray(vm.ssim(x, other)).mean()) < 0.2


def test_ssim_luminance_shift_closed_form():
    # constant images a, b: var=cov=0 -> ssim = (2ab+c1)/(a^2+b^2+c1)
    a_unit, b_unit = 0.4, 0.6
    x = np.full((1, 16, 16, 1), a_unit * 2 - 1, np.float32)
    y = np.full((1, 16, 16, 1), b_unit * 2 - 1, np.float32)
    c1 = 0.01 ** 2
    want = (2 * a_unit * b_unit + c1) / (a_unit ** 2 + b_unit ** 2 + c1)
    got = float(np.asarray(vm.ssim(x, y))[0])
    assert got == pytest.approx(want, abs=1e-4)


def test_clip_metrics_shapes():
    rng = np.random.default_rng(7)
    a = rng.uniform(-1, 1, size=(3, 4, 20, 20, 3)).astype(np.float32)
    b = np.clip(a + 0.05, -1, 1)
    assert np.asarray(vm.clip_psnr(a, b)).shape == (3,)
    assert np.asarray(vm.clip_ssim(a, b)).shape == (3,)


def test_pairwise_diversity_detects_collapse():
    rng = np.random.default_rng(8)
    diverse = rng.uniform(-1, 1, size=(6, 2, 20, 20, 3)).astype(np.float32)
    one = rng.uniform(-1, 1, size=(1, 2, 20, 20, 3)).astype(np.float32)
    collapsed = np.repeat(one, 6, axis=0) \
        + rng.normal(scale=0.01, size=(6, 2, 20, 20, 3)).astype(np.float32)
    d_div = vm.pairwise_ssim_diversity(diverse)
    d_col = vm.pairwise_ssim_diversity(collapsed)
    assert d_col > 0.9
    assert d_div < 0.3
    # deterministic
    assert d_div == vm.pairwise_ssim_diversity(diverse)


def test_ssim_shape_mismatch_raises():
    with pytest.raises(ValueError, match="shape mismatch"):
        vm.ssim(np.zeros((1, 16, 16, 1)), np.zeros((1, 16, 17, 1)))


# -- Average Content Distance (the MoCoGAN paper's metric) ----------------


def test_acd_zero_for_static_video():
    # identical frames -> zero content drift by definition
    frame = _frames(9, n=1)[0]
    vids = np.broadcast_to(frame, (3, 5, *frame.shape)).copy()
    assert vm.acd(vids) == pytest.approx(0.0, abs=1e-6)


def test_acd_known_value_two_frames():
    # two constant frames at unit-space 0.2 and 0.5: the mean-color
    # features differ by 0.3 in every channel -> L2 = 0.3 * sqrt(C)
    c = 3
    v = np.zeros((1, 2, 8, 8, c), np.float32)
    v[:, 0] = 0.2 * 2 - 1
    v[:, 1] = 0.5 * 2 - 1
    assert vm.acd(v) == pytest.approx(0.3 * np.sqrt(c), abs=1e-5)


def test_acd_monotone_in_content_drift():
    rng = np.random.default_rng(10)
    base = rng.uniform(-1, 1, size=(4, 1, 16, 16, 3)).astype(np.float32)
    drift = rng.normal(size=(4, 6, 1, 1, 3)).astype(np.float32)
    small = np.clip(base + 0.02 * drift, -1, 1)
    big = np.clip(base + 0.3 * drift, -1, 1)
    assert vm.acd(big) > vm.acd(small) > 0.0


def test_acd_custom_feature_fn():
    vids = np.random.default_rng(12).uniform(
        -1, 1, size=(2, 4, 8, 8, 3)).astype(np.float32)
    # constant custom features -> 0 regardless of pixels
    fn = lambda v: np.ones((v.shape[0], v.shape[1], 7), np.float32)  # noqa
    assert vm.acd(vids, feature_fn=fn) == pytest.approx(0.0, abs=1e-6)


def test_acd_rejects_degenerate_inputs():
    with pytest.raises(ValueError, match="frames"):
        vm.acd(np.zeros((2, 1, 8, 8, 3), np.float32))
    with pytest.raises(ValueError, match="features"):
        vm.acd_from_features(np.zeros((2, 4), np.float32))
