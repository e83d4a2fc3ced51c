"""Golden tests for the fused video-preproc path (B3; SURVEY.md §4 'Data
pipeline'): jnp/Pallas-equivalent math vs the numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from mocogan_tpu.ops import preproc


def _raw(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=shape,
                                                dtype=np.uint8)


def test_bilinear_matrix_rows_sum_to_one():
    for src, dst in [(96, 64), (128, 64), (64, 64), (50, 96)]:
        m = preproc.bilinear_matrix(src, dst)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_identity_resize():
    """Same-size resize with half-pixel centers is the identity."""
    m = preproc.bilinear_matrix(64, 64)
    np.testing.assert_allclose(m, np.eye(64), atol=1e-6)


def test_jnp_matches_oracle():
    raw = _raw((2, 3, 96, 128, 3))
    oracle = preproc.resize_normalize_reference(raw, 64)
    got = np.asarray(preproc.resize_normalize(jnp.asarray(raw), 64,
                                              use_pallas=False))
    # CPU f32 matmuls: tight tolerance
    np.testing.assert_allclose(got, oracle, atol=1e-5)


def test_range_and_shape():
    raw = _raw((1, 2, 70, 70, 3), seed=1)
    out = np.asarray(preproc.resize_normalize(jnp.asarray(raw), 32,
                                              use_pallas=False))
    assert out.shape == (1, 2, 32, 32, 3)
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5


def test_subsample_and_preprocess():
    raw = _raw((2, 8, 48, 48, 3), seed=2)
    idx = np.stack([np.array([0, 2, 4, 6]), np.array([1, 3, 5, 7])]
                   ).astype(np.int32)
    out = np.asarray(preproc.subsample_and_preprocess(
        jnp.asarray(raw), jnp.asarray(idx), 32, use_pallas=False))
    oracle = preproc.resize_normalize_reference(
        np.stack([raw[0, idx[0]], raw[1, idx[1]]]), 32)
    np.testing.assert_allclose(out, oracle, atol=1e-5)


def test_sharded_preproc_matches_oracle():
    """shard_map-wrapped fused preproc over an 8-device mesh == oracle."""
    from mocogan_tpu.parallel import mesh as pmesh

    raw = _raw((8, 2, 48, 64, 3), seed=4)
    oracle = preproc.resize_normalize_reference(raw, 32)
    mesh = pmesh.make_mesh(8)
    sharded = pmesh.shard_batch(mesh, raw)
    got = jax.jit(lambda v: preproc.resize_normalize_sharded(
        v, 32, mesh, use_pallas=False))(sharded)
    np.testing.assert_allclose(np.asarray(jax.device_get(got)), oracle,
                               atol=1e-5)


def test_sharded_pallas_kernel_matches_oracle():
    """The ACTUAL Pallas kernel (interpret mode) under shard_map on the
    8-device mesh == oracle — the production multi-chip ingest path
    (resize_normalize_sharded with use_pallas), not the jnp twin."""
    from mocogan_tpu.parallel import mesh as pmesh

    raw = _raw((8, 2, 48, 64, 3), seed=5)
    oracle = preproc.resize_normalize_reference(raw, 32)
    mesh = pmesh.make_mesh(8)
    sharded = pmesh.shard_batch(mesh, raw)
    got = jax.jit(lambda v: preproc.resize_normalize_sharded(
        v, 32, mesh, use_pallas="interpret"))(sharded)
    np.testing.assert_allclose(np.asarray(jax.device_get(got)), oracle,
                               atol=1e-5)


def test_resize_normalize_auto_routes_to_shard_map():
    """resize_normalize_auto on a multi-device mesh must produce oracle
    results through the sharded kernel path."""
    from mocogan_tpu.parallel import mesh as pmesh

    raw = _raw((8, 2, 40, 40, 3), seed=6)
    oracle = preproc.resize_normalize_reference(raw, 32)
    mesh = pmesh.make_mesh(8)
    sharded = pmesh.shard_batch(mesh, raw)
    got = jax.jit(lambda v: preproc.resize_normalize_auto(
        v, 32, mesh=mesh, use_pallas="interpret"))(sharded)
    np.testing.assert_allclose(np.asarray(jax.device_get(got)), oracle,
                               atol=1e-5)


def test_pallas_kernel_interpret_mode_matches_oracle():
    """Run the actual Pallas kernel in interpreter mode on CPU."""
    from jax.experimental import pallas as pl  # noqa: F401

    raw = _raw((1, 2, 40, 56, 3), seed=3)
    oracle = preproc.resize_normalize_reference(raw, 32)
    planes = jnp.transpose(jnp.asarray(raw), (0, 1, 4, 2, 3)).reshape(-1, 40,
                                                                      56)
    rh = jnp.asarray(preproc.bilinear_matrix(40, 32))
    rw = jnp.asarray(preproc.bilinear_matrix(56, 32)).T
    import functools

    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    kernel = functools.partial(preproc._resize_norm_kernel, scale=2.0 / 255.0,
                               offset=-1.0)
    out = pl.pallas_call(
        kernel,
        grid=(planes.shape[0],),
        in_specs=[
            pl.BlockSpec((1, 40, 56), lambda i: (i, 0, 0)),
            pl.BlockSpec((32, 40), lambda i: (0, 0)),
            pl.BlockSpec((56, 32), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 32, 32), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((planes.shape[0], 32, 32),
                                       jnp.float32),
        interpret=True,
    )(planes, rh, rw)
    got = np.asarray(out).reshape(1, 2, 3, 32, 32).transpose(0, 1, 3, 4, 2)
    np.testing.assert_allclose(got, oracle, atol=1e-5)
