"""Data-parallel correctness (SURVEY.md §4: sharded step == single-device
step on the concatenated batch) on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocogan_tpu.parallel import mesh as pmesh
from mocogan_tpu.train import state as train_state
from mocogan_tpu.train import step as train_step


def test_mesh_uses_all_devices():
    m = pmesh.make_mesh()
    assert m.devices.size == 8


def test_mesh_subset_and_errors():
    assert pmesh.make_mesh(4).devices.size == 4
    with pytest.raises(ValueError):
        pmesh.make_mesh(16)


def test_sharded_step_matches_single_device(tiny_cfg, tiny_batch):
    vids, _ = tiny_batch

    # single device reference
    s1 = train_state.create(tiny_cfg)
    fn1 = train_step.jitted_train_step(tiny_cfg)
    s1, m1 = fn1(s1, jnp.asarray(vids), None)

    # 8-way data-parallel
    mesh = pmesh.make_mesh(8)
    s8 = pmesh.shard_state(mesh, train_state.create(tiny_cfg))
    fn8 = pmesh.make_sharded_train_step(tiny_cfg, mesh)
    real = pmesh.shard_batch(mesh, vids)
    s8, m8 = fn8(s8, real, None)

    m1, m8 = jax.device_get((m1, m8))
    for k in m1:
        np.testing.assert_allclose(m1[k], m8[k], rtol=2e-4, atol=2e-5,
                                   err_msg=k)


def test_psummed_grads_match_full_batch_grads(tiny_cfg, tiny_batch):
    """SURVEY.md §4: gradients from the GSPMD-sharded loss == full-batch
    gradients. (Params after an Adam step are NOT comparable: Adam's
    first-step update is +-lr*sign(g), which amplifies epsilon-level
    reduction-order noise on near-zero grads to 2*lr.)"""
    from mocogan_tpu.utils import prng

    vids, _ = tiny_batch
    s = train_state.create(tiny_cfg)
    key = prng.step_key(s.root_key, s.step)

    def grads_of(real, params, bn):
        g, _ = jax.grad(train_step._loss_fn, has_aux=True)(
            params, bn, real, None, key, tiny_cfg)
        return g

    g1 = jax.jit(grads_of)(jnp.asarray(vids), s.params, s.bn)

    mesh = pmesh.make_mesh(8)
    real8 = pmesh.shard_batch(mesh, vids)
    s8 = pmesh.shard_state(mesh, s)
    g8 = jax.jit(grads_of)(real8, s8.params, s8.bn)

    g1, g8 = jax.device_get((g1, g8))
    # f32 tolerance: sharded reductions change summation order/blocking, and
    # cancellation-heavy sums (BN bias grads) retain ~1e-5 absolute residue;
    # a real semantics bug (e.g. per-shard BN stats) shows up at >=1e-1.
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        scale = np.maximum(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-3)


def test_sharded_multi_step_stays_finite(tiny_cfg, tiny_batch):
    vids, _ = tiny_batch
    mesh = pmesh.make_mesh(8)
    s = pmesh.shard_state(mesh, train_state.create(tiny_cfg))
    fn = pmesh.make_sharded_train_step(tiny_cfg, mesh)
    for i in range(3):
        real = pmesh.shard_batch(mesh, vids)
        s, m = fn(s, real, None)
    m = jax.device_get(m)
    assert all(np.isfinite(v) for v in m.values())
    assert int(jax.device_get(s.step)) == 3


def test_batch_sharding_layout(tiny_cfg, tiny_batch):
    vids, _ = tiny_batch
    mesh = pmesh.make_mesh(8)
    real = pmesh.shard_batch(mesh, vids)
    assert real.sharding.spec == jax.sharding.PartitionSpec("data")
    # each device holds B/8 clips
    shard = real.addressable_shards[0]
    assert shard.data.shape[0] == vids.shape[0] // 8


def test_multislice_mesh_shape_and_errors():
    m = pmesh.make_mesh(8, n_slices=2)
    assert m.devices.shape == (2, 4)
    assert m.axis_names == (pmesh.DCN_AXIS, pmesh.DATA_AXIS)
    with pytest.raises(ValueError, match="not divisible"):
        pmesh.make_mesh(6, n_slices=4)


def test_multislice_step_matches_single_device(tiny_cfg, tiny_batch):
    """Hierarchical DP over a (dcn, data) 2x4 mesh computes the same step
    as one device on the concatenated batch — GSPMD preserves semantics
    across the DCN axis exactly as it does within a slice, so multi-slice
    training preserves loss curves by the same construction as B1."""
    vids, _ = tiny_batch

    s1 = train_state.create(tiny_cfg)
    fn1 = train_step.jitted_train_step(tiny_cfg)
    s1, m1 = fn1(s1, jnp.asarray(vids), None)

    mesh = pmesh.make_mesh(8, n_slices=2)
    s8 = pmesh.shard_state(mesh, train_state.create(tiny_cfg))
    fn8 = pmesh.make_sharded_train_step(tiny_cfg, mesh)
    real = pmesh.shard_batch(mesh, vids)
    # batch axis spans BOTH mesh axes: 8 shards of B/8 clips each
    assert real.sharding.spec == jax.sharding.PartitionSpec(
        (pmesh.DCN_AXIS, pmesh.DATA_AXIS))
    assert real.addressable_shards[0].data.shape[0] == vids.shape[0] // 8
    s8, m8 = fn8(s8, real, None)

    m1, m8 = jax.device_get((m1, m8))
    for k in m1:
        np.testing.assert_allclose(m1[k], m8[k], rtol=2e-4, atol=2e-5,
                                   err_msg=k)


def test_multislice_cached_step_runs(tiny_cfg, tiny_batch):
    """The device-cache production path (on-device sampling + fused
    interpret-mode Pallas ingest under shard_map + scanned update) on the
    2-D mesh — shard_map's in_specs must span both axes."""
    vids, _ = tiny_batch
    mesh = pmesh.make_mesh(8, n_slices=2)
    s = pmesh.shard_state(mesh, train_state.create(tiny_cfg))
    pool = np.clip((vids + 1) * 127.5, 0, 255).astype(np.uint8)
    lengths = np.full((pool.shape[0],), pool.shape[1], np.int32)
    rep = pmesh.replicated(mesh)
    fn = pmesh.make_cached_train_step(tiny_cfg, mesh, 2,
                                      use_pallas="interpret")
    s, m = fn(s, jax.device_put(pool, rep), jax.device_put(lengths, rep),
              None)
    m = jax.device_get(m)
    assert int(jax.device_get(s.step)) == 2
    assert all(np.isfinite(v) for v in m.values()), m


def test_local_batch_slice_partitions_global_batch(monkeypatch):
    """Multi-host input sharding: each process uploads only its contiguous
    slice of the deterministic global batch (loop.py feeds the FULL batch
    through this before shard_batch — without it, multi-host runs would
    duplicate data at process_count times the intended batch size)."""
    mesh = pmesh.make_mesh(8)
    a = np.arange(16)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    np.testing.assert_array_equal(pmesh.local_batch_slice(mesh, a),
                                  np.arange(8, 16))
    # (K, B, ...) stacks slice on axis=1; None passes through
    b = np.arange(32).reshape(2, 16)
    ob, on = pmesh.local_batch_slice(mesh, b, None, axis=1)
    assert on is None
    np.testing.assert_array_equal(ob, b[:, 8:])
    with pytest.raises(ValueError, match="not divisible"):
        pmesh.local_batch_slice(mesh, np.arange(15))
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    np.testing.assert_array_equal(pmesh.local_batch_slice(mesh, a), a)


def test_order_by_slice_groups_physical_slices():
    """On real multi-slice hardware the (dcn, data) mesh rows must hold
    chips of the same physical slice (ADVICE r4 #1). Stub devices carry
    slice_index; virtual/CPU devices (None) pass through unchanged."""
    class Dev:
        def __init__(self, id, slice_index=None):
            self.id, self.slice_index = id, slice_index

        def __repr__(self):
            return f"Dev({self.id},{self.slice_index})"

    # interleaved enumeration order -> grouped by slice, id-sorted within
    devs = [Dev(0, 1), Dev(1, 0), Dev(2, 1), Dev(3, 0)]
    out = pmesh._order_by_slice(devs, 2)
    assert [(d.id, d.slice_index) for d in out] == [
        (1, 0), (3, 0), (0, 1), (2, 1)]

    # no slice_index anywhere (CPU/virtual): unchanged
    plain = [Dev(i) for i in range(4)]
    assert pmesh._order_by_slice(plain, 2) == plain

    # topology mismatch: 2 physical slices but n_slices=4
    with pytest.raises(ValueError, match="physical slices"):
        pmesh._order_by_slice(devs, 4)

    # unbalanced slices
    bad = [Dev(0, 0), Dev(1, 0), Dev(2, 0), Dev(3, 1)]
    with pytest.raises(ValueError, match="unbalanced"):
        pmesh._order_by_slice(bad, 2)


def test_trainer_n_slices_config_builds_2d_mesh(tmp_path, tiny_cfg):
    """train.n_slices threads from config to the Trainer's mesh
    (ADVICE r4 #2: the multi-slice mesh must be reachable from production
    config, not only from tests)."""
    import dataclasses

    from mocogan_tpu.train.loop import Trainer

    cfg = dataclasses.replace(
        tiny_cfg, name="msl", out_dir=str(tmp_path),
        train=dataclasses.replace(tiny_cfg.train, num_devices=4,
                                  n_slices=2, total_steps=1))
    tr = Trainer(cfg)
    assert tr.mesh.axis_names == (pmesh.DCN_AXIS, pmesh.DATA_AXIS)
    assert tr.mesh.devices.shape == (2, 2)
