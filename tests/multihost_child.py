"""Child program for the 2-process jax.distributed CPU test
(tests/test_multihost.py). Each process owns 4 virtual CPU devices; the
pair forms one 8-device data mesh and runs ONE sharded adversarial train
step with per-process input shards — covering the process_count>1 branches
of parallel/mesh.py (shard_batch via make_array_from_process_local_data,
local_batch_size, initialize_distributed).

Prints one JSON line of metrics so the parent can assert both processes
computed the SAME (psum-agreed) losses.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must be set before jax imports.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # beat the axon sitecustomize
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except (AttributeError, ValueError):
    pass  # newer jax picks a working CPU collectives impl automatically

import numpy as np  # noqa: E402


def main() -> None:
    from mocogan_tpu import get_config
    from mocogan_tpu.data import synthetic
    from mocogan_tpu.parallel import mesh as pmesh
    from mocogan_tpu.train import state as train_state

    pmesh.initialize_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    cfg = get_config(
        "mug",
        **{
            "model.image_size": 32,
            "model.video_length": 8,
            "model.gen_features": 8,
            "model.disc_features": 8,
            "train.batch_size": 8,
            "train.steps_per_call": 1,
            "data.device_cache": False,
        },
    )
    mesh = pmesh.make_mesh(8)
    local_b = pmesh.local_batch_size(cfg, mesh)
    assert local_b == 4, local_b

    # Per-host input sharding: each process materializes ONLY its slice of
    # the deterministic global batch.
    vids, _ = synthetic.make_batch(0, cfg.train.batch_size,
                                   t=cfg.model.video_length,
                                   size=cfg.model.image_size)
    lo = jax.process_index() * local_b
    sliced = pmesh.local_batch_slice(mesh, np.asarray(vids))
    np.testing.assert_array_equal(sliced, np.asarray(vids)[lo:lo + local_b])
    real = pmesh.shard_batch(mesh, sliced)
    assert real.shape[0] == cfg.train.batch_size  # global shape

    state = pmesh.shard_state(mesh, train_state.create(cfg))
    step_fn = pmesh.make_sharded_train_step(cfg, mesh)
    state, metrics = step_fn(state, real, None)
    metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert int(jax.device_get(state.step)) == 1
    assert all(np.isfinite(v) for v in metrics.values()), metrics
    print("METRICS " + json.dumps(metrics, sort_keys=True))

    # Trainer-level multi-host input path: _put must slice the iterator's
    # GLOBAL batch down to this process's shard (loop.py feeds
    # local_batch_slice -> shard_batch). Each process gets its own out_dir;
    # drive step_fn directly (no end-of-run Orbax finalization under gloo).
    import dataclasses
    import tempfile

    from mocogan_tpu.train.loop import Trainer, make_data_iterator

    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, dataset="synthetic"))
    out = tempfile.mkdtemp(prefix=f"mh_trainer_p{jax.process_index()}_")
    tr = Trainer(cfg, out_dir=out, resume=False)
    it = make_data_iterator(cfg)
    m2 = None
    for _ in range(2):
        vids2, _labels = next(it)
        real2, lab2 = tr._put(np.asarray(vids2))
        assert real2.shape[0] == cfg.train.batch_size  # global batch
        tr.state, m2 = tr.step_fn(tr.state, real2, lab2)
    m2 = {k: float(v) for k, v in jax.device_get(m2).items()}
    assert all(np.isfinite(v) for v in m2.values()), m2
    print("METRICS2 " + json.dumps(m2, sort_keys=True))
    jax.distributed.shutdown()


if __name__ == "__main__":
    sys.exit(main())
