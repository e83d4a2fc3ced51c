"""ThreadedPrefetcher, remat decode, and CLI override parsing tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocogan_tpu.data.pipeline import ThreadedPrefetcher


def test_prefetcher_preserves_order():
    it = ThreadedPrefetcher(iter(range(20)), depth=3)
    assert list(it) == list(range(20))


def test_prefetcher_propagates_exceptions():
    def gen():
        yield 1
        raise ValueError("boom")

    it = ThreadedPrefetcher(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetcher_close_mid_stream():
    it = ThreadedPrefetcher(iter(range(1_000_000)), depth=2)
    assert next(it) == 0
    it.close()  # must not hang


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_prefetcher_close_terminates_worker(depth):
    """close() must always end the worker thread — with depth=1 a worker
    blocked in a plain put() would leak forever (its sentinel put can
    never find a free slot once the consumer stops draining)."""
    it = ThreadedPrefetcher(iter(range(1_000_000)), depth=depth)
    assert next(it) == 0
    it.close()
    it._thread.join(timeout=2.0)
    assert not it._thread.is_alive()


def test_remat_matches_plain_decode(tiny_cfg):
    """cfg.remat changes memory behavior, not values (same fwd program)."""
    from mocogan_tpu.models import generator

    m = tiny_cfg.model
    m_remat = dataclasses.replace(m, remat=True)
    params, st = generator.init(jax.random.key(0), m)
    key = jax.random.key(1)

    def loss(mm):
        def f(p):
            v, _, _ = generator.sample_videos(p, st, key, 2, mm, train=True)
            return jnp.sum(v * v)
        return f

    v0 = jax.jit(loss(m))(params)
    v1 = jax.jit(loss(m_remat))(params)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
    g0 = jax.jit(jax.grad(loss(m)))(params)
    g1 = jax.jit(jax.grad(loss(m_remat)))(params)
    for a, b in zip(jax.tree.leaves(jax.device_get(g0)),
                    jax.tree.leaves(jax.device_get(g1))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_parse_overrides():
    import train as train_cli

    out = train_cli.parse_overrides(
        ["model.video_length=32", "train.learning_rate=1e-4",
         "data.dataset=mug", "train.num_devices=None"])
    assert out["model.video_length"] == 32
    assert out["train.learning_rate"] == 1e-4
    assert out["data.dataset"] == "mug"
    assert out["train.num_devices"] is None
    # lowercase keywords must parse as booleans/None, NOT fall through to
    # truthy strings ("--set data.device_cache=false" silently enabling
    # the flag was a real footgun)
    out = train_cli.parse_overrides(
        ["a=false", "b=true", "c=none", "d=False", "e=None"])
    assert out["a"] is False and out["b"] is True and out["c"] is None
    assert out["d"] is False and out["e"] is None


def test_train_cli_subprocess(tmp_path):
    """Drive the actual train.py CLI end to end (toy config, 2 steps)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "train.py", "--config", "toy",
         "--total-steps", "2", "--batch-size", "2", "--out-dir",
         str(tmp_path), "--set", "model.gen_features=8",
         "model.disc_features=8", "model.image_size=32",
         "model.video_length=4", "train.log_every=2",
         "train.sample_every=1000", "train.checkpoint_every=1000",
         "train.num_devices=1"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "[step 2/2]" in out.stdout


def test_train_cli_synthetic_routes_host_fed(tmp_path):
    """A device_cache config with dataset=synthetic must route host-fed
    (synthetic has no on-disk store for load_pool) instead of crashing."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "train.py", "--config", "mug",
         "--total-steps", "2", "--batch-size", "2", "--out-dir",
         str(tmp_path), "--set", "data.dataset=synthetic",
         "model.gen_features=8", "model.disc_features=8",
         "model.image_size=32", "model.video_length=4",
         "train.steps_per_call=1", "train.log_every=2",
         "train.sample_every=1000", "train.checkpoint_every=1000",
         "train.num_devices=1"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "[step 2/2]" in out.stdout


def test_eval_fvd_cli_i3d_weights(tmp_path, tiny_cfg):
    """eval_fvd.py --i3d-weights: the absolute-FVD surface end to end with
    a (random-weight) npz in the documented contract."""
    import json
    import sys

    import jax
    import numpy as np

    import eval_fvd
    from mocogan_tpu.eval import i3d
    from mocogan_tpu.train import state as train_state
    from mocogan_tpu.utils.checkpoint import CheckpointManager

    run_dir = tmp_path / "run"
    mngr = CheckpointManager(str(run_dir / "checkpoints"))
    mngr.save(train_state.create(tiny_cfg), wait=True)
    mngr.close()
    np.savez(str(tmp_path / "w.npz"), **i3d.init_random(jax.random.key(0)))

    data_dir = tmp_path / "clips"
    data_dir.mkdir()
    for i in range(3):
        np.save(data_dir / f"c{i}.npy", np.random.default_rng(i).integers(
            0, 256, (6, 32, 32, 3), dtype=np.uint8))

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    overrides = [f"model.{k}={v}" for k, v in
                 [("image_size", 32), ("video_length", 4),
                  ("gen_features", 8), ("disc_features", 8)]]
    with redirect_stdout(buf):
        eval_fvd.main(["--config", "mug", "--run-dir", str(run_dir),
                       "--data-dir", str(data_dir), "--n", "4",
                       "--i3d-weights", str(tmp_path / "w.npz"),
                       "--set", *overrides, "train.batch_size=2"])
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert "fvd" in rep and np.isfinite(rep["fvd"])
    assert rep["extractor"] == "i3d_logits"
    del sys


def test_get_config_nested_overrides():
    from mocogan_tpu import get_config

    cfg = get_config("toy", **{"model.video_length": 4,
                               "train.batch_size": 2})
    assert cfg.model.video_length == 4
    assert cfg.train.batch_size == 2
    # base config untouched (frozen dataclasses are replaced, not mutated)
    assert get_config("toy").model.video_length == 16


def test_parity_day_runner(tmp_path, tiny_cfg):
    """scripts/parity_day.py end to end on synthetic fixtures: reference
    npz import -> digest -> absolute FVD (random-weight i3d npz) ->
    comparator, all from ONE command (VERDICT r4 next-round #8). The day
    real reference files exist, the same invocation with real paths
    produces the two blocked north-star artifacts."""
    import importlib.util
    import json
    import os
    import sys

    import jax
    import numpy as np

    from mocogan_tpu.eval import i3d
    from mocogan_tpu.eval import import_chainer as imp
    from mocogan_tpu.train import state as train_state
    from mocogan_tpu.utils.checkpoint import CheckpointManager

    spec = importlib.util.spec_from_file_location(
        "parity_day", os.path.join(os.path.dirname(__file__), "..",
                                   "scripts", "parity_day.py"))
    parity_day = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(parity_day)

    cfg = tiny_cfg
    # "reference" generator npz in Chainer layout (export helper writes
    # exactly the save_npz convention the importer reads)
    state = train_state.create(cfg, seed=5)
    gen_npz = str(tmp_path / "ref_gen.npz")
    imp.export_net_npz(gen_npz, "gen", jax.device_get(state.params["gen"]),
                       jax.device_get(state.bn["gen"]), cfg.model)
    # our run dir
    run_dir = tmp_path / "run"
    mngr = CheckpointManager(str(run_dir / "checkpoints"))
    mngr.save(train_state.create(cfg), wait=True)
    mngr.close()
    # real store + i3d weights + logs
    data_dir = tmp_path / "clips"
    data_dir.mkdir()
    for i in range(3):
        np.save(data_dir / f"c{i}.npy", np.random.default_rng(i).integers(
            0, 256, (12, 32, 32, 3), dtype=np.uint8))
    np.savez(str(tmp_path / "i3d.npz"),
             **i3d.init_random(jax.random.key(0)))
    for name, off in (("ours.jsonl", 0.0), ("ref.jsonl", 0.01)):
        with open(tmp_path / name, "w") as f:
            for s in range(0, 200, 20):
                f.write(json.dumps({"step": s,
                                    "loss_gen": 1.0 + off + s * 1e-3}) + "\n")

    overrides = ["model.image_size=32", "model.video_length=8",
                 "model.gen_features=8", "model.disc_features=8",
                 "train.batch_size=8"]
    summary = parity_day.main([
        "--config", "mug", "--reference-npz", gen_npz,
        "--i3d-weights", str(tmp_path / "i3d.npz"),
        "--data-dir", str(data_dir), "--run-dir", str(run_dir),
        "--our-log", str(tmp_path / "ours.jsonl"),
        "--reference-log", str(tmp_path / "ref.jsonl"),
        "--n", "4", "--out", str(tmp_path / "pd"),
        "--set", *overrides])

    st = summary["stages"]
    assert st["import"]["matched"]["gen"] > 0
    assert st["digest"]["deterministic"] is True
    scores = st["fvd"]["scores"]
    assert set(scores) == {"reference_vs_real", "ours_vs_real",
                           "ours_vs_reference"}
    assert all(np.isfinite(v) for v in scores.values())
    assert "ABSOLUTE" in st["fvd"]["extractor"]
    assert np.isfinite(st["compare"]["max_nabc"])
    for fname in ("import_report.json", "reference_generate_digest.json",
                  "fvd.json", "compare.json", "summary.json"):
        assert (tmp_path / "pd" / fname).exists(), fname
    del sys
