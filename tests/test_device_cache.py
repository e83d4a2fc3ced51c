"""Device-resident dataset cache (HBM pool) tests."""

import dataclasses
import json
import os

import numpy as np
import pytest

from mocogan_tpu.data import clips


def _clip_tree(tmp_path, n_classes=2, per_class=3, t=12, size=48):
    rng = np.random.default_rng(0)
    for c in range(n_classes):
        d = tmp_path / f"class{c}"
        d.mkdir(parents=True)
        for i in range(per_class):
            # varying lengths exercise padding + window clamping
            np.save(d / f"clip{i}.npy",
                    rng.integers(0, 256, size=(t + i, size, size, 3),
                                 dtype=np.uint8))


def test_load_pool(tmp_path):
    _clip_tree(tmp_path)
    pool, lengths, labels = clips.load_pool(str(tmp_path))
    assert pool.shape == (6, 14, 48, 48, 3)     # padded to longest (t+2)
    assert pool.dtype == np.uint8
    assert sorted(lengths.tolist()) == [12, 12, 13, 13, 14, 14]
    assert set(labels.tolist()) == {0, 1}
    # padding is zeros beyond each clip's length
    short = int(np.argmin(lengths))
    assert (pool[short, lengths[short]:] == 0).all()


def test_gather_windows_wraps_short_clips():
    """The device-cache window gather must loop short clips modulo their
    TRUE length (the host/native iterators' semantics) — never read the
    zero padding as training frames."""
    import jax.numpy as jnp

    from mocogan_tpu.ops import sampling

    t_max, t = 8, 6
    # clip 0: 4 real frames valued 1..4 then zero padding; clip 1: full 8
    pool = np.zeros((2, t_max, 2, 2, 1), np.uint8)
    for j in range(4):
        pool[0, j] = j + 1
    for j in range(t_max):
        pool[1, j] = 10 + j
    lengths = np.asarray([4, t_max], np.int32)

    win = np.asarray(sampling.gather_windows(
        jnp.asarray(pool), jnp.asarray(lengths),
        jnp.asarray([0, 1], np.int32), jnp.asarray([0, 2], np.int32), t))
    # short clip wraps: 1,2,3,4,1,2 — no zeros from the padding
    np.testing.assert_array_equal(win[0, :, 0, 0, 0], [1, 2, 3, 4, 1, 2])
    # full-length clip: plain contiguous window from start=2
    np.testing.assert_array_equal(win[1, :, 0, 0, 0],
                                  [12, 13, 14, 15, 16, 17])
    assert (win != 0).all()


def test_class_detection_ignores_stray_dirs(tmp_path):
    """A clip-free subdirectory (logs/, an empty class) must not disable
    class labeling for the rest of the tree."""
    _clip_tree(tmp_path)
    (tmp_path / "logs").mkdir()
    (tmp_path / "logs" / "notes.txt").write_text("x")
    ds = clips.ClipDataset(str(tmp_path), video_length=8)
    assert ds.class_names == ["class0", "class1"]
    assert set(ds.labels) == {0, 1}


def test_mixed_flat_and_class_layout_rejected(tmp_path):
    _clip_tree(tmp_path)
    np.save(tmp_path / "stray.npy",
            np.zeros((4, 8, 8, 3), np.uint8))
    with pytest.raises(ValueError, match="mixes class subdirectories"):
        clips.ClipDataset(str(tmp_path), video_length=8)


def test_cached_multi_step(tmp_path, tiny_cfg):
    import jax

    from mocogan_tpu.parallel import mesh as pmesh
    from mocogan_tpu.train import state as train_state

    _clip_tree(tmp_path, t=tiny_cfg.model.video_length)
    cfg = dataclasses.replace(
        tiny_cfg,
        train=dataclasses.replace(tiny_cfg.train, steps_per_call=3,
                                  num_devices=2),
    )
    pool, lengths, labels = clips.load_pool(str(tmp_path))
    mesh = pmesh.make_mesh(2)
    rep = pmesh.replicated(mesh)
    s = pmesh.shard_state(mesh, train_state.create(cfg))
    fn = pmesh.make_cached_train_step(cfg, mesh, 3)
    s, m = fn(s, jax.device_put(pool, rep), jax.device_put(lengths, rep),
              None)
    m = jax.device_get(m)
    assert int(np.asarray(jax.device_get(s.step))) == 3
    assert all(np.isfinite(v) for v in m.values())


def test_trainer_device_cached_end_to_end(tmp_path, tiny_cfg):
    from mocogan_tpu.train.loop import Trainer

    _clip_tree(tmp_path / "clips", t=tiny_cfg.model.video_length)
    cfg = dataclasses.replace(
        tiny_cfg,
        name="cachesmoke",
        train=dataclasses.replace(
            tiny_cfg.train, total_steps=6, log_every=3, sample_every=100,
            checkpoint_every=100, num_devices=2, steps_per_call=3,
            eval_every=6, eval_clips=4),
        data=dataclasses.replace(tiny_cfg.data, dataset="npy_dir",
                                 data_dir=str(tmp_path / "clips"),
                                 device_cache=True, raw_size=48),
        out_dir=str(tmp_path / "runs"),
    )
    tr = Trainer(cfg)
    last = tr.run_device_cached()
    assert all(np.isfinite(v) for v in last.values())
    assert int(np.asarray(tr.state.step)) == 6
    recs = [json.loads(l) for l in open(
        os.path.join(str(tmp_path / "runs"), "cachesmoke", "log.jsonl"))]
    assert any("fvd_proxy" in r for r in recs)
    tr.ckpt.close()
