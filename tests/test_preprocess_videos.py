"""Offline preprocessing (R7): real video decode -> uint8 clip store,
exercised with cv2-encoded AVI fixtures (no network needed)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mocogan_tpu.data import preprocess  # noqa: E402


def _write_avi(path, t=12, size=80, seed=0):
    # smooth content (solid moving square) — random noise is pathological
    # for the lossy MJPG codec and would make roundtrip checks meaningless
    rng = np.random.default_rng(seed)
    frames = np.zeros((t, size, size, 3), np.uint8)
    color = rng.integers(64, 256, size=3)
    for ti in range(t):
        x = 4 + 3 * ti
        frames[ti, 10:40, x:x + 20] = color
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 10,
                         (size, size))
    assert vw.isOpened()
    for f in frames:
        vw.write(f)
    vw.release()
    return frames


def test_decode_video_roundtrip(tmp_path):
    frames = _write_avi(tmp_path / "a.avi")
    got = preprocess.decode_video(str(tmp_path / "a.avi"))
    assert got.shape == frames.shape
    # MJPG is lossy; content must be close, not exact (BGR->RGB handled)
    err = np.abs(got.astype(int)[..., ::-1] - frames.astype(int)).mean()
    assert err < 16, err


def test_preprocess_tree_with_classes(tmp_path):
    src = tmp_path / "raw"
    for cls in ("walk", "run"):
        (src / cls).mkdir(parents=True)
        for i in range(2):
            _write_avi(src / cls / f"v{i}.avi", seed=i)
    out = tmp_path / "clips"
    n = preprocess.preprocess_tree(str(src), str(out), raw_size=48)
    assert n == 4
    for cls in ("walk", "run"):
        files = sorted(os.listdir(out / cls))
        assert len(files) == 2
        clip = np.load(out / cls / files[0])
        assert clip.shape == (12, 48, 48, 3)
        assert clip.dtype == np.uint8

    # the produced store loads into both the python dataset and the pool
    from mocogan_tpu.data import clips

    ds = clips.ClipDataset(str(out), video_length=8)
    assert len(ds) == 4 and ds.n_classes == 2
    pool, lengths, labels = clips.load_pool(str(out))
    assert pool.shape[0] == 4 and (lengths == 12).all()


def test_frame_dir_clip(tmp_path):
    d = tmp_path / "seq"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        cv2.imwrite(str(d / f"{i:03d}.png"),
                    rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8))
    frames = preprocess.decode_frame_dir(str(d))
    assert frames.shape == (5, 40, 40, 3)


def test_face_crop_fallback_center(tmp_path):
    """No face present -> center square crop."""
    frames = np.zeros((3, 60, 100, 3), np.uint8)
    cropped = preprocess.face_crop(frames)
    assert cropped.shape[1] == cropped.shape[2] == 60


def test_temporal_subsample():
    x = np.arange(10)[:, None, None, None].astype(np.uint8)
    assert preprocess.temporal_subsample(x, 2).shape[0] == 5
    assert preprocess.temporal_subsample(x, 1).shape[0] == 10
