"""Offline dataset preprocessing (reference R7: decode raw videos -> frames,
face-crop for MUG, resize, temporal subsample, save one .npy per clip;
SURVEY.md §3.4).

Differences from the reference, by design (B3): frames are stored as RAW
uint8 at `raw_size` (no normalization, no final resize) — the fused Pallas
kernel does resize+[-1,1] on device at train time. Face cropping (MUG) uses
OpenCV's bundled Haar cascade when available.

Usage:
    python -m mocogan_tpu.data.preprocess --src /videos --out /clips \
        --raw-size 96 [--face-crop] [--class-from-dirname]
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional, Tuple

import numpy as np

VIDEO_EXTS = (".avi", ".mp4", ".mov", ".mkv", ".webm", ".mpg", ".mpeg")


def decode_video(path: str) -> np.ndarray:
    """Decode all frames -> (T, H, W, 3) uint8 RGB."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames: List[np.ndarray] = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames)


def decode_frame_dir(path: str) -> np.ndarray:
    """A directory of numbered image files -> (T, H, W, 3) uint8 (MUG-style)."""
    import cv2

    names = sorted(
        f for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")))
    if not names:
        raise ValueError(f"no image frames in {path}")
    frames = []
    for n in names:
        img = cv2.imread(os.path.join(path, n), cv2.IMREAD_COLOR)
        frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    return np.stack(frames)


def face_crop(frames: np.ndarray, margin: float = 0.4) -> np.ndarray:
    """MUG-style face crop: detect on the middle frame, crop all frames to a
    square box with margin. Falls back to a center crop if detection fails."""
    import cv2

    t, h, w = frames.shape[:3]
    box: Optional[Tuple[int, int, int, int]] = None
    cascade_path = os.path.join(cv2.data.haarcascades,
                                "haarcascade_frontalface_default.xml")
    if os.path.exists(cascade_path):
        det = cv2.CascadeClassifier(cascade_path)
        gray = cv2.cvtColor(frames[t // 2], cv2.COLOR_RGB2GRAY)
        faces = det.detectMultiScale(gray, 1.1, 4)
        if len(faces):
            x, y, fw, fh = max(faces, key=lambda f: f[2] * f[3])
            cx, cy = x + fw / 2, y + fh / 2
            side = int(max(fw, fh) * (1 + margin))
            box = (int(cx - side / 2), int(cy - side / 2), side, side)
    if box is None:
        side = min(h, w)
        box = ((w - side) // 2, (h - side) // 2, side, side)
    x, y, side, _ = box
    x = max(0, min(x, w - side))
    y = max(0, min(y, h - side))
    side = min(side, h - y, w - x)
    return frames[:, y:y + side, x:x + side]


def resize_frames(frames: np.ndarray, size: int) -> np.ndarray:
    import cv2

    return np.stack([
        cv2.resize(f, (size, size), interpolation=cv2.INTER_LINEAR)
        for f in frames
    ])


def temporal_subsample(frames: np.ndarray, step: int) -> np.ndarray:
    return frames[::max(1, step)]


def preprocess_clip(src: str, *, raw_size: int, do_face_crop: bool = False,
                    frame_step: int = 1) -> np.ndarray:
    frames = (decode_frame_dir(src) if os.path.isdir(src)
              else decode_video(src))
    frames = temporal_subsample(frames, frame_step)
    if do_face_crop:
        frames = face_crop(frames)
    return resize_frames(frames, raw_size)


def preprocess_tree(src_dir: str, out_dir: str, *, raw_size: int = 96,
                    do_face_crop: bool = False, frame_step: int = 1,
                    class_from_dirname: bool = True) -> int:
    """Walk src_dir for videos / frame dirs; write one uint8 .npy per clip,
    preserving one level of class structure. Returns number of clips."""
    n = 0
    for root, dirs, files in os.walk(src_dir):
        sources = [os.path.join(root, f) for f in sorted(files)
                   if f.lower().endswith(VIDEO_EXTS)]
        # a directory whose files are all images is itself one clip
        if not sources and files and all(
                f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
                for f in files):
            sources = [root]
        for src in sources:
            rel = os.path.relpath(os.path.dirname(src) if src != root
                                  else os.path.dirname(root), src_dir)
            cls = (rel.split(os.sep)[0]
                   if class_from_dirname and rel not in (".", "") else "")
            name = os.path.splitext(os.path.basename(src))[0] + ".npy"
            dst_dir = os.path.join(out_dir, cls) if cls else out_dir
            os.makedirs(dst_dir, exist_ok=True)
            clip = preprocess_clip(src, raw_size=raw_size,
                                   do_face_crop=do_face_crop,
                                   frame_step=frame_step)
            np.save(os.path.join(dst_dir, name), clip)
            n += 1
    return n


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--raw-size", type=int, default=96)
    ap.add_argument("--face-crop", action="store_true",
                    help="MUG-style face crop")
    ap.add_argument("--frame-step", type=int, default=1)
    ap.add_argument("--no-class-dirs", action="store_true")
    args = ap.parse_args(argv)
    n = preprocess_tree(args.src, args.out, raw_size=args.raw_size,
                        do_face_crop=args.face_crop,
                        frame_step=args.frame_step,
                        class_from_dirname=not args.no_class_dirs)
    print(f"wrote {n} clips to {args.out}")


if __name__ == "__main__":
    main()
