#!/usr/bin/env python
"""Render deterministic synthetic sprite clips into a raw uint8 clip store
(the docs/DATASETS.md layout: one (T,H,W,C) uint8 .npy per clip, optional
class subdirectories).

Purpose: the real MUG/Weizmann corpora are unavailable offline, so this
gives the FULL real-data path — native C++ store, HBM device cache, fused
on-device Pallas preproc, categorical labels — a faithful stand-in corpus
for long training runs and the one-command pipeline rehearsal.

Example:
    python scripts/make_synthetic_store.py --out data/synth96 \
        --clips 96 --frames 32 --size 96 --classes 4
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="clip-store directory")
    ap.add_argument("--clips", type=int, default=96)
    ap.add_argument("--frames", type=int, default=32,
                    help="stored frames per clip (>= model video_length)")
    ap.add_argument("--size", type=int, default=96,
                    help="stored (raw) resolution; the fused on-device "
                         "kernel resizes to the training size")
    ap.add_argument("--classes", type=int, default=0,
                    help=">0: lay clips out under class subdirectories")
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args(argv)

    from mocogan_tpu.data import synthetic

    for i in range(a.clips):
        vids, labels = synthetic.make_batch(
            a.seed * 7_777_777 + i, 1, t=a.frames, size=a.size,
            n_classes=a.classes)
        u8 = np.clip((vids[0] + 1.0) * 127.5, 0, 255).astype(np.uint8)
        d = (os.path.join(a.out, f"class{int(labels[0])}")
             if a.classes else a.out)
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, f"clip{i:04d}.npy"), u8)
    print(f"[synthetic store] wrote {a.clips} clips "
          f"({a.frames}f @ {a.size}px, classes={a.classes or 1}) to {a.out}")


if __name__ == "__main__":
    main()
