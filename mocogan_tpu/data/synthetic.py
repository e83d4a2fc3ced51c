"""Synthetic MovingMNIST-style clip source (BASELINE config 1).

The reference trains on preprocessed real datasets only; BASELINE.json adds
a CPU-runnable toy config ("MovingMNIST-style clips") for end-to-end tests
without any downloads. Clips are bouncing colored rectangles with constant
velocity — enough temporal structure for D_V to have signal and for loss
curves to move within ~50 steps (SURVEY.md §4 integration test).

Pure numpy on the host; deterministic from an integer seed. Class labels
(for the categorical config) encode the number of sprites minus one.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


def make_batch(seed: int, batch: int, t: int = 16, size: int = 64,
               channels: int = 3, n_classes: int = 0
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (videos (B,T,H,W,C) float32 in [-1,1], labels (B,) int32)."""
    rng = np.random.default_rng(seed)
    videos = np.full((batch, t, size, size, channels), -1.0, np.float32)
    max_sprites = max(n_classes, 2)
    labels = rng.integers(0, max_sprites, size=batch) if n_classes == 0 \
        else rng.integers(0, n_classes, size=batch)
    for b in range(batch):
        n_sprites = int(labels[b]) + 1
        for _ in range(n_sprites):
            w = int(rng.integers(size // 8, size // 3))
            h = int(rng.integers(size // 8, size // 3))
            x = float(rng.uniform(0, size - w))
            y = float(rng.uniform(0, size - h))
            vx = float(rng.uniform(-3, 3))
            vy = float(rng.uniform(-3, 3))
            color = rng.uniform(-0.2, 1.0, size=channels).astype(np.float32)
            for ti in range(t):
                xi, yi = int(round(x)), int(round(y))
                videos[b, ti, yi:yi + h, xi:xi + w] = color
                x += vx
                y += vy
                if x < 0 or x > size - w:
                    vx = -vx
                    x = min(max(x, 0.0), float(size - w))
                if y < 0 or y > size - h:
                    vy = -vy
                    y = min(max(y, 0.0), float(size - h))
    return videos, labels.astype(np.int32)


def batch_iterator(seed: int, batch: int, t: int = 16, size: int = 64,
                   channels: int = 3, n_classes: int = 0,
                   start_batch: int = 0
                   ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Endless stream of deterministic batches (seed folded with a counter).
    Batch k is a pure function of (seed, k) -> exact resume from any step."""
    i = int(start_batch)
    while True:
        yield make_batch(seed * 1_000_003 + i, batch, t, size, channels,
                         n_classes)
        i += 1
