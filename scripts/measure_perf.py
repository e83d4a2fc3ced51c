#!/usr/bin/env python
"""Perf matrix for the flagship train step on the current backend.

Measures, per (dtype, batch) cell:
  * single  — one adversarial step per dispatch (bench.py methodology;
    includes per-dispatch host->device latency, which on remote-tunnel
    backends is a real tax),
  * scan-K  — the production device-cache path: K steps per dispatch,
    sampling + fused ingest + update inside one lax.scan program
    (train/step.py cached_multi_train_step). This is what the Trainer
    actually runs (configs default steps_per_call > 1), so it is the
    honest deployment steps/s.

Usage: python scripts/measure_perf.py [--steps 60] [--scan-k 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_single(cfg, steps: int) -> float:
    from mocogan_tpu.data import synthetic
    from mocogan_tpu.train import state as train_state
    from mocogan_tpu.train import step as train_step

    s = train_state.create(cfg)
    fn = train_step.jitted_train_step(cfg)
    vids, _ = synthetic.make_batch(0, cfg.train.batch_size)
    v = jnp.asarray(vids)
    for _ in range(3):
        s, m = fn(s, v, None)
    jax.device_get(m)
    t0 = time.time()
    for _ in range(steps):
        s, m = fn(s, v, None)
    jax.device_get(m)
    return steps / (time.time() - t0)


def time_scan(cfg, k: int, reps: int) -> float:
    """Device-cache path: a small synthetic uint8 pool resident in HBM."""
    from mocogan_tpu.parallel import mesh as pmesh
    from mocogan_tpu.train import state as train_state

    mesh = pmesh.make_mesh(1)
    n, t_max = 64, cfg.model.video_length + 8
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 256, (n, t_max, cfg.model.image_size,
                                 cfg.model.image_size, cfg.model.channels),
                        dtype=np.uint8)
    lengths = np.full((n,), t_max, np.int32)
    rep = pmesh.replicated(mesh)
    pool_d = jax.device_put(pool, rep)
    len_d = jax.device_put(lengths, rep)
    s = pmesh.shard_state(mesh, train_state.create(cfg))
    fn = pmesh.make_cached_train_step(cfg, mesh, k)
    s, m = fn(s, pool_d, len_d, None)
    jax.device_get(m)
    t0 = time.time()
    for _ in range(reps):
        s, m = fn(s, pool_d, len_d, None)
    jax.device_get(m)
    return k * reps / (time.time() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--scan-k", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 32])
    ap.add_argument("--dtypes", nargs="+",
                    default=["float32", "bfloat16"])
    args = ap.parse_args()

    from mocogan_tpu import get_config

    results = {}
    for dtype in args.dtypes:
        for b in args.batches:
            cfg = get_config("mug", **{"train.batch_size": b,
                                       "model.compute_dtype": dtype})
            single = time_single(cfg, args.steps)
            scan = time_scan(cfg, args.scan_k, args.reps)
            cell = {"single_steps_per_sec": round(single, 2),
                    "scan_steps_per_sec": round(scan, 2),
                    "scan_clips_per_sec": round(scan * b, 1)}
            results[f"{dtype}_b{b}"] = cell
            print(f"[{dtype} b={b}] single={single:.2f} "
                  f"scan{args.scan_k}={scan:.2f} steps/s "
                  f"({scan * b:.0f} clips/s)", flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
