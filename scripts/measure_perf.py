#!/usr/bin/env python
"""Perf matrix for the flagship train step on the current backend.

Measures, per (dtype, batch) cell:
  * single  — one adversarial step per dispatch (bench.py methodology;
    includes per-dispatch host->device latency, which on remote-tunnel
    backends is a real tax),
  * scan-K  — the production device-cache path: K steps per dispatch,
    sampling + fused 96->64 resize ingest + update inside one lax.scan
    program (train/step.py cached_multi_train_step). This is what the
    Trainer actually runs (configs default steps_per_call > 1), so it is
    the honest deployment steps/s.

Both cells share mocogan_tpu/utils/benchmarking.py with bench.py so the
two tools can't diverge methodologically.

Usage: [JAX_PLATFORMS=cpu] python scripts/measure_perf.py [--scan-k 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mocogan_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()  # respect an explicit JAX_PLATFORMS=cpu


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=6)
    ap.add_argument("--scan-k", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 32])
    ap.add_argument("--dtypes", nargs="+",
                    default=["float32", "bfloat16"])
    args = ap.parse_args()

    from mocogan_tpu import get_config
    from mocogan_tpu.utils import benchmarking

    results = {}
    for dtype in args.dtypes:
        for b in args.batches:
            cfg = get_config("mug", **{"train.batch_size": b,
                                       "model.compute_dtype": dtype})
            single = benchmarking.time_single_step(cfg, args.steps,
                                                   args.warmup)
            scan = benchmarking.time_cached_scan(cfg, k=args.scan_k,
                                                 reps=args.reps)
            results[f"{dtype}_b{b}"] = {
                "single_steps_per_sec": single,
                "scan_steps_per_sec": scan,
                "scan_clips_per_sec": round(scan["best"] * b, 1)}
            print(f"[{dtype} b={b}] single={single['best']:.2f} "
                  f"(med {single['median']:.2f}) "
                  f"scan{args.scan_k}={scan['best']:.2f} "
                  f"(med {scan['median']:.2f}) steps/s "
                  f"({scan['best'] * b:.0f} clips/s)", flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
