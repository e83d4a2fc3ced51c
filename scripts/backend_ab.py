#!/usr/bin/env python
"""TPU-vs-CPU training A/B at fp32 (VERDICT r4 next-round #3c).

The fidelity contract's training side: run the SAME tiny-geometry config
(same seed, same synthetic stream, fp32 params + compute, fp32 matmul
precision) once on the real TPU chip and once on this host's CPU, then
push both log.jsonl files through the loss-curve comparator.

Exact bit-parity across backends is NOT the expectation — conv/matmul
reduction order differs between the MXU path (even at
jax_default_matmul_precision=float32) and the CPU path, and GAN dynamics
amplify ulp-level differences over hundreds of steps. What the
comparator quantifies is whether the two backends follow statistically
the same training trajectory (nabc per loss key ~ noise floor). The
single-step cross-backend numeric gap is measured separately by
bench.py's `parity` stage (generate() max-abs-err).

Usage: python scripts/backend_ab.py [--steps 500] [--out /tmp/backend_ab]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = ["model.image_size=32", "model.video_length=8",
        "model.gen_features=8", "model.disc_features=8",
        "train.batch_size=8", "train.log_every=10",
        "train.checkpoint_every=0", "train.sample_every=0",
        "train.eval_every=0", "data.dataset=synthetic",
        "data.device_cache=false", "train.steps_per_call=1"]


def run_cell(name: str, out: str, steps: int, cpu: bool,
             timeout: float) -> str:
    cell = os.path.join(out, name)
    env = dict(os.environ, JAX_DEFAULT_MATMUL_PRECISION="float32")
    if cpu:
        env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable, "train.py", "--config", "mug",
           "--total-steps", str(steps), "--no-resume",
           "--out-dir", cell, "--set"] + TINY
    print(f"[backend_ab] {name}: {' '.join(cmd[-4:])} ...", flush=True)
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True, timeout=timeout)
    if r.returncode != 0:
        raise SystemExit(f"{name} failed (rc {r.returncode}):\n"
                         + r.stderr[-2000:])
    tail = [ln for ln in r.stdout.splitlines() if ln.strip()][-2:]
    print(f"[backend_ab] {name} done: " + " | ".join(tail))
    return os.path.join(cell, "log.jsonl")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--out", default="/tmp/backend_ab")
    ap.add_argument("--timeout", type=float, default=1800.0,
                    help="per-cell subprocess timeout (a hung tunnel must "
                         "cost one cell, not the session)")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    log_tpu = run_cell("tpu", args.out, args.steps, cpu=False,
                       timeout=args.timeout)
    log_cpu = run_cell("cpu", args.out, args.steps, cpu=True,
                       timeout=args.timeout)

    from mocogan_tpu.eval import compare_runs as cr

    rep = cr.compare(cr.load_log(log_tpu), cr.load_log(log_cpu))
    png = cr.plot_overlay(rep, os.path.join(args.out, "overlay.png"),
                          labels=("tpu", "cpu"))
    printable = {k: v for k, v in rep.items() if not k.startswith("_")}
    printable["cells"] = {"a": "tpu fp32 (matmul precision float32)",
                          "b": "cpu fp32"}
    printable["steps"] = args.steps
    with open(os.path.join(args.out, "compare.json"), "w") as f:
        json.dump(printable, f, indent=2)
    print(json.dumps({k: printable[k] for k in
                      ("max_nabc", "mean_nabc")}, indent=2))
    print(f"[backend_ab] report -> {args.out}/compare.json"
          + (f" + {png}" if png else ""))
    return printable


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
