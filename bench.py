#!/usr/bin/env python
"""Benchmark: training steps/sec/chip on the flagship 64x64x16f MoCoGAN
config (BASELINE metric), plus generated clips/sec.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is the speedup over the CPU-oracle train step (BASELINE.md: the
Chainer-CPU anchor is unobtainable offline — Chainer isn't installed and the
reference mount is empty — so the documented stand-in is the same training
step on this host's CPU, measured once and cached). north_star: >= 5x.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cpu_baseline.json")
ORACLE = os.path.join(REPO, "benchmarks", "cpu_oracle.json")

BENCH_CFG = dict(config="mug", batch_size=16, steps=50, warmup=6)

_CHILD_SRC = r"""
import json, os, time
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from mocogan_tpu import get_config
from mocogan_tpu.data import synthetic
from mocogan_tpu.train import state as train_state, step as train_step

cfg = get_config("mug", **{"train.batch_size": %(batch_size)d})
s = train_state.create(cfg)
fn = train_step.jitted_train_step(cfg)
vids, _ = synthetic.make_batch(0, cfg.train.batch_size)
v = jnp.asarray(vids)
s, m = fn(s, v, None)
jax.block_until_ready(jax.tree.leaves(s.params)[0])
n = %(steps)d
t0 = time.time()
for _ in range(n):
    s, m = fn(s, v, None)
jax.block_until_ready(jax.tree.leaves(s.params)[0])
print(json.dumps({"steps_per_sec": n / (time.time() - t0)}))
"""


def cpu_baseline_steps_per_sec() -> float:
    key = f"{BENCH_CFG['config']}_b{BENCH_CFG['batch_size']}"
    for path, getter in ((CACHE, lambda d: d),
                         (ORACLE, lambda d: d.get("values", {}))):
        if os.path.exists(path):
            try:
                vals = getter(json.load(open(path)))
                if key in vals:
                    return float(vals[key])
            except (ValueError, KeyError, AttributeError):
                pass
    src = _CHILD_SRC % {"batch_size": BENCH_CFG["batch_size"], "steps": 3}
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", src], capture_output=True,
                         text=True, env=env, cwd=REPO, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(f"cpu baseline failed: {out.stderr[-2000:]}")
    sps = float(json.loads(out.stdout.strip().splitlines()[-1])
                ["steps_per_sec"])
    cached = {}
    if os.path.exists(CACHE):
        try:
            cached = json.load(open(CACHE))
        except ValueError:
            pass
    cached[key] = sps
    json.dump(cached, open(CACHE, "w"))
    return sps


def tpu_train_steps_per_sec(compute_dtype: str = "float32") -> float:
    from mocogan_tpu import get_config
    from mocogan_tpu.utils import benchmarking

    cfg = get_config("mug",
                     **{"train.batch_size": BENCH_CFG["batch_size"],
                        "model.compute_dtype": compute_dtype})
    return benchmarking.time_single_step(cfg, BENCH_CFG["steps"],
                                         BENCH_CFG["warmup"])


def tpu_scan_steps_per_sec(compute_dtype: str = "float32",
                           k: int = 16) -> float:
    """The PRODUCTION path: K steps per dispatch with the dataset resident
    in HBM (device cache) — on-device clip sampling, windowing, fused
    Pallas 96->64 resize ingest and the adversarial update all inside one
    scanned program (the `mug` config's defaults: device_cache=True,
    steps_per_call=16, raw_size=96). Amortizes the per-dispatch tunnel
    latency the single-step methodology above pays on every step."""
    from mocogan_tpu import get_config
    from mocogan_tpu.utils import benchmarking

    cfg = get_config("mug",
                     **{"train.batch_size": BENCH_CFG["batch_size"],
                        "model.compute_dtype": compute_dtype})
    return benchmarking.time_cached_scan(cfg, k=k)


def generate_clips_per_sec() -> float:
    import jax

    from mocogan_tpu import get_config
    from mocogan_tpu.models import generator
    from mocogan_tpu.train import state as train_state

    cfg = get_config("mug")
    s = train_state.create(cfg)
    # 256 clips/dispatch: at 64 the measurement is dominated by per-dispatch
    # tunnel latency, not generator throughput (serving batches larger).
    n_clips = 256

    def gen(key):
        return generator.generate_fast(s.params["gen"], s.bn["gen"], key,
                                       n_clips, cfg.model)

    out = gen(jax.random.key(0))
    jax.device_get(out[0, 0, 0, 0, :1])
    reps = 10
    t0 = time.time()
    for i in range(reps):
        out = gen(jax.random.key(i + 1))
    jax.device_get(out[0, 0, 0, 0, :1])
    return n_clips * reps / (time.time() - t0)


def main():
    tpu_sps = tpu_train_steps_per_sec()
    # bf16 variant reported by default (BENCH_BF16=0 skips it when the
    # extra program's cold-cache first execution matters).
    bf16_sps = None
    if os.environ.get("BENCH_BF16", "1") != "0":
        try:
            bf16_sps = tpu_train_steps_per_sec("bfloat16")
        except Exception as e:  # noqa: BLE001
            print(f"[bench] bf16 variant failed: {e}", file=sys.stderr)
    # Production multi-step path (device cache + scan; BENCH_SCAN=0 skips).
    scan_sps = scan_bf16_sps = None
    if os.environ.get("BENCH_SCAN", "1") != "0":
        try:
            scan_sps = tpu_scan_steps_per_sec("float32")
            scan_bf16_sps = tpu_scan_steps_per_sec("bfloat16")
        except Exception as e:  # noqa: BLE001
            print(f"[bench] scan variant failed: {e}", file=sys.stderr)
    clips = generate_clips_per_sec()
    try:
        cpu_sps = cpu_baseline_steps_per_sec()
        vs = tpu_sps / cpu_sps
    except Exception as e:  # noqa: BLE001 — bench must still emit its line
        print(f"[bench] cpu baseline unavailable: {e}", file=sys.stderr)
        cpu_sps, vs = None, None

    print(f"[bench] train: {tpu_sps:.2f} steps/s/chip "
          f"(cpu oracle: {cpu_sps if cpu_sps else '?'} steps/s) | "
          f"generate: {clips:.1f} clips/s", file=sys.stderr)
    print(json.dumps({
        "metric": "train_steps_per_sec_per_chip_64x64x16f",
        "value": round(tpu_sps, 3),
        "unit": "steps/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "extra": {"generate_clips_per_sec": round(clips, 1),
                  "train_steps_per_sec_bf16": (round(bf16_sps, 2)
                                               if bf16_sps else None),
                  "train_steps_per_sec_scan16": (round(scan_sps, 2)
                                                 if scan_sps else None),
                  "train_steps_per_sec_scan16_bf16": (
                      round(scan_bf16_sps, 2) if scan_bf16_sps else None),
                  "cpu_oracle_steps_per_sec": (round(cpu_sps, 4)
                                               if cpu_sps else None),
                  "batch_size": BENCH_CFG["batch_size"]},
    }))


if __name__ == "__main__":
    main()
