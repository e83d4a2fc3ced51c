#!/usr/bin/env python
"""Kernel-level profile of the train step: capture a device trace and
print the serialized per-op time breakdown ("XLA Ops" timeline).

Parses the xplane.pb directly (the tensorboard_plugin_profile converter
is incompatible with this host's TF build), so it needs only TF's
protobuf definitions. Run with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=
python if the default descriptor pool rejects the generated protos.

Usage: python scripts/profile_step.py [--dtype bfloat16] [--steps 10]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mocogan_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()


def capture(dtype: str, steps: int, outdir: str) -> None:
    import jax
    import jax.numpy as jnp

    from mocogan_tpu import get_config
    from mocogan_tpu.data import synthetic
    from mocogan_tpu.train import state as train_state
    from mocogan_tpu.train import step as train_step

    cfg = get_config("mug", **{"train.batch_size": 16,
                               "model.compute_dtype": dtype})
    s = train_state.create(cfg)
    fn = train_step.jitted_train_step(cfg)
    vids, _ = synthetic.make_batch(0, 16)
    v = jnp.asarray(vids)
    for _ in range(5):
        s, m = fn(s, v, None)
    jax.device_get(m)
    with jax.profiler.trace(outdir):
        for _ in range(steps):
            s, m = fn(s, v, None)
        jax.device_get(m)


def report(outdir: str, steps: int, top: int) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(outdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise SystemExit(f"no xplane.pb under {outdir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if "TPU" in p.name]
    if not planes:
        raise SystemExit(f"no TPU plane; have {[p.name for p in xs.planes]}")
    plane = planes[0]
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        tot: collections.Counter = collections.Counter()
        cnt: collections.Counter = collections.Counter()
        grand = 0
        for ev in line.events:
            name = meta.get(ev.metadata_id, "?")
            m = re.match(r"%?([a-z\-_]+)[\.\d]*\s*=\s*(\S{0,48})", name)
            key = f"{m.group(1)} {m.group(2)[:46]}" if m else name[:60]
            tot[key] += ev.duration_ps
            cnt[key] += 1
            grand += ev.duration_ps
        print(f"[{plane.name}] XLA Ops: {grand / 1e9:.2f} ms over "
              f"{steps} steps -> {grand / 1e9 / steps:.3f} ms/step "
              f"serialized")
        for name, ps in tot.most_common(top):
            print(f"{ps / 1e9:8.2f} ms ({100 * ps / grand:4.1f}%) "
                  f"x{cnt[name]:<5} {name}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()
    outdir = args.outdir or tempfile.mkdtemp(prefix="mocogan_prof_")
    capture(args.dtype, args.steps, outdir)
    report(outdir, args.steps, args.top)


if __name__ == "__main__":
    main()
