"""fp32 ``generate()`` fidelity contract tooling (BASELINE: "inference ...
matches the reference's public generate() API and output fidelity
bit-for-bit at fp32").

With the reference mount empty and no reference checkpoints obtainable
offline (SURVEY.md §6), literal cross-implementation parity is unverifiable;
what IS verifiable — and what this module checks — is the mechanism:

  * determinism: same (params, bn, key) -> bit-identical videos across
    calls, across jit/eager, and across process restarts;
  * a stable content digest of the generated tensor that can be recorded in
    a run dir and re-checked later or on another backend (CPU vs TPU differ
    only by documented matmul-precision effects; the digest pins each).

Run:  python -m mocogan_tpu.eval.parity --config toy [--run-dir runs/toy]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
from typing import Optional

import numpy as np


def video_digest(videos: np.ndarray) -> str:
    """SHA256 of the exact fp32 bytes (C-order) — bit-for-bit identity."""
    v = np.ascontiguousarray(np.asarray(videos, dtype=np.float32))
    return hashlib.sha256(v.tobytes()).hexdigest()


def check_determinism(cfg, params, bn, *, n: int = 4, seed: int = 0,
                      jit_vs_eager: bool = True) -> dict:
    """Returns {"digest", "deterministic", "jit_matches_eager"}."""
    import jax

    from mocogan_tpu.models import generator

    key = jax.random.key(seed)
    v1 = jax.device_get(generator.generate_fast(params, bn, key, n,
                                                cfg.model))
    v2 = jax.device_get(generator.generate_fast(params, bn, key, n,
                                                cfg.model))
    out = {
        "digest": video_digest(v1),
        "deterministic": bool((np.asarray(v1) == np.asarray(v2)).all()),
        "backend": jax.default_backend(),
        "n": n,
        "seed": seed,
    }
    if jit_vs_eager:
        v3 = jax.device_get(
            generator.generate(params, bn, key, n, cfg.model))
        out["jit_matches_eager"] = bool(
            (np.asarray(v1) == np.asarray(v3)).all())
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="toy")
    ap.add_argument("--run-dir", default=None,
                    help="restore params from this run's checkpoints/")
    ap.add_argument("--reference-npz", default=None,
                    help="import the generator from a Chainer save_npz "
                         "checkpoint (eval/import_chainer.py) and digest "
                         "ITS generate() output — the reference-parity "
                         "path")
    ap.add_argument("--rename", nargs="*", metavar="ACTUAL=CANONICAL",
                    help="npz key renames for --reference-npz")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--record", default=None,
                    help="write/compare digest record at this path")
    args = ap.parse_args(argv)

    import jax

    from mocogan_tpu import get_config
    from mocogan_tpu.train import state as train_state

    cfg = get_config(args.config)
    if args.reference_npz:
        from mocogan_tpu.eval.import_chainer import import_experiment

        rename = dict(kv.split("=", 1) for kv in args.rename or [])
        state, reports = import_experiment(cfg, gen_npz=args.reference_npz,
                                           rename=rename or None)
        print(f"[parity] imported generator from {args.reference_npz}: "
              f"{len(reports['gen']['matched'])} tensors")
    else:
        state = train_state.create(cfg)
    if args.run_dir:
        from mocogan_tpu.utils.checkpoint import CheckpointManager

        mngr = CheckpointManager(os.path.join(args.run_dir, "checkpoints"))
        state = mngr.restore(state)
        mngr.close()

    rep = check_determinism(cfg, state.params["gen"], state.bn["gen"],
                            n=args.n, seed=args.seed)
    print(json.dumps(rep, indent=2))
    if not rep["deterministic"]:
        raise SystemExit("FAIL: generate() not deterministic")

    if args.record:
        if os.path.exists(args.record):
            prev = json.load(open(args.record))
            match = prev["digest"] == rep["digest"]
            print(f"digest {'MATCHES' if match else 'DIFFERS FROM'} record "
                  f"({prev['backend']} @ {args.record})")
            if not match and prev["backend"] == rep["backend"]:
                raise SystemExit("FAIL: same-backend digest mismatch")
        else:
            json.dump(rep, open(args.record, "w"), indent=2)
            print(f"recorded digest to {args.record}")


if __name__ == "__main__":
    main()
