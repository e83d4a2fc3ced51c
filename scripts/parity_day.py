#!/usr/bin/env python
"""One-command reference-parity runner (VERDICT r4 next-round #8).

The two north-star claims still blocked on external files — literal
fp32 generate() parity with reference checkpoints, and absolute I3D-FVD
vs the reference — should be ONE command away the moment those files
appear, not an integration session. Given any subset of:

  --reference-npz / --snapshot-npz   a Chainer save_npz generator (or a
                                     whole Trainer snapshot, auto-split)
  --i3d-ckpt / --i3d-weights         the public kinetics-i3d TF checkpoint
                                     (converted on the fly) or an already-
                                     converted npz
  --data-dir                         a preprocessed real clip store
  --run-dir                          one of OUR trained runs
  --our-log / --reference-log        log.jsonl files for the loss-curve
                                     comparator

this runs, in order, skipping stages whose inputs are absent:

  1. import the reference checkpoint -> per-tensor match report
  2. fp32 generate() digest of the imported generator (determinism
     asserted; the literal-parity artifact)
  3. convert the I3D checkpoint (if --i3d-ckpt)
  4. FVD: reference-vs-real, ours-vs-real, ours-vs-reference — absolute
     I3D-FVD when weights are available, loudly-labeled proxy otherwise
  5. loss-curve comparator (eval/compare_runs) when both logs are given

and writes every artifact plus a final summary.json under --out.
Smoke-tested end-to-end on synthetic fixtures in
tests/test_pipeline_and_cli.py (no external files needed).

Example (the day the files exist):
  python scripts/parity_day.py --config mug \
      --snapshot-npz snapshot_iter_100000.npz \
      --i3d-ckpt kinetics-i3d/data/checkpoints/rgb_imagenet \
      --data-dir data/mug --run-dir runs/mug --out parity_day
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _generate_from_state(state, cfg, n: int, seed: int):
    import jax
    import numpy as np  # noqa: F401

    from mocogan_tpu.models import generator

    return generator.generate_chunked(
        state.params["gen"], state.bn["gen"], jax.random.key(seed), n,
        cfg.model)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--config", default="mug")
    ap.add_argument("--reference-npz", default=None,
                    help="Chainer save_npz of the reference generator")
    ap.add_argument("--snapshot-npz", default=None,
                    help="whole Chainer Trainer snapshot (auto-split)")
    ap.add_argument("--rename", nargs="*", metavar="ACTUAL=CANONICAL",
                    help="npz key renames adapting the real naming")
    ap.add_argument("--no-strict", action="store_true")
    ap.add_argument("--i3d-ckpt", default=None,
                    help="kinetics-i3d TF checkpoint dir/prefix (converted "
                         "to npz under --out)")
    ap.add_argument("--i3d-weights", default=None,
                    help="already-converted I3D npz (eval/i3d.py contract)")
    ap.add_argument("--data-dir", default=None,
                    help="preprocessed real clip store for FVD")
    ap.add_argument("--run-dir", default=None,
                    help="OUR trained run (checkpoints/) for ours-vs-ref")
    ap.add_argument("--our-log", default=None)
    ap.add_argument("--reference-log", default=None,
                    help="reference losses as log.jsonl (step + loss_*)")
    ap.add_argument("--n", type=int, default=256,
                    help="clips per side for FVD")
    ap.add_argument("--digest-n", type=int, default=2,
                    help="clips in the parity digest (golden recipe: 2)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="parity_day")
    ap.add_argument("--set", nargs="*", metavar="K=V", dest="overrides")
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    summary: dict = {"stages": {}}

    import numpy as np

    from train import parse_overrides

    from mocogan_tpu import get_config
    from mocogan_tpu.eval import fvd as fvd_mod
    from mocogan_tpu.eval import parity
    from mocogan_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    cfg = get_config(args.config, **parse_overrides(args.overrides))

    # -- 1. import the reference checkpoint -------------------------------
    ref_state = None
    if args.reference_npz or args.snapshot_npz:
        from mocogan_tpu.eval.import_chainer import import_experiment

        rename = dict(kv.split("=", 1) for kv in args.rename or [])
        ref_state, reports = import_experiment(
            cfg, gen_npz=args.reference_npz,
            snapshot_npz=args.snapshot_npz,
            rename=rename or None, strict=not args.no_strict)
        path = os.path.join(args.out, "import_report.json")
        with open(path, "w") as f:
            json.dump(reports, f, indent=2, default=str)
        net_counts = {net: len(rep.get("matched", []))
                      for net, rep in reports.items() if net != "snapshot"}
        print(f"[parity_day] import: {net_counts} tensors matched "
              f"-> {path}")
        summary["stages"]["import"] = {"report": path,
                                       "matched": net_counts}

        # -- 2. fp32 digest of the imported generator ---------------------
        rep = parity.check_determinism(
            cfg, ref_state.params["gen"], ref_state.bn["gen"],
            n=args.digest_n, seed=args.seed)
        dpath = os.path.join(args.out, "reference_generate_digest.json")
        with open(dpath, "w") as f:
            json.dump(rep, f, indent=2)
        if not rep["deterministic"]:
            raise SystemExit("FAIL: imported generator nondeterministic")
        print(f"[parity_day] reference generate() fp32 digest "
              f"{rep['digest'][:16]}... ({rep['backend']}) -> {dpath}")
        summary["stages"]["digest"] = rep
    else:
        print("[parity_day] no reference checkpoint given — skipping "
              "import + digest")

    # -- 3. I3D weights ----------------------------------------------------
    i3d_npz = args.i3d_weights
    if args.i3d_ckpt and not i3d_npz:
        from mocogan_tpu.eval.i3d_convert import convert_to_npz

        i3d_npz = os.path.join(args.out, "i3d_converted.npz")
        convert_to_npz(args.i3d_ckpt, i3d_npz)
        print(f"[parity_day] converted I3D checkpoint -> {i3d_npz}")
        summary["stages"]["i3d_convert"] = i3d_npz

    # -- 4. FVD ------------------------------------------------------------
    sides = {}
    if ref_state is not None:
        sides["reference"] = lambda: _generate_from_state(
            ref_state, cfg, args.n, args.seed)
    if args.run_dir:
        import eval_fvd as efvd

        sides["ours"] = lambda: efvd._samples_from_run(
            cfg, args.run_dir, args.n, args.seed)[0]
    real = None
    if args.data_dir:
        import eval_fvd as efvd

        real = efvd._real_from_store(cfg, args.data_dir, args.n,
                                     args.seed + 1)
    if sides or real is not None:
        if i3d_npz:
            extractor = fvd_mod.I3DFeatures(i3d_npz)
            ex_name = "i3d_logits (ABSOLUTE FVD)"
        else:
            extractor = fvd_mod.RandomProjectionFeatures()
            ex_name = ("random_projection_seed0 (RELATIVE proxy — pass "
                       "--i3d-ckpt/--i3d-weights for absolute FVD)")
        mats = {k: v() for k, v in sides.items()}
        scores = {}
        for name, vids in mats.items():
            if real is not None:
                scores[f"{name}_vs_real"] = fvd_mod.fvd(
                    np.asarray(vids), real, extractor=extractor)
        if "reference" in mats and "ours" in mats:
            scores["ours_vs_reference"] = fvd_mod.fvd(
                np.asarray(mats["ours"]), np.asarray(mats["reference"]),
                extractor=extractor)
        fpath = os.path.join(args.out, "fvd.json")
        rec = {"extractor": ex_name, "n": args.n,
               "scores": {k: round(float(v), 4) for k, v in scores.items()},
               "eval_fingerprint": fvd_mod.extractor_fingerprint(extractor)}
        with open(fpath, "w") as f:
            json.dump(rec, f, indent=2)
        print(f"[parity_day] FVD [{ex_name}]: {rec['scores']} -> {fpath}")
        summary["stages"]["fvd"] = rec

    # -- 5. loss-curve comparator ------------------------------------------
    if args.our_log and args.reference_log:
        from mocogan_tpu.eval import compare_runs as cr

        rep = cr.compare(cr.load_log(args.our_log),
                         cr.load_log(args.reference_log))
        png = cr.plot_overlay(rep, os.path.join(args.out, "overlay.png"),
                              labels=("ours", "reference"))
        printable = {k: v for k, v in rep.items() if not k.startswith("_")}
        cpath = os.path.join(args.out, "compare.json")
        with open(cpath, "w") as f:
            json.dump(printable, f, indent=2)
        print(f"[parity_day] comparator: max_nabc={rep['max_nabc']} "
              f"-> {cpath}" + (f" + {png}" if png else ""))
        summary["stages"]["compare"] = {"max_nabc": rep["max_nabc"],
                                        "report": cpath}

    spath = os.path.join(args.out, "summary.json")
    with open(spath, "w") as f:
        json.dump(summary, f, indent=2, default=str)
    print(f"[parity_day] done -> {spath}")
    return summary


if __name__ == "__main__":
    main()
