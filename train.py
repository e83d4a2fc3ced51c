#!/usr/bin/env python
"""Training CLI — the reference's ``train.py`` surface (R8; SURVEY.md §3.1)
on top of typed configs.

Examples:
    python train.py --config toy --total-steps 2000
    python train.py --config mug --data-dir /data/mug_clips
    python train.py --config scaled --set train.batch_size=64
"""

from __future__ import annotations

import argparse
import ast


_KEYWORDS = {"true": True, "false": False, "none": None,
             "True": True, "False": False, "None": None}


def parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        if v in _KEYWORDS:
            # lowercase true/false/none would fall through literal_eval to
            # the string fallback — and the string "false" is TRUTHY, so
            # `--set data.device_cache=false` would silently ENABLE it.
            out[k] = _KEYWORDS[v]
            continue
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="toy",
                    help="toy | mug | weizmann | categorical | scaled")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--total-steps", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--num-devices", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--debug-nans", action="store_true",
                    help="enable jax_debug_nans (SURVEY.md §5 sanitizers)")
    ap.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler trace of the first steps here")
    ap.add_argument("--set", nargs="*", metavar="K=V", dest="overrides",
                    help="dotted config overrides, e.g. model.video_length=32")
    args = ap.parse_args(argv)

    overrides = parse_overrides(args.overrides)
    if args.data_dir is not None:
        overrides["data.data_dir"] = args.data_dir
    if args.total_steps is not None:
        overrides["train.total_steps"] = args.total_steps
    if args.batch_size is not None:
        overrides["train.batch_size"] = args.batch_size
    if args.seed is not None:
        overrides["train.seed"] = args.seed
    if args.num_devices is not None:
        overrides["train.num_devices"] = args.num_devices

    import jax

    from mocogan_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    import numpy as np

    from mocogan_tpu import get_config
    from mocogan_tpu.train.loop import Trainer, make_data_iterator

    cfg = get_config(args.config, **overrides)
    print(f"[train] config={cfg.name} model={cfg.model} train={cfg.train}")
    trainer = Trainer(cfg, out_dir=args.out_dir, resume=not args.no_resume)

    def data_iter():  # data stream resumes exactly at the restored step
        start = int(np.asarray(jax.device_get(trainer.state.step)))
        return make_data_iterator(cfg, start_batch=start)

    def run(total_steps=None):
        # device_cache needs an on-disk clip store; the synthetic dataset
        # is generated per batch on the host, so route it host-fed rather
        # than crash on load_pool("").
        if cfg.data.device_cache and cfg.data.dataset != "synthetic":
            return trainer.run_device_cached(total_steps)
        return trainer.run(data_iter(), total_steps)

    if args.profile_dir:
        from mocogan_tpu.utils import profiling

        with profiling.trace(args.profile_dir):
            run(total_steps=min(20, cfg.train.total_steps))
        print(f"[train] profile written to {args.profile_dir}; "
              "continuing unprofiled")
    run()


if __name__ == "__main__":
    main()
