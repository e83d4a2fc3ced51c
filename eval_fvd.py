#!/usr/bin/env python
"""FVD evaluation CLI (B5 harness surface): Fréchet Video Distance between a
trained checkpoint's samples and a real clip store (or between two runs).

    python eval_fvd.py --config mug --run-dir runs/mug --data-dir data/mug
    python eval_fvd.py --config mug --run-dir runs/a --run-dir-b runs/b
    python eval_fvd.py --config mug --run-dir runs/mug --data-dir data/mug \
        --i3d-weights i3d.npz        # ABSOLUTE I3D-FVD

Default extractor is the fixed-seed random-projection net (relative
metric). For absolute FVD, convert the public kinetics-i3d checkpoint
once (python -m mocogan_tpu.eval.i3d_convert --ckpt <dir> --out i3d.npz)
and pass --i3d-weights.
"""

from __future__ import annotations

import argparse
import json
import os


def _samples_from_run(cfg, run_dir: str, n: int, seed: int):
    import jax
    import numpy as np

    from mocogan_tpu.models import generator
    from mocogan_tpu.train import state as train_state
    from mocogan_tpu.utils.checkpoint import CheckpointManager

    mngr = CheckpointManager(os.path.join(run_dir, "checkpoints"))
    state = mngr.restore(train_state.create(cfg))
    step = int(np.asarray(jax.device_get(state.step)))
    vids = generator.generate_chunked(
        state.params["gen"], state.bn["gen"], jax.random.key(seed), n,
        cfg.model)
    mngr.close()
    return vids, step


def _real_from_store(cfg, data_dir: str, n: int, seed: int):
    import jax
    import numpy as np

    from mocogan_tpu.data import clips
    from mocogan_tpu.ops import preproc

    ds = clips.ClipDataset(data_dir, cfg.model.video_length)
    rng = np.random.default_rng(seed)
    raws = []
    for i in rng.integers(0, len(ds), size=n):
        clip, idx, _ = ds.get_example(int(i), rng)
        raws.append(clip[idx])
    raw = np.stack(raws)
    idx = np.broadcast_to(
        np.arange(cfg.model.video_length, dtype=np.int32),
        (n, cfg.model.video_length))
    out = jax.jit(lambda r, i: preproc.subsample_and_preprocess(
        r, i, cfg.model.image_size))(raw, idx)
    return np.asarray(jax.device_get(out))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="mug")
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--run-dir-b", default=None,
                    help="compare two runs instead of run-vs-data")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--i3d-weights", default=None,
                    help="npz in the eval/i3d.py contract (convert the "
                         "public kinetics-i3d checkpoint with "
                         "python -m mocogan_tpu.eval.i3d_convert): "
                         "computes ABSOLUTE I3D-FVD instead of the "
                         "random-projection proxy")
    ap.add_argument("--features", default="logits",
                    choices=["logits", "pool"],
                    help="I3D feature head (TF-GAN FVD uses logits)")
    ap.add_argument("--set", nargs="*", metavar="K=V", dest="overrides")
    args = ap.parse_args(argv)

    from train import parse_overrides

    from mocogan_tpu import get_config
    from mocogan_tpu.eval import fvd as fvd_mod
    from mocogan_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    cfg = get_config(args.config, **parse_overrides(args.overrides))

    gen_a, step_a = _samples_from_run(cfg, args.run_dir, args.n, args.seed)
    if args.run_dir_b:
        other, step_b = _samples_from_run(cfg, args.run_dir_b, args.n,
                                          args.seed + 1)
        desc = f"run@{step_a} vs run_b@{step_b}"
    elif args.data_dir:
        other = _real_from_store(cfg, args.data_dir, args.n, args.seed + 1)
        desc = f"run@{step_a} vs real data"
    else:
        raise SystemExit("need --data-dir or --run-dir-b")

    if args.i3d_weights:
        extractor = fvd_mod.I3DFeatures(args.i3d_weights,
                                        features=args.features)
        name, key = f"i3d_{args.features}", "fvd"
    else:
        extractor = None   # fvd() defaults to the random-projection proxy
        name, key = "random_projection_seed0", "fvd_proxy"
    score = fvd_mod.fvd(gen_a, other, extractor=extractor)
    print(json.dumps({key: round(score, 4), "n": args.n,
                      "comparison": desc, "extractor": name}))


if __name__ == "__main__":
    main()
