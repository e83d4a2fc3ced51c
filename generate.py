#!/usr/bin/env python
"""Sample-generation CLI — the reference's generation script surface (R9;
SURVEY.md §3.3): load a checkpoint, sample N clips deterministically,
save a GIF grid (and optionally an mp4).

    python generate.py --config toy --run-dir runs/toy --n 16 --seed 7
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="toy")
    ap.add_argument("--run-dir", required=True,
                    help="training output dir containing checkpoints/")
    ap.add_argument("--out", default=None, help="output gif path")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--video-length", type=int, default=None)
    ap.add_argument("--labels", type=int, nargs="*", default=None,
                    help="class labels for the categorical config")
    ap.add_argument("--mp4", action="store_true")
    ap.add_argument("--individual", action="store_true",
                    help="also write one GIF per clip")
    ap.add_argument("--set", nargs="*", metavar="K=V", dest="overrides")
    args = ap.parse_args(argv)

    from train import parse_overrides

    import jax
    import numpy as np

    from mocogan_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()

    from mocogan_tpu import get_config
    from mocogan_tpu.models import generator
    from mocogan_tpu.train import state as train_state
    from mocogan_tpu.utils import video as video_utils
    from mocogan_tpu.utils.checkpoint import CheckpointManager

    cfg = get_config(args.config, **parse_overrides(args.overrides))
    mngr = CheckpointManager(os.path.join(args.run_dir, "checkpoints"))
    state = mngr.restore(train_state.create(cfg))
    step = int(np.asarray(jax.device_get(state.step)))
    print(f"[generate] restored step {step}")

    labels = (np.asarray(args.labels, np.int32)
              if args.labels is not None else None)
    # generate_fast = jit-cached generate: identical fp32 program, but ONE
    # dispatch instead of per-primitive eager round trips (multi-second
    # each on remote-tunnel TPU backends).
    vids = generator.generate_fast(
        state.params["gen"], state.bn["gen"], jax.random.key(args.seed),
        args.n, cfg.model,
        labels=None if labels is None else jax.numpy.asarray(labels),
        video_length=args.video_length)
    u8 = np.asarray(jax.device_get(generator.to_uint8(vids)))

    out = args.out or os.path.join(args.run_dir,
                                   f"generated_step{step}_seed{args.seed}.gif")
    path = video_utils.save_video_grid(u8, out)
    print(f"[generate] wrote {path}")
    if args.individual:
        paths = video_utils.save_individual_gifs(
            u8, os.path.join(args.run_dir, f"clips_step{step}"),
            prefix=f"seed{args.seed}")
        print(f"[generate] wrote {len(paths)} individual clips")
    if args.mp4:
        mp4 = video_utils.save_mp4(video_utils.tile_videos(u8),
                                   os.path.splitext(out)[0] + ".mp4")
        print(f"[generate] mp4: {mp4 or 'no codec available'}")
    mngr.close()


if __name__ == "__main__":
    main()
