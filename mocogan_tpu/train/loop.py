"""The training driver (reference R8: train.py's Trainer + extensions;
SURVEY.md §3.1).

Reference behavior to match: alternating-GAN training driven by a loop with
snapshot (checkpoint/resume), LogReport (JSON log), PlotReport (loss-curve
PNGs), ProgressBar, and periodic sample-video dumps.

TPU-native design:
  * the whole §3.2 update is ONE jitted, GSPMD-sharded step (train.step),
  * the Python loop never syncs per step — metrics accumulate on device and
    are fetched with a single `jax.device_get` at log cadence (per-scalar
    reads over the axon tunnel cost seconds; see .claude/skills/verify),
  * async Orbax checkpointing; restart-from-latest on relaunch (SURVEY §5
    failure recovery),
  * host->device input transfer overlaps compute via async dispatch: the
    next batch is `device_put` while the current step runs.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mocogan_tpu.configs import ExperimentConfig
from mocogan_tpu.models import generator
from mocogan_tpu.parallel import mesh as pmesh
from mocogan_tpu.train import state as train_state
from mocogan_tpu.train import step as train_step_mod
from mocogan_tpu.utils import video as video_utils
from mocogan_tpu.utils.checkpoint import CheckpointManager
from mocogan_tpu.utils.metrics import MetricLogger


class Trainer:
    """Drives training for one ExperimentConfig.

    data_iterator must yield (videos (B,T,H,W,C) float32 in [-1,1],
    labels (B,) int32 or None) host batches at the GLOBAL batch size.
    """

    def __init__(self, cfg: ExperimentConfig, out_dir: Optional[str] = None,
                 resume: bool = True):
        self.cfg = cfg
        self.out_dir = out_dir or os.path.join(cfg.out_dir, cfg.name)
        os.makedirs(self.out_dir, exist_ok=True)

        pmesh.initialize_distributed()
        n_dev = cfg.train.num_devices or len(jax.devices())
        n_dev = min(n_dev, len(jax.devices()))
        self.mesh = pmesh.make_mesh(n_dev)
        self.step_fn = pmesh.make_sharded_train_step(cfg, self.mesh)

        self.logger = MetricLogger(self.out_dir)
        self.ckpt = CheckpointManager(
            os.path.join(self.out_dir, "checkpoints"),
            max_to_keep=cfg.train.keep_checkpoints)

        state = train_state.create(cfg)
        if resume and self.ckpt.latest_step() is not None:
            state = self.ckpt.restore(state)
            print(f"[trainer] resumed from step {self.ckpt.latest_step()}")
        self.state = pmesh.shard_state(self.mesh, state)
        self._eval_key = jax.random.key(cfg.train.seed + 1_000_000)

    # -- helpers ----------------------------------------------------------

    def _put(self, vids: np.ndarray, labels: Optional[np.ndarray]):
        real = pmesh.shard_batch(self.mesh, vids)
        lab = (pmesh.shard_batch(self.mesh, labels)
               if labels is not None and self.cfg.model.conditional else None)
        return real, lab

    def save_samples(self, step: int, n: int = 16) -> str:
        vids = generator.generate_fast(
            self.state.params["gen"], self.state.bn["gen"], self._eval_key,
            n, self.cfg.model)
        u8 = np.asarray(jax.device_get(generator.to_uint8(vids)))
        path = os.path.join(self.out_dir, "samples", f"step_{step:08d}.gif")
        return video_utils.save_video_grid(u8, path)

    # -- main loop ---------------------------------------------------------

    def run(self, data_iterator: Iterator[Tuple[np.ndarray, Any]],
            total_steps: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        total = total_steps or cfg.train.total_steps
        start = int(jax.device_get(self.state.step))
        log_every = cfg.train.log_every

        acc: Optional[Dict[str, jax.Array]] = None  # on-device metric sums
        n_acc = 0
        t_window = time.time()
        last: Dict[str, float] = {}

        real, lab = self._put(*next(data_iterator))
        for step in range(start, total):
            state, metrics = self.step_fn(self.state, real, lab)
            self.state = state
            # prefetch next batch while the step runs asynchronously
            if step + 1 < total:
                real, lab = self._put(*next(data_iterator))
            acc = metrics if acc is None else jax.tree.map(
                jnp.add, acc, metrics)
            n_acc += 1

            if (step + 1) % log_every == 0 or step + 1 == total:
                fetched = jax.device_get(acc)
                dt = time.time() - t_window
                last = {k: float(v) / n_acc for k, v in fetched.items()}
                sps = n_acc / dt
                self.logger.log(step + 1, last, steps_per_sec=round(sps, 3),
                                clips_per_sec=round(sps * cfg.train.batch_size,
                                                    2))
                print(f"[step {step + 1}/{total}] "
                      + " ".join(f"{k}={v:.4f}" for k, v in last.items())
                      + f" | {sps:.2f} steps/s")
                acc, n_acc, t_window = None, 0, time.time()

            if (step + 1) % cfg.train.sample_every == 0:
                self.save_samples(step + 1)
            if (step + 1) % cfg.train.checkpoint_every == 0:
                self.ckpt.save(self.state)

        self.ckpt.save(self.state, wait=True)
        self.save_samples(total)
        self.logger.plot()
        return last


def make_data_iterator(cfg: ExperimentConfig
                       ) -> Iterator[Tuple[np.ndarray, Any]]:
    """Build the host-side batch stream for cfg.data.dataset."""
    m, d, t = cfg.model, cfg.data, cfg.train
    if d.dataset == "synthetic":
        from mocogan_tpu.data import synthetic
        return synthetic.batch_iterator(
            t.seed, t.batch_size, t=m.video_length, size=m.image_size,
            channels=m.channels, n_classes=m.n_classes)
    from mocogan_tpu.data import clips
    return clips.clip_batch_iterator(cfg)
