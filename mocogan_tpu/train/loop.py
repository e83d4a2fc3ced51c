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
        self._preproc_fn = None  # jitted fused ingest, built on first use
        self._fvd_extractor = None

    # -- helpers ----------------------------------------------------------

    def _fused_preproc(self):
        """jitted B3 ingest: sharded uint8 raw clips -> [-1,1] f32 videos."""
        if self._preproc_fn is None:
            from mocogan_tpu.ops import preproc

            size = self.cfg.model.image_size
            use_pallas = (self.cfg.data.fused_preproc
                          and jax.default_backend() == "tpu")
            bsh = pmesh.batch_sharding(self.mesh)
            self._preproc_fn = jax.jit(
                lambda raw, idx: preproc.subsample_and_preprocess(
                    raw, idx, size, use_pallas=use_pallas),
                in_shardings=(bsh, bsh), out_shardings=bsh)
        return self._preproc_fn

    def _put(self, batch, labels: Optional[np.ndarray] = None):
        """Accepts either (videos f32 in [-1,1], labels) pairs (synthetic
        path) or the clip pipeline's {"raw" uint8, "frame_idx", "labels"}
        dict (R6 + fused on-device preproc, B3)."""
        if isinstance(batch, dict):
            raw = pmesh.shard_batch(self.mesh, batch["raw"])
            idx = pmesh.shard_batch(self.mesh, batch["frame_idx"])
            real = self._fused_preproc()(raw, idx)
            labels = batch.get("labels")
        else:
            real = pmesh.shard_batch(self.mesh, batch)
        lab = (pmesh.shard_batch(self.mesh, labels)
               if labels is not None and self.cfg.model.conditional else None)
        return real, lab

    def eval_fvd(self, real_pool: np.ndarray) -> float:
        """FVD between freshly generated clips and a pool of real clips
        (fixed-seed random-projection extractor — relative tracking metric;
        see eval/fvd.py for why absolute I3D-FVD is unavailable offline)."""
        from mocogan_tpu.eval import fvd as fvd_mod

        n = min(self.cfg.train.eval_clips, len(real_pool))
        vids = generator.generate_fast(
            self.state.params["gen"], self.state.bn["gen"], self._eval_key,
            n, self.cfg.model)
        if self._fvd_extractor is None:
            self._fvd_extractor = fvd_mod.RandomProjectionFeatures()
        return fvd_mod.fvd(np.asarray(jax.device_get(vids)), real_pool[:n],
                           extractor=self._fvd_extractor)

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

        from mocogan_tpu.data.pipeline import ThreadedPrefetcher

        data_iterator = ThreadedPrefetcher(data_iterator,
                                           depth=cfg.data.prefetch)

        def put_next():
            nxt = next(data_iterator)
            return self._put(*nxt) if isinstance(nxt, tuple) \
                else self._put(nxt)

        real, lab = put_next()
        for step in range(start, total):
            state, metrics = self.step_fn(self.state, real, lab)
            self.state = state
            # prefetch next batch while the step runs asynchronously
            if step + 1 < total:
                real, lab = put_next()
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
            if cfg.train.eval_every and (step + 1) % cfg.train.eval_every == 0:
                score = self.eval_fvd(np.asarray(jax.device_get(real)))
                self.logger.log(step + 1, {"fvd_proxy": score})
                print(f"[step {step + 1}] fvd_proxy={score:.2f}")
            if (step + 1) % cfg.train.checkpoint_every == 0:
                self.ckpt.save(self.state)

        data_iterator.close()
        self.ckpt.save(self.state, wait=True)
        self.save_samples(total)
        self.logger.plot()
        return last


def make_data_iterator(cfg: ExperimentConfig, start_batch: int = 0
                       ) -> Iterator[Tuple[np.ndarray, Any]]:
    """Build the host-side batch stream for cfg.data.dataset. Pass the
    restored step as start_batch for an exactly-resumed data stream."""
    m, d, t = cfg.model, cfg.data, cfg.train
    if d.dataset == "synthetic":
        from mocogan_tpu.data import synthetic
        return synthetic.batch_iterator(
            t.seed, t.batch_size, t=m.video_length, size=m.image_size,
            channels=m.channels, n_classes=m.n_classes,
            start_batch=start_batch)
    from mocogan_tpu.data import clips
    return clips.clip_batch_iterator(cfg, start_batch=start_batch)
