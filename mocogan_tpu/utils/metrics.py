"""Structured metrics logging — the TPU-native replacement for the
reference's Chainer Trainer extensions (LogReport -> JSON log, PlotReport ->
loss-curve PNGs, ProgressBar; SURVEY.md §5 'Metrics / logging').

Design constraint from this machine (documented in .claude/skills/verify):
device->host scalar reads are pathologically slow on the axon TPU tunnel,
so the logger only accepts already-fetched (host) metric dicts — the trainer
batches `jax.device_get` at log cadence, never per step.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional


class MetricLogger:
    def __init__(self, out_dir: str, filename: str = "log.jsonl"):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, filename)
        self._history: List[Dict] = []
        self._t0 = time.time()
        # Reload prior records on resume so plot() spans the WHOLE run —
        # the reference's PlotReport plotted from step 0 after a restart
        # too (VERDICT r4 weak #5). Corrupt tail lines (a crash mid-write)
        # are skipped, not fatal. The `time` axis stays monotonic across
        # restarts by offsetting t0 by the last recorded elapsed time.
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        self._history.append(json.loads(line))
                    except ValueError:
                        continue
            if self._history:
                self._t0 -= float(self._history[-1].get("time", 0.0))

    def log(self, step: int, metrics: Dict[str, float], **extra) -> Dict:
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        rec.update(extra)
        self._history.append(rec)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec

    @property
    def history(self) -> List[Dict]:
        return list(self._history)

    def plot(self, filename: str = "loss_curves.png",
             keys: Optional[List[str]] = None) -> Optional[str]:
        """Loss-curve PNG (the reference's PlotReport equivalent)."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return None
        if not self._history:
            return None
        keys = keys or sorted({
            k for h in self._history for k in h
            if k.startswith(("loss", "fvd"))
            and isinstance(h[k], (int, float))})
        fig, ax = plt.subplots(figsize=(8, 5))
        steps = [h["step"] for h in self._history]
        for k in keys:
            ax.plot(steps, [h.get(k, float("nan")) for h in self._history],
                    label=k)
        ax.set_xlabel("step")
        ax.set_ylabel("loss")
        ax.legend()
        ax.grid(True, alpha=0.3)
        path = os.path.join(self.out_dir, filename)
        fig.savefig(path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        return path
