"""Checkpoint / resume via Orbax — the TPU-native replacement for the
reference's ``chainer.training.extensions.snapshot`` +
``serializers.save_npz/load_npz`` + ``--resume`` (SURVEY.md §5).

Saved per step: all params, all three optimizer states, BatchNorm running
stats, the PRNG root key, and the step counter — everything needed for
exact resume (the reference snapshots the same Trainer state).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from typing import TYPE_CHECKING

import jax
import numpy as np
import orbax.checkpoint as ocp

from mocogan_tpu.ops.sampling import DATA_STREAM_VERSION

if TYPE_CHECKING:  # break the utils <-> train import cycle
    from mocogan_tpu.train.state import TrainState


def _to_saveable(state: "TrainState") -> dict:
    """Typed PRNG keys aren't serializable; store raw key data."""
    return {
        "step": state.step,
        "root_key_data": jax.random.key_data(state.root_key),
        "params": state.params,
        "bn": state.bn,
        "opt": state.opt,
    }


def _from_saveable(tree: dict) -> "TrainState":
    from mocogan_tpu.train.state import TrainState

    return TrainState(
        step=tree["step"],
        root_key=jax.random.wrap_key_data(tree["root_key_data"]),
        params=tree["params"],
        bn=tree["bn"],
        opt=tree["opt"],
    )


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 stream_meta: Optional[dict] = None):
        """stream_meta: extra facts that determine the (seed, step)->clip
        stream beyond the code version — e.g. data.epoch_shuffle, whose
        value changes batch_plan's mapping for the same seed. Recorded in
        the sidecar and compared on restore."""
        self.directory = os.path.abspath(directory)
        self.stream_meta = {"data_stream_version": DATA_STREAM_VERSION,
                            **(stream_meta or {})}
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, state: "TrainState", *, wait: bool = False) -> int:
        step = int(jax.device_get(state.step))
        self._mngr.save(step, args=ocp.args.StandardSave(_to_saveable(state)))
        # Sidecar (not in the Orbax tree, so old checkpoints still
        # restore): which clip-selection stream this run trained on.
        # Written once; restore() warns on mismatch (ADVICE r3 #1).
        sidecar = os.path.join(self.directory, "stream_version.json")
        if jax.process_index() == 0 and not os.path.exists(sidecar):
            with open(sidecar, "w") as f:
                json.dump(self.stream_meta, f)
        if wait:
            self._mngr.wait_until_finished()
        return step

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, template: "TrainState",
                step: Optional[int] = None) -> "TrainState":
        """Restore into the structure of `template` (freshly-created state)."""
        step = self._mngr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        sidecar = os.path.join(self.directory, "stream_version.json")
        saved_meta = None
        if os.path.exists(sidecar):
            try:
                saved_meta = json.load(open(sidecar))
            except ValueError:
                pass
        if saved_meta != self.stream_meta:
            # Pre-sidecar checkpoints (None) are round-3-or-earlier
            # saves; a differing dict is a stream-version bump OR a
            # stream-shaping config change (e.g. epoch_shuffle flipped —
            # the round-4 default change is exactly this hazard). Either
            # way the stream identity differs — say so instead of
            # implying bit-continuity.
            print(f"[checkpoint] WARNING: checkpoint was saved under "
                  f"data-stream identity {saved_meta} but this run uses "
                  f"{self.stream_meta}: resumed training continues on a "
                  f"DIFFERENT clip-window stream for the same seed "
                  f"(model/optimizer state restore exactly; only the "
                  f"data order diverges).")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                _to_saveable(template))
        tree = self._mngr.restore(step,
                                  args=ocp.args.StandardRestore(abstract))
        return _from_saveable(tree)

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()
