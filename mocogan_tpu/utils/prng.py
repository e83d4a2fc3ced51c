"""PRNG discipline.

The reference relies on numpy/cupy global RNG state (Chainer-era style).
TPU-native replacement: a single root ``jax.random.key`` with *named*,
explicit splits so that

  * ``generate()`` is bit-for-bit reproducible at fp32 from (key, params)
    — the BASELINE.json fidelity contract, and
  * the pmapped/sharded train step consumes exactly the same per-example
    randomness as the single-device step (SURVEY.md §4 "pmapped == single
    device" test), because every random draw is keyed by (root, step, role)
    rather than by device-local state.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax

# Fixed role ids: fold_in by a stable integer per role keeps key derivation
# independent of call order, unlike sequential jax.random.split chains.
_ROLES = (
    "content",        # z_C draw
    "motion_init",    # GRU initial hidden state
    "motion_noise",   # per-step GRU input noise e_t
    "frame_sample",   # S_1 random frame index
    "label",          # categorical class draw (config 4)
    "data",           # synthetic dataset generation
    "init",           # parameter initialization
    "epoch",          # per-epoch clip permutation (epoch_shuffle mode)
)
# Role ids live at 2^30 + i so they can NEVER collide with step counters
# (step_key folds the raw step number, bounded far below 2^30): with ids
# 0..7, fold_in(root, 6) would simultaneously be the "init" key and step
# 6's step key, coupling parameter init with step-6 randomness.
_ROLE_OFFSET = 1 << 30
_ROLE_ID = {name: _ROLE_OFFSET + i for i, name in enumerate(_ROLES)}


def step_key(root: jax.Array, step) -> jax.Array:
    """Key for one training step: fold the step counter into the root key."""
    return jax.random.fold_in(root, step)


def role_key(key: jax.Array, role: str) -> jax.Array:
    """Derive the key for a named role from a (root or step) key."""
    return jax.random.fold_in(key, _ROLE_ID[role])


def role_keys(key: jax.Array, roles: Sequence[str]) -> Dict[str, jax.Array]:
    return {r: role_key(key, r) for r in roles}
