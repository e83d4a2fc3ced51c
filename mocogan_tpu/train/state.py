"""Training state — the TPU-native replacement for the reference's trio of
``chainer.optimizers.Adam`` objects plus per-Link persistent state
(SURVEY.md §3.1: three Adam(2e-4, beta1=0.5) optimizers + snapshot'd Trainer
state).

Everything lives in one pytree dataclass so the whole step is a pure
function (state, batch, ...) -> state and Orbax can checkpoint/restore it
atomically (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from mocogan_tpu.configs import ExperimentConfig
from mocogan_tpu.models import discriminators, generator
from mocogan_tpu.utils import prng


def make_optimizer(cfg: ExperimentConfig,
                   net: str = "gen") -> optax.GradientTransformation:
    """Adam(alpha=2e-4, beta1=0.5, beta2=0.999) — the reference's settings
    for all three networks (MoCoGAN paper Sec. 4). Optional TTUR-style
    per-side learning-rate overrides (d_/g_learning_rate) are balance
    levers with no reference counterpart; None keeps the shared rate."""
    t = cfg.train
    lr = t.learning_rate
    if net == "gen":
        lr = t.g_learning_rate if t.g_learning_rate is not None else lr
    else:
        lr = t.d_learning_rate if t.d_learning_rate is not None else lr
    tx = optax.adam(lr, b1=t.beta1, b2=t.beta2)
    if t.fused_adam:
        # One contiguous moment/update vector per net: collapses the
        # per-leaf Adam kernels (the largest kernel-count contributor in
        # the bubble-bound bf16 step) into a handful of large ones.
        # Elementwise math -> numerically identical update.
        tx = optax.flatten(tx)
    return tx


@flax.struct.dataclass
class TrainState:
    step: jax.Array                      # int32 scalar
    root_key: jax.Array                  # PRNG root; never advanced in place
    params: Dict[str, Any]               # {"gen", "di", ["dv"]}
    bn: Dict[str, Any]                   # running BatchNorm stats per net
    opt: Dict[str, Any]                  # optax states per net


import functools


@functools.lru_cache(maxsize=None)
def _jitted_create(cfg: ExperimentConfig, seed: int):
    def build() -> TrainState:
        root = jax.random.key(seed)
        init_key = prng.role_key(root, "init")
        kg, ki, kv = jax.random.split(init_key, 3)

        m = cfg.model
        params: Dict[str, Any] = {}
        bn: Dict[str, Any] = {}
        params["gen"], bn["gen"] = generator.init(kg, m)
        params["di"], bn["di"] = discriminators.image_init(ki, m)
        if m.use_video_discriminator:
            params["dv"], bn["dv"] = discriminators.video_init(kv, m)

        opt = {name: make_optimizer(cfg, name).init(p)
               for name, p in params.items()}
        return TrainState(step=jnp.zeros((), jnp.int32), root_key=root,
                          params=params, bn=bn, opt=opt)

    return jax.jit(build)


def create(cfg: ExperimentConfig, seed: Optional[int] = None) -> TrainState:
    """Initialize all nets + optimizers as ONE jitted program — individual
    init dispatches are slow over the remote-TPU tunnel (~1s each, ~40 of
    them); fused init takes ~1 compile + milliseconds."""
    seed = cfg.train.seed if seed is None else seed
    return _jitted_create(cfg, int(seed))()


def param_count(state: TrainState) -> Dict[str, int]:
    return {
        name: sum(x.size for x in jax.tree.leaves(p))
        for name, p in state.params.items()
    }
