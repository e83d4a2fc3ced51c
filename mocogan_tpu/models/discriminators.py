"""Image discriminator D_I (reference R3) and video discriminator D_V
(reference R4, with the categorical head of R10).

Reference design (SURVEY.md §2a): DCGAN-style stacks —
  D_I: 4x Conv2D(4x4, stride 2) + Norm + LeakyReLU on single 64x64 frames
       -> scalar logit; first layer un-normalized (DCGAN convention).
  D_V: 4x Conv3D(4x4x4) on (T,H,W) clips, temporal stride 1 on the first
       layer then 2 -> scalar logit (+ class logits in the conditional
       variant, InfoGAN-style).

TPU-native notes: NHWC/NDHWC layouts; Conv3D lowers natively onto the TPU
MXU via XLA (no custom kernel needed — SURVEY.md §7 Stage 1); the final
"flatten -> dense" head keeps the logit path a single large contraction.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mocogan_tpu.configs import ModelConfig
from mocogan_tpu.ops import layers

Params = Dict[str, Any]
State = Dict[str, Any]

_N_DOWN = 4


def _disc_widths(ndf: int):
    return [ndf, ndf * 2, ndf * 4, ndf * 8]


# ---------------------------------------------------------------------------
# D_I — image discriminator
# ---------------------------------------------------------------------------

def image_init(key: jax.Array, cfg: ModelConfig) -> Tuple[Params, State]:
    widths = _disc_widths(cfg.disc_features)
    s_out = cfg.image_size // (2 ** _N_DOWN)
    keys = jax.random.split(key, _N_DOWN + 1)
    params: Params = {}
    state: State = {}
    cin = cfg.channels
    for i, cout in enumerate(widths):
        # bias only on the un-normalized first layer (BN kills bias grads)
        params[f"conv{i}"] = layers.conv2d_init(keys[i], 4, cin, cout,
                                                bias=(i == 0))
        if i > 0:  # DCGAN: no norm on the first layer
            params[f"bn{i}"], state[f"bn{i}"] = layers.batchnorm_init(cout)
        cin = cout
    params["fc"] = layers.dense_init(keys[-1], s_out * s_out * widths[-1], 1)
    return params, state


def image_apply(params: Params, state: State, x: jax.Array, cfg: ModelConfig,
                *, train: bool, axis_name: Optional[str] = None
                ) -> Tuple[jax.Array, State]:
    """x: (N, H, W, C) frames -> logits (N, 1)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    new_state: State = {}
    h = x
    for i in range(_N_DOWN):
        h = layers.conv2d(params[f"conv{i}"], h, stride=2, dtype=dtype)
        if i > 0:
            h, new_state[f"bn{i}"] = layers.batchnorm(
                params[f"bn{i}"], state[f"bn{i}"], h, train=train,
                axis_name=axis_name)
        h = layers.leaky_relu(h)
    h = h.reshape(h.shape[0], -1)
    return layers.dense(params["fc"], h, dtype=dtype), new_state


# ---------------------------------------------------------------------------
# D_V — video discriminator (+ conditional class head)
# ---------------------------------------------------------------------------

def video_init(key: jax.Array, cfg: ModelConfig) -> Tuple[Params, State]:
    widths = _disc_widths(cfg.disc_features)
    keys = jax.random.split(key, _N_DOWN + 2)
    params: Params = {}
    state: State = {}
    cin = cfg.channels
    for i, cout in enumerate(widths):
        params[f"conv{i}"] = layers.conv3d_init(keys[i], (4, 4, 4), cin, cout,
                                                bias=(i == 0))
        if i > 0:
            params[f"bn{i}"], state[f"bn{i}"] = layers.batchnorm_init(cout)
        cin = cout
    flat = _video_flat_dim(cfg)
    params["fc"] = layers.dense_init(keys[-2], flat, 1)
    if cfg.conditional:
        params["fc_cls"] = layers.dense_init(keys[-1], flat, cfg.n_classes)
    return params, state


def _video_strides(i: int) -> Tuple[int, int, int]:
    # First layer keeps temporal resolution (stride (1,2,2)), later layers
    # halve it — the reference's ConvolutionND stride pattern (SURVEY R4).
    return (1, 2, 2) if i == 0 else (2, 2, 2)


def _video_flat_dim(cfg: ModelConfig) -> int:
    t, s = cfg.video_length, cfg.image_size
    for i in range(_N_DOWN):
        st = _video_strides(i)
        t = -(-t // st[0])
        s = -(-s // st[1])
    return t * s * s * _disc_widths(cfg.disc_features)[-1]


def video_apply(params: Params, state: State, x: jax.Array, cfg: ModelConfig,
                *, train: bool, axis_name: Optional[str] = None
                ) -> Tuple[jax.Array, Optional[jax.Array], State]:
    """x: (B, T, H, W, C) clips -> (logits (B,1), class_logits or None)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    new_state: State = {}
    h = x
    for i in range(_N_DOWN):
        h = layers.conv3d(params[f"conv{i}"], h, stride=_video_strides(i),
                          dtype=dtype)
        if i > 0:
            h, new_state[f"bn{i}"] = layers.batchnorm(
                params[f"bn{i}"], state[f"bn{i}"], h, train=train,
                axis_name=axis_name)
        h = layers.leaky_relu(h)
    h = h.reshape(h.shape[0], -1)
    logits = layers.dense(params["fc"], h, dtype=dtype)
    cls = (layers.dense(params["fc_cls"], h, dtype=dtype)
           if cfg.conditional else None)
    return logits, cls, new_state
