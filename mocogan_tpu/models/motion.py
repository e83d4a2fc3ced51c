"""Motion-latent sampler R_M (reference R1: one-layer GRU rolled T steps).

The reference rolls ``chainer.links.GRU`` in a Python loop over T=16 frames
(SURVEY.md §3.2 fake path). TPU-native design: a GRU cell with the input
projection fused into one (d_in, 3*d_h) matmul and the r/u hidden
projections into one (d_h, 2*d_h) matmul, scanned with ``jax.lax.scan`` —
the loop is compiled once, unrolled/tiled by XLA, and all per-step noise is
drawn up front as one (T, B, d_e) tensor so the scan body is pure compute.

GRU equations (Chainer L.GRU convention — reset gate BEFORE the candidate
matmul, which is what L.GRU's six Linear links compute and what the
checkpoint importer maps onto):
    r_t = sigmoid(W_r e_t + U_r h_{t-1})
    u_t = sigmoid(W_u e_t + U_u h_{t-1})
    c_t = tanh   (W_c e_t + U_c (r_t * h_{t-1}))
    h_t = (1 - u_t) * h_{t-1} + u_t * c_t
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from mocogan_tpu.configs import ModelConfig
from mocogan_tpu.utils import prng

Params = Dict[str, jax.Array]


def gru_init(key: jax.Array, d_in: int, d_h: int) -> Params:
    k1, k2 = jax.random.split(key)
    scale_w = 1.0 / jnp.sqrt(jnp.float32(d_in))
    scale_u = 1.0 / jnp.sqrt(jnp.float32(d_h))
    return {
        "w": jax.random.normal(k1, (d_in, 3 * d_h), jnp.float32) * scale_w,
        "u": jax.random.normal(k2, (d_h, 3 * d_h), jnp.float32) * scale_u,
        "b": jnp.zeros((3 * d_h,), jnp.float32),
    }


def gru_cell(p: Params, h: jax.Array, e: jax.Array) -> jax.Array:
    """One GRU step. h: (B, d_h), e: (B, d_in) -> (B, d_h).

    Chainer L.GRU convention: the reset gate scales the HIDDEN STATE before
    the candidate matmul — c = tanh(W_c e + U_c (r*h)) — NOT the CuDNN
    variant r*(U_c h). The distinction matters for checkpoint parity with
    the reference (eval/import_chainer.py maps L.GRU's six Linear links
    onto these fused blocks); the r/u gate matmuls stay fused into one
    (d_h, 3*d_h) contraction, the candidate costs one extra small matmul.
    """
    d_h = h.shape[-1]
    gx = jnp.dot(e, p["w"], preferred_element_type=jnp.float32) + p["b"]
    rx, ux, cx = jnp.split(gx, 3, axis=-1)
    gh = jnp.dot(h, p["u"][:, :2 * d_h],
                 preferred_element_type=jnp.float32)
    rh, uh = jnp.split(gh, 2, axis=-1)
    r = jax.nn.sigmoid(rx + rh)
    u = jax.nn.sigmoid(ux + uh)
    ch = jnp.dot(r * h, p["u"][:, 2 * d_h:],
                 preferred_element_type=jnp.float32)
    c = jnp.tanh(cx + ch)
    return (1.0 - u) * h + u * c


def init(key: jax.Array, cfg: ModelConfig) -> Params:
    return gru_init(key, cfg.dim_eps, cfg.dim_motion)


def sample_motion(params: Params, key: jax.Array, batch: int,
                  cfg: ModelConfig, *, video_length: int | None = None
                  ) -> jax.Array:
    """Roll the GRU to produce motion codes z_M(1..T).

    Returns (B, T, d_motion). The initial hidden state is sampled from
    N(0, I) (MoCoGAN's stochastic initial motion state); per-step inputs
    e_t are i.i.d. N(0, I).
    """
    t = video_length or cfg.video_length
    h0 = jax.random.normal(prng.role_key(key, "motion_init"),
                           (batch, cfg.dim_motion), jnp.float32)
    eps = jax.random.normal(prng.role_key(key, "motion_noise"),
                            (t, batch, cfg.dim_eps), jnp.float32)

    def step(h, e):
        h = gru_cell(params, h, e)
        return h, h

    _, hs = jax.lax.scan(step, h0, eps)
    return jnp.transpose(hs, (1, 0, 2))  # (B, T, d_motion)
