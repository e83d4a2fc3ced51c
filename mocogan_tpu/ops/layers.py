"""Functional NN layers as pure (init, apply) pairs over plain pytrees.

The reference builds networks from ``chainer.links`` (Deconvolution2D,
ConvolutionND, BatchNormalization, Linear, GRU — SURVEY.md §2a R1-R4).
The TPU-native equivalents here are thin, explicitly-laid-out wrappers over
``jax.lax`` convolution primitives:

  * NHWC / NDHWC layouts (TPU-preferred; channels in the lane dimension),
  * weights fp32, compute optionally bfloat16 (MXU native),
  * BatchNorm as a pure function threading running-stat state, so the whole
    train step stays jittable with no hidden mutation.

Initializers follow the DCGAN convention the reference's Chains use:
truncated-free normal(stddev=0.02) for conv/deconv/dense weights.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]
State = Dict[str, Any]

_W_STD = 0.02


def _cast(x: jax.Array, dtype) -> jax.Array:
    return x.astype(dtype) if x.dtype != dtype else x


def _acc_type(dtype):
    """f32 accumulation request is only safe when operands are f32: with
    bf16 operands + preferred_element_type=f32, the conv VJP produces
    mixed-dtype cotangent/operand pairs that lax rejects. For bf16 the MXU
    accumulates in f32 internally regardless."""
    return jnp.float32 if jnp.dtype(dtype) == jnp.float32 else None


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------

def dense_init(key: jax.Array, din: int, dout: int, *,
               bias: bool = True) -> Params:
    w = jax.random.normal(key, (din, dout), jnp.float32) * _W_STD
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((dout,), jnp.float32)
    return p


def dense(p: Params, x: jax.Array, *, dtype=jnp.float32) -> jax.Array:
    y = jnp.dot(_cast(x, dtype), _cast(p["w"], dtype),
                preferred_element_type=_acc_type(dtype))
    return y + p["b"] if "b" in p else y


# ---------------------------------------------------------------------------
# 2D convolution (NHWC, HWIO)
# ---------------------------------------------------------------------------

def conv2d_init(key: jax.Array, k: int, cin: int, cout: int, *,
                bias: bool = True) -> Params:
    w = jax.random.normal(key, (k, k, cin, cout), jnp.float32) * _W_STD
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def conv2d(p: Params, x: jax.Array, *, stride: int = 2, padding="SAME",
           dtype=jnp.float32) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        _cast(x, dtype), _cast(p["w"], dtype),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=_acc_type(dtype),
    )
    return y + p["b"] if "b" in p else y


# ---------------------------------------------------------------------------
# 2D transposed convolution (the reference's L.Deconvolution2D)
# ---------------------------------------------------------------------------

def deconv2d_init(key: jax.Array, k: int, cin: int, cout: int, *,
                bias: bool = True) -> Params:
    # HWIO with I=cin (the *input* of the transposed conv), matching
    # jax.lax.conv_transpose's expectation for dimension_numbers below.
    w = jax.random.normal(key, (k, k, cin, cout), jnp.float32) * _W_STD
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def deconv2d(p: Params, x: jax.Array, *, stride: int = 2, padding="SAME",
             dtype=jnp.float32) -> jax.Array:
    y = jax.lax.conv_transpose(
        _cast(x, dtype), _cast(p["w"], dtype),
        strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=_acc_type(dtype),
    )
    return y + p["b"] if "b" in p else y


# ---------------------------------------------------------------------------
# 3D convolution (NDHWC, DHWIO) — the reference's L.ConvolutionND(ndim=3)
# ---------------------------------------------------------------------------

def conv3d_init(key: jax.Array, k: Tuple[int, int, int], cin: int,
                cout: int, *, bias: bool = True) -> Params:
    w = jax.random.normal(key, (*k, cin, cout), jnp.float32) * _W_STD
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def conv3d(p: Params, x: jax.Array, *, stride: Tuple[int, int, int],
           padding="SAME", dtype=jnp.float32) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        _cast(x, dtype), _cast(p["w"], dtype),
        window_strides=stride, padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=_acc_type(dtype),
    )
    return y + p["b"] if "b" in p else y


# ---------------------------------------------------------------------------
# BatchNorm (the reference's L.BatchNormalization)
#
# Reference semantics are single-device BN with running averages; under data
# parallelism we keep per-device batch statistics (the faithful choice —
# SURVEY.md §7 "hard parts" #3) unless `axis_name` is given, in which case
# batch stats are pmean'd across the mesh.
# ---------------------------------------------------------------------------

def batchnorm_init(c: int) -> Tuple[Params, State]:
    params = {"scale": jnp.ones((c,), jnp.float32),
              "bias": jnp.zeros((c,), jnp.float32)}
    state = {"mean": jnp.zeros((c,), jnp.float32),
             "var": jnp.ones((c,), jnp.float32)}
    return params, state


def batchnorm(p: Params, s: State, x: jax.Array, *, train: bool,
              momentum: float = 0.9, eps: float = 2e-5,
              axis_name: str | None = None) -> Tuple[jax.Array, State]:
    """Normalize over all axes but the last (channel).

    Statistics are always fp32 (cast fused into the reductions). The
    normalization itself is expressed as a per-channel affine
    ``y = x * c1 + c2`` applied in the INPUT dtype, so under bfloat16
    compute the autodiff residual is the bf16 ``x`` rather than an fp32
    upcast copy — the big tensors never round-trip HBM at 4 bytes.
    """
    red = tuple(range(x.ndim - 1))
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=red)
        var = jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean)
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            var = jax.lax.pmean(var, axis_name)
        new_s = {
            "mean": momentum * s["mean"] + (1.0 - momentum) * mean,
            "var": momentum * s["var"] + (1.0 - momentum) * var,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = jax.lax.rsqrt(var + eps) * p["scale"]          # (C,) fp32
    shift = p["bias"] - mean * inv                        # (C,) fp32
    if x.dtype == jnp.float32:
        y = x * inv + shift
    else:
        y = x * inv.astype(x.dtype) + shift.astype(x.dtype)
    return y, new_s


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def leaky_relu(x: jax.Array, slope: float = 0.2) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=slope)


def out_size_up(size: int, n_layers: int) -> int:
    """Spatial seed size for a stack of n stride-2 upsampling layers."""
    s, r = divmod(size, 2 ** n_layers)
    if r:
        raise ValueError(f"image_size {size} not divisible by 2^{n_layers}")
    return s
