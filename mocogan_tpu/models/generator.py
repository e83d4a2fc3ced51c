"""Image generator G_I (reference R2) + the public video-sampling API (R9).

Reference design: per-frame decoder — concat [z_C, z_M(t)] -> linear ->
reshape -> stack of Deconvolution2D(4x4, stride 2) + BatchNorm + ReLU ->
tanh, applied to each of the T frames with shared weights (SURVEY.md §2a R2).

TPU-native design: instead of looping/vmapping over time, all B*T frames are
decoded as ONE batched deconvolution stack — the time axis is folded into
the batch axis so every transposed conv is a single large MXU-friendly
contraction. BatchNorm then normalizes over (B*T, H, W), which matches the
reference exactly: Chainer's BN inside the per-frame generator sees the
frame-batch too.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mocogan_tpu.configs import ModelConfig
from mocogan_tpu.models import motion
from mocogan_tpu.ops import layers
from mocogan_tpu.utils import prng

Params = Dict[str, Any]
State = Dict[str, Any]

_N_UP = 4  # stride-2 upsampling stages: seed -> x16 spatial


def init(key: jax.Array, cfg: ModelConfig) -> Tuple[Params, State]:
    """Initialize G_I + the GRU motion sampler R_M as one parameter tree."""
    ngf = cfg.gen_features
    s0 = layers.out_size_up(cfg.image_size, _N_UP)
    widths = [ngf * 8, ngf * 4, ngf * 2, ngf]

    keys = jax.random.split(key, _N_UP + 3)
    params: Params = {
        "gru": motion.init(keys[0], cfg),
        # bias=False wherever BatchNorm follows: BN subtracts the mean, so
        # such biases have exactly-zero gradient (dead params).
        "fc": layers.dense_init(keys[1], cfg.dim_z, s0 * s0 * widths[0],
                                bias=False),
    }
    state: State = {}
    params["bn_fc"], state["bn_fc"] = layers.batchnorm_init(widths[0])

    cin = widths[0]
    for i in range(_N_UP):
        last = i + 1 == _N_UP
        cout = cfg.channels if last else widths[i + 1]
        params[f"deconv{i}"] = layers.deconv2d_init(keys[2 + i], 4, cin, cout,
                                                    bias=last)
        if not last:  # no BN before the tanh output layer
            params[f"bn{i}"], state[f"bn{i}"] = layers.batchnorm_init(cout)
        cin = cout
    return params, state


def decode_frames(params: Params, state: State, z: jax.Array, cfg: ModelConfig,
                  *, train: bool, axis_name: Optional[str] = None
                  ) -> Tuple[jax.Array, State]:
    """Decode per-frame latents z (N, dim_z) -> frames (N, H, W, C) in [-1,1]."""
    dtype = jnp.dtype(cfg.compute_dtype)
    ngf = cfg.gen_features
    s0 = layers.out_size_up(cfg.image_size, _N_UP)
    new_state: State = {}

    h = layers.dense(params["fc"], z, dtype=dtype)
    h = h.reshape(z.shape[0], s0, s0, ngf * 8)
    h, new_state["bn_fc"] = layers.batchnorm(
        params["bn_fc"], state["bn_fc"], h, train=train, axis_name=axis_name)
    h = jax.nn.relu(h)

    for i in range(_N_UP):
        h = layers.deconv2d(params[f"deconv{i}"], h, stride=2, dtype=dtype)
        if i + 1 < _N_UP:
            h, new_state[f"bn{i}"] = layers.batchnorm(
                params[f"bn{i}"], state[f"bn{i}"], h, train=train,
                axis_name=axis_name)
            h = jax.nn.relu(h)
    out = jnp.tanh(h.astype(jnp.float32))
    if train:
        # Training consumes the frames in compute dtype anyway (both Ds cast
        # their inputs); materializing the B*T-frame tensor — and its
        # autodiff cotangent — at 2 bytes instead of 4 removes the largest
        # fp32 HBM buffers from the bf16 step. Inference keeps fp32 output
        # (the bit-for-bit generate() contract).
        out = out.astype(dtype)
    return out, new_state


def sample_videos(params: Params, state: State, key: jax.Array, batch: int,
                  cfg: ModelConfig, *, train: bool,
                  labels: Optional[jax.Array] = None,
                  video_length: Optional[int] = None,
                  axis_name: Optional[str] = None
                  ) -> Tuple[jax.Array, State, Optional[jax.Array]]:
    """The MoCoGAN fake path (SURVEY.md §3.2):

      z_C ~ N(0,I) fixed per clip; z_M(1..T) from the GRU roll;
      every frame decoded from concat([z_C, (one-hot class,) z_M(t)]).

    Returns (videos (B,T,H,W,C) in [-1,1], new BN state, labels or None).
    """
    t = video_length or cfg.video_length
    z_c = jax.random.normal(prng.role_key(key, "content"),
                            (batch, cfg.dim_content), jnp.float32)
    z_m = motion.sample_motion(params["gru"], key, batch, cfg,
                               video_length=t)              # (B,T,dM)
    parts = [jnp.broadcast_to(z_c[:, None, :], (batch, t, cfg.dim_content))]
    if cfg.conditional:
        if labels is None:
            labels = jax.random.randint(prng.role_key(key, "label"),
                                        (batch,), 0, cfg.n_classes)
        onehot = jax.nn.one_hot(labels, cfg.n_classes, dtype=jnp.float32)
        parts.append(jnp.broadcast_to(onehot[:, None, :],
                                      (batch, t, cfg.n_classes)))
    parts.append(z_m)
    z = jnp.concatenate(parts, axis=-1).reshape(batch * t, cfg.dim_z)

    decode = decode_frames
    if cfg.remat and train:
        # Recompute the decoder activations in the backward pass instead of
        # holding B*T frames of intermediates in HBM (config 5 headroom).
        def decode(p, s, zz, cfg, *, train, axis_name=None):  # noqa: ANN001
            return jax.checkpoint(
                lambda p_, s_, z_: decode_frames(p_, s_, z_, cfg,
                                                 train=train,
                                                 axis_name=axis_name)
            )(p, s, zz)

    frames, new_state = decode(params, state, z, cfg, train=train,
                               axis_name=axis_name)
    videos = frames.reshape(batch, t, cfg.image_size, cfg.image_size,
                            cfg.channels)
    return videos, new_state, labels


def generate(params: Params, state: State, key: jax.Array, n: int,
             cfg: ModelConfig, *, labels: Optional[jax.Array] = None,
             video_length: Optional[int] = None) -> jax.Array:
    """Public inference API matching the reference's ``generate()`` (R9).

    Deterministic given (params, state, key): BN uses running statistics
    (eval mode) and every random draw derives from ``key`` via named folds,
    so the output is bit-for-bit reproducible at fp32 across runs
    (BASELINE.json fidelity contract). Returns (N, T, H, W, C) in [-1, 1].
    """
    videos, _, _ = sample_videos(params, state, key, n, cfg, train=False,
                                 labels=labels, video_length=video_length)
    return videos


import functools


@functools.lru_cache(maxsize=32)
def _generate_jit(cfg: ModelConfig, n: int, video_length: Optional[int]):
    def run(params, state, key, labels):
        return generate(params, state, key, n, cfg, labels=labels,
                        video_length=video_length)

    return jax.jit(run)


def generate_fast(params: Params, state: State, key: jax.Array, n: int,
                  cfg: ModelConfig, *, labels: Optional[jax.Array] = None,
                  video_length: Optional[int] = None) -> jax.Array:
    """jit-cached ``generate``. Numerically identical (same fp32 program);
    use it on remote-tunnel TPU backends where eager dispatch pays a
    multi-second round trip per primitive."""
    return _generate_jit(cfg, n, video_length)(params, state, key, labels)


def generate_chunked_device(params: Params, state: State, key: jax.Array,
                            n: int, cfg: ModelConfig, *, chunk: int = 64
                            ) -> jax.Array:
    """``generate_fast`` in bounded chunks, result left ON DEVICE as one
    (N, T, H, W, C) float32 array. Chunk i uses ``fold_in(key, i)``; at
    most two programs compile (the chunk size and a remainder). Bounds
    GENERATION activations to one chunk, but keeps all N result clips
    resident (size N to HBM: 256 flagship clips ~ 200 MB, 256 scaled ~
    1 GB; use generate_chunked for larger N on the host). Avoids any
    device->host transfer — the trainer's eval panel consumes the clips
    on device (feature extractor, D_V margin, SSIM), so fetching them to
    the host first cost ~200 MB of tunnel traffic per eval (measured
    35-120 s stalls every eval in the round-4 balance sweep)."""
    if n <= 0:
        raise ValueError(f"generate_chunked needs n >= 1, got {n}")
    out = []
    done = i = 0
    while done < n:
        m = min(chunk, n - done)
        out.append(generate_fast(params, state,
                                 jax.random.fold_in(key, i), m, cfg))
        done += m
        i += 1
    return out[0] if len(out) == 1 else jnp.concatenate(out)


def generate_chunked(params: Params, state: State, key: jax.Array, n: int,
                     cfg: ModelConfig, *, chunk: int = 64):
    """``generate_fast`` in bounded chunks -> one host (N, T, H, W, C)
    float32 array, fetching each chunk as it completes so peak HBM stays
    ~one chunk (1024 clips at the scaled geometry would be ~8 GB if
    accumulated on device) — for the CLIs and callers that need numpy.
    Same chunk/key schedule as ``generate_chunked_device``, so the two
    paths produce identical clips."""
    import numpy as np

    if n <= 0:
        raise ValueError(f"generate_chunked needs n >= 1, got {n}")
    out = []
    done = i = 0
    while done < n:
        m = min(chunk, n - done)
        out.append(np.asarray(jax.device_get(generate_fast(
            params, state, jax.random.fold_in(key, i), m, cfg))))
        done += m
        i += 1
    return np.concatenate(out)


def to_uint8(videos: jax.Array) -> jax.Array:
    """Denormalize [-1,1] -> uint8, matching the reference's (x+1)/2*255."""
    x = jnp.clip((videos + 1.0) * 0.5 * 255.0, 0, 255)
    return jnp.round(x).astype(jnp.uint8)
