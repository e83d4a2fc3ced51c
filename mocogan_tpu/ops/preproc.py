"""Fused on-device video preprocessing (BASELINE B3 — new TPU-native scope).

The reference preprocesses offline on the host: decode -> resize -> subsample
-> save .npy, then loads float32 clips from disk (R7; SURVEY.md §3.4). That
leaves the accelerator idle on input work and moves 4-byte floats over the
host link. Here the ingest path keeps raw uint8 frames end-to-end on the
host/HBM side and fuses, on device:

    temporal subsample (gather) -> bilinear resize -> [-1,1] normalize

into one Pallas kernel launch per batch. Design notes:

  * Bilinear resize is expressed as two matrix products per image plane:
        out = R_h @ X @ R_w          (S,H)@(H,W)@(W,S)
    with precomputed sparse-ish bilinear weight matrices — this runs on the
    MXU instead of the VPU gather path, and XLA/Mosaic fuses the
    uint8->f32 convert and the affine normalize into the same kernel.
  * The (B,T,H,W,C) batch is viewed as N=B*T*C independent (H,W) planes;
    the kernel grid iterates planes and Pallas's block pipeline
    double-buffers HBM->VMEM plane loads against MXU compute (B3's
    "double-buffered HBM batches").
  * Half-pixel-center sampling (align_corners=False) matches cv2's
    INTER_LINEAR, which the reference's OpenCV preprocessing uses.

A pure-jnp twin (`resize_normalize_reference`) with identical weights serves
as the golden oracle (SURVEY.md §4 'Data pipeline' tests) and as the
fallback path on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bilinear_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) bilinear interpolation weights, half-pixel centers,
    edges clamped (cv2.INTER_LINEAR convention)."""
    m = np.zeros((dst, src), np.float32)
    scale = src / dst
    for i in range(dst):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        frac = x - x0
        lo = min(max(x0, 0), src - 1)
        hi = min(max(x0 + 1, 0), src - 1)
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _resize_norm_kernel(x_ref, rh_ref, rw_ref, o_ref, *, scale: float,
                        offset: float):
    """One (H, W) uint8 plane -> (S, S) f32 plane in [-1, 1].

    x_ref: (1, H, W) uint8   rh_ref: (S, H)   rw_ref: (W, S)   o_ref: (1, S, S)
    """
    # Mosaic has no direct uint8->f32 convert; chain through int32.
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)
    y = jnp.dot(rh_ref[:], x, preferred_element_type=jnp.float32)
    z = jnp.dot(y, rw_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = z * scale + offset


def _resize_normalize_planes_pallas(planes: jax.Array, rh: jax.Array,
                                    rw: jax.Array, out_size: int,
                                    interpret: bool = False) -> jax.Array:
    """planes: (N, H, W) uint8 -> (N, S, S) float32 in [-1, 1].

    interpret=True runs the SAME kernel through the Pallas interpreter
    (CPU-runnable), used by the §4 golden tests and dryrun_multichip so the
    production kernel body is exercised without TPU hardware.
    """
    n, h, w = planes.shape
    kernel = functools.partial(_resize_norm_kernel, scale=2.0 / 255.0,
                               offset=-1.0)
    flops = 2 * n * out_size * (h * w + w * out_size)
    # TPU memory spaces are meaningless to the interpreter backend
    vmem = {} if interpret else {"memory_space": pltpu.VMEM}
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), **vmem),
            pl.BlockSpec((out_size, h), lambda i: (0, 0), **vmem),
            pl.BlockSpec((w, out_size), lambda i: (0, 0), **vmem),
        ],
        out_specs=pl.BlockSpec((1, out_size, out_size), lambda i: (i, 0, 0),
                               **vmem),
        out_shape=jax.ShapeDtypeStruct((n, out_size, out_size), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n * (h * w + 4 * out_size * out_size),
            transcendentals=0),
        interpret=interpret,
    )(planes, rh, rw)


def _resize_normalize_planes_jnp(planes: jax.Array, rh: jax.Array,
                                 rw: jax.Array) -> jax.Array:
    x = planes.astype(jnp.float32)
    y = jnp.einsum("sh,nhw->nsw", rh, x)
    z = jnp.einsum("nsw,wt->nst", y, rw)
    return z * (2.0 / 255.0) - 1.0


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def resize_normalize(video_u8: jax.Array, out_size: int,
                     use_pallas=None) -> jax.Array:
    """(B, T, H, W, C) uint8 -> (B, T, S, S, C) float32 in [-1, 1].

    use_pallas: None (auto: kernel on TPU, jnp twin elsewhere), True, False,
    or "interpret" (run the kernel through the Pallas interpreter — CPU
    tests / dryrun).
    """
    b, t, h, w, c = video_u8.shape
    rh = jnp.asarray(bilinear_matrix(h, out_size))
    rw = jnp.asarray(bilinear_matrix(w, out_size)).T
    planes = jnp.transpose(video_u8, (0, 1, 4, 2, 3)).reshape(-1, h, w)
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas:
        out = _resize_normalize_planes_pallas(
            planes, rh, rw, out_size, interpret=use_pallas == "interpret")
    else:
        out = _resize_normalize_planes_jnp(planes, rh, rw)
    out = out.reshape(b, t, c, out_size, out_size)
    return jnp.transpose(out, (0, 1, 3, 4, 2))


def resize_normalize_sharded(video_u8: jax.Array, out_size: int,
                             mesh, axis_name=None,
                             use_pallas=None) -> jax.Array:
    """Batch-sharded fused preproc: runs the per-shard kernel under
    shard_map so the Pallas path works on multi-device meshes (GSPMD cannot
    auto-partition a pallas_call; manual sharding can — each device
    processes its own batch shard locally, no collectives needed).

    axis_name defaults to ALL mesh axes (pure-DP batch layout on both the
    1-D ``(data,)`` and multi-slice ``(dcn, data)`` meshes)."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older layout
        from jax.experimental.shard_map import shard_map

    def local_fn(v):
        return resize_normalize(v, out_size, use_pallas=use_pallas)

    if axis_name is None:
        axis_name = tuple(mesh.axis_names)
    spec = P(axis_name, *([None] * (video_u8.ndim - 1)))
    # check_vma=False: pallas_call outputs carry no varying-mesh-axes info
    return shard_map(local_fn, mesh=mesh, in_specs=(spec,),
                     out_specs=spec, check_vma=False)(video_u8)


def resize_normalize_reference(video_u8: np.ndarray,
                               out_size: int) -> np.ndarray:
    """Pure-numpy oracle with identical math (golden test target)."""
    b, t, h, w, c = video_u8.shape
    rh = bilinear_matrix(h, out_size)
    rw = bilinear_matrix(w, out_size)
    x = video_u8.astype(np.float32)
    y = np.einsum("sh,bthwc->btswc", rh, x)
    z = np.einsum("vw,btswc->btsvc", rw, y)
    return z * (2.0 / 255.0) - 1.0


def resize_normalize_auto(video_u8: jax.Array, out_size: int,
                          mesh=None, use_pallas=None) -> jax.Array:
    """Route to the shard_map-wrapped kernel on multi-device meshes (GSPMD
    cannot auto-partition a pallas_call) and to the plain call otherwise."""
    if use_pallas is None:
        # Resolve the auto default HERE: None is falsy, so deferring it to
        # resize_normalize would skip the shard_map route on multi-device
        # TPU meshes and hand GSPMD an unpartitionable pallas_call.
        use_pallas = _on_tpu()
    if mesh is not None and mesh.devices.size > 1 and use_pallas:
        return resize_normalize_sharded(video_u8, out_size, mesh,
                                        use_pallas=use_pallas)
    return resize_normalize(video_u8, out_size, use_pallas=use_pallas)


def subsample_and_preprocess(raw_u8: jax.Array, frame_idx: jax.Array,
                             out_size: int,
                             use_pallas=None, mesh=None) -> jax.Array:
    """The full fused B3 ingest step, jittable end to end.

    raw_u8:   (B, T_raw, H, W, C) uint8 stored clips
    frame_idx:(B, T) int32 temporal-subsampling indices (host-chosen window)
    Returns (B, T, S, S, C) float32 in [-1, 1].
    """
    sel = jnp.take_along_axis(
        raw_u8, frame_idx[:, :, None, None, None].astype(jnp.int32), axis=1)
    return resize_normalize_auto(sel, out_size, mesh=mesh,
                                 use_pallas=use_pallas)
