"""Data-parallel scaling over ICI (BASELINE B1 + B2).

The reference is strictly single-device (``--gpu N``; no ChainerMN, no
NCCL/MPI — SURVEY.md §2 'Parallelism strategies: none'). Scaling is new
TPU-native scope: a 1-D ``data`` mesh, batch sharded over it, parameters
replicated, and the ONE jitted train step compiled with GSPMD so XLA
inserts the gradient/BatchNorm all-reduces as psums over ICI automatically.

Because GSPMD preserves the semantics of the unsharded program, the sharded
step computes exactly the single-device step on the concatenated global
batch — loss curves are preserved by construction (the BASELINE requirement)
and the §4 "pmapped == single-device" test is an equality check, not a
tolerance check.

Multi-host: `initialize_distributed()` wires `jax.distributed` when driver
env vars are present; the mesh then spans all slice devices and per-host
batch shards are placed with `make_array_from_process_local_data`.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DCN_AXIS = "dcn"  # outer axis of a multi-slice (cross-DCN) mesh


def initialize_distributed() -> None:
    """Initialize multi-process JAX when launched under a multi-host driver
    (no-op on a single host). The reference has no analog — its world is one
    process (SURVEY.md §5 'Distributed communication backend: Absent').

    Topology comes from the driver environment: on TPU pods the cluster
    plugin auto-detects everything; for manual launches (and the 2-process
    CPU test) JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    pin it explicitly."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    # NB: must not touch jax.devices()/process_count() here — they would
    # initialize the XLA backend, after which distributed init is illegal.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(nproc) if nproc else None,
        process_id=int(pid) if pid else None)


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None,
              n_slices: int = 1) -> Mesh:
    """1-D ``(data,)`` mesh, or — with ``n_slices > 1`` — a 2-D
    ``(dcn, data)`` mesh for multi-slice training.

    Multi-slice: the outer axis enumerates TPU slices connected over DCN,
    the inner axis the chips within each slice connected over ICI. Pure
    data parallelism shards the batch over BOTH axes (`batch_sharding`
    returns P((dcn, data))), so GSPMD lowers the gradient all-reduce
    hierarchically: reduce-scatter + all-gather within each slice rides
    ICI, and only one ~param-sized exchange per step crosses DCN — the
    standard multi-slice recipe (docs/SCALING.md §5).

    Device assignment (ADVICE r4 #1): on real multi-slice TPU the rows of
    the 2-D mesh must hold chips of the SAME physical slice or XLA cannot
    lower the hierarchical all-reduce as intended — `jax.devices()` order
    is not an API guarantee of that. When devices expose `slice_index`
    (real multi-slice hardware does), they are grouped by it explicitly;
    CPU/virtual devices (no slice_index) keep the plain contiguous
    reshape, which is the emulation fallback the tests exercise."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devs)}")
        devs = devs[:num_devices]
    if n_slices <= 1:
        return Mesh(np.asarray(devs), (DATA_AXIS,))
    if len(devs) % n_slices:
        raise ValueError(f"{len(devs)} devices not divisible into "
                         f"{n_slices} slices")
    devs = _order_by_slice(devs, n_slices)
    return Mesh(np.asarray(devs).reshape(n_slices, -1),
                (DCN_AXIS, DATA_AXIS))


def _order_by_slice(devs: Sequence[Any], n_slices: int) -> list:
    """Order devices so each contiguous group of len/n_slices chips lies in
    one physical slice (rows of the (dcn, data) mesh = slices).

    Uses `device.slice_index` when every device reports one (real
    multi-slice TPU); requires the slice populations to be balanced and
    to match n_slices. Devices without slice_index (CPU/virtual meshes,
    single-slice TPU) are returned unchanged — the caller's contiguous
    reshape is then an emulation, not a physical DCN mapping."""
    idx = [getattr(d, "slice_index", None) for d in devs]
    if any(i is None for i in idx):
        return list(devs)
    per = {}
    for d, i in zip(devs, idx):
        per.setdefault(i, []).append(d)
    if len(per) != n_slices:
        raise ValueError(
            f"devices span {len(per)} physical slices (slice_index values "
            f"{sorted(per)}) but n_slices={n_slices}; a (dcn, data) mesh "
            f"must match the physical slice topology")
    counts = {i: len(v) for i, v in per.items()}
    if len(set(counts.values())) != 1:
        raise ValueError(
            f"unbalanced slices: {counts} — every slice must contribute "
            f"the same chip count")
    out: list = []
    for i in sorted(per):
        out.extend(sorted(per[i], key=lambda d: d.id))
    return out


def batch_axes(mesh: Mesh):
    """Mesh axes the batch dimension is sharded over — every axis: pure
    DP on the 1-D mesh, hierarchical (slice-major) DP on the 2-D mesh.
    Returns the bare axis name on 1-D meshes so specs stay identical to
    the single-axis form P("data")."""
    names = tuple(mesh.axis_names)
    return names[0] if len(names) == 1 else names


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across the data (and dcn) mesh axes."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays: Any) -> Tuple[jax.Array, ...]:
    """Place host arrays onto the mesh, batch axis sharded.

    Single host: a plain device_put scatter. Multi-host: each process passes
    its LOCAL batch shard (global_batch / process_count examples) and the
    global array is assembled across processes without any cross-host copy
    of the data itself (per-host input sharding, BASELINE B1)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        def put(a):
            return jax.make_array_from_process_local_data(sh, np.asarray(a))
    else:
        def put(a):
            return jax.device_put(a, sh)
    out = tuple(put(a) if a is not None else None for a in arrays)
    return out if len(out) > 1 else out[0]


def shard_state(mesh: Mesh, state: Any) -> Any:
    """Replicate a TrainState (or any pytree) across the mesh.

    Multi-host: device_put cannot target non-addressable devices, so each
    process contributes its (identical) local copy of every leaf via
    make_array_from_process_local_data; typed PRNG keys are unwrapped to
    their raw data for the host round-trip and re-wrapped."""
    rep = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, rep), state)

    def put(x):
        x = jax.numpy.asarray(x)
        if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            impl = jax.random.key_impl(x)
            data = np.asarray(jax.device_get(jax.random.key_data(x)))
            arr = jax.make_array_from_process_local_data(rep, data)
            return jax.random.wrap_key_data(arr, impl=impl)
        return jax.make_array_from_process_local_data(
            rep, np.asarray(jax.device_get(x)))

    return jax.tree.map(put, state)


def make_sharded_train_step(cfg, mesh: Mesh):
    """jit(train_step) with explicit shardings: state replicated, batch
    sharded over the data axis. XLA emits the ICI collectives."""
    from mocogan_tpu.train.step import train_step  # local import, no cycle

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def step_fn(state, real, labels):
        return train_step(state, real, labels, cfg)

    has_labels = cfg.model.conditional
    in_shardings = (rep, bsh, bsh if has_labels else None)
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def _pallas_default() -> bool:
    """The fused Pallas ingest runs on any TPU mesh: single-device directly,
    multi-device via shard_map (resize_normalize_sharded — GSPMD can't
    auto-partition a pallas_call, manual per-shard mapping can). Off-TPU the
    jnp twin is the production path; tests/dryrun force "interpret"."""
    return jax.default_backend() == "tpu"


def make_sharded_multi_train_step(cfg, mesh: Mesh, use_pallas=None):
    """jit(multi_train_step): K steps per dispatch; stacked batches sharded
    on the BATCH axis (axis 1), step axis unsharded."""
    from mocogan_tpu.train.step import multi_train_step

    rep = replicated(mesh)
    bsh = NamedSharding(mesh, P(None, batch_axes(mesh)))
    if use_pallas is None:
        use_pallas = _pallas_default()

    def step_fn(state, batches, labels, frame_idx):
        return multi_train_step(state, batches, labels, frame_idx, cfg,
                                use_pallas=use_pallas, mesh=mesh)

    has_labels = cfg.model.conditional
    return jax.jit(
        step_fn,
        in_shardings=(rep, bsh, bsh if has_labels else None, bsh),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_cached_train_step(cfg, mesh: Mesh, k: int, use_pallas=None):
    """jit(cached_multi_train_step): K steps per dispatch sampling from a
    device-resident dataset pool — zero per-step host traffic."""
    from mocogan_tpu.train.step import cached_multi_train_step

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    if use_pallas is None:
        use_pallas = _pallas_default()

    def step_fn(state, pool, lengths, labels):
        return cached_multi_train_step(state, pool, lengths, labels, k, cfg,
                                       batch_sharding=bsh,
                                       use_pallas=use_pallas, mesh=mesh)

    has_labels = cfg.model.conditional
    return jax.jit(
        step_fn,
        in_shardings=(rep, rep, rep, rep if has_labels else None),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def shard_stacked_batch(mesh: Mesh, *arrays: Any) -> Tuple[jax.Array, ...]:
    """Place (K, B, ...) host stacks onto the mesh, B axis sharded."""
    sh = NamedSharding(mesh, P(None, batch_axes(mesh)))
    if jax.process_count() > 1:
        def put(a):
            return jax.make_array_from_process_local_data(sh, np.asarray(a))
    else:
        def put(a):
            return jax.device_put(a, sh)
    out = tuple(put(a) if a is not None else None for a in arrays)
    return out if len(out) > 1 else out[0]


def local_batch_slice(mesh: Mesh, *arrays: Any, axis: int = 0) -> Any:
    """Slice host arrays' global batch axis down to THIS process's local
    shard (single process: identity).

    The data iterators produce the IDENTICAL global batch on every process
    (batch k is a pure function of (seed, k)), so per-host input sharding
    is a deterministic slice: process p materializes and uploads only rows
    [p*local_b, (p+1)*local_b) — the same convention `shard_batch`'s
    make_array_from_process_local_data assembly expects (process p's
    addressable devices hold the p-th contiguous span of the 1-D mesh).
    Feeding the FULL global batch to shard_batch on multi-host would
    instead concatenate all processes' copies — duplicated data at
    process_count times the intended batch size.
    """
    n_proc = jax.process_count()
    if n_proc == 1:
        return arrays if len(arrays) > 1 else arrays[0]
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        a = np.asarray(a)
        b = a.shape[axis]
        if b % n_proc:
            raise ValueError(f"global batch {b} not divisible by "
                             f"{n_proc} processes")
        lb = b // n_proc
        lo = jax.process_index() * lb
        sl = (slice(None),) * axis + (slice(lo, lo + lb),)
        out.append(a[sl])
    return tuple(out) if len(out) > 1 else out[0]


def local_batch_size(cfg, mesh: Mesh) -> int:
    """Per-process slice of the global batch (multi-host input sharding)."""
    global_b = cfg.train.batch_size
    n = mesh.devices.size
    if global_b % n:
        raise ValueError(f"global batch {global_b} not divisible by "
                         f"{n} devices")
    return global_b // jax.process_count()
