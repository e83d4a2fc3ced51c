"""Profiling/tracing hooks (SURVEY.md §5: the reference has none; the
TPU-native equivalent is jax.profiler + named scopes).

Usage:
    with trace("/tmp/jax-trace"):        # open in TensorBoard/XProf
        run_some_steps()

    with annotate("train_step"):         # named region in the trace
        ...
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in profiler traces AND in HLO op names."""
    return jax.named_scope(name)


def device_memory_stats() -> dict:
    """Best-effort per-device memory stats (HBM usage)."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except (AttributeError, NotImplementedError, RuntimeError):
            out[str(d)] = None
    return out
