"""Smoke tests for the shared timing module (bench.py / measure_perf.py
backend): the stats contract ({best, median, windows}) and that each timer
actually drives its program — tiny shapes, minimal steps, CPU."""

import numpy as np

from mocogan_tpu.utils import benchmarking


def test_stats_shape():
    s = benchmarking._stats([3.0, 1.0, 2.0])
    assert s["best"] == 3.0
    assert s["median"] == 2.0
    assert s["windows"] == [3.0, 1.0, 2.0]


def test_time_single_step_contract(tiny_cfg):
    s = benchmarking.time_single_step(tiny_cfg, steps=2, warmup=1,
                                      windows=2)
    assert set(s) == {"best", "median", "windows"}
    assert len(s["windows"]) == 2
    assert s["best"] >= s["median"] > 0


def test_time_generate_contract(tiny_cfg):
    s = benchmarking.time_generate(tiny_cfg, n_clips=2, reps=1, windows=2)
    assert s["best"] >= s["median"] > 0
    assert len(s["windows"]) == 2


def test_time_cached_scan_contract(tiny_cfg):
    import dataclasses

    cfg = dataclasses.replace(
        tiny_cfg, data=dataclasses.replace(tiny_cfg.data, raw_size=40,
                                           fused_preproc=False))
    s = benchmarking.time_cached_scan(cfg, k=2, reps=1, n_clips=4,
                                      windows=1)
    assert s["best"] > 0 and len(s["windows"]) == 1
    assert np.isfinite(s["median"])
