"""Hang-proofness contract for bench.py (VERDICT r3 missing #1).

Round 3 shipped an EMPTY perf artifact because the TPU tunnel hung inside
a C dispatch and bench.py only printed its JSON line after all stages.
These tests fake a hanging stage (BENCH_FAKE_HANG sleeps forever in the
child before importing jax) and assert the parent's watchdog kills it and
STILL emits one parseable JSON line within budget — including the
CPU-oracle anchor and `tpu_unresponsive` diagnosis.

The real failure blocks inside libtpu where no Python timer can fire; the
subprocess kill is the only mechanism that works for both the fake and the
real hang, so faking at the Python level exercises the identical parent
path (subprocess.run(timeout=...) -> kill -> partial JSON).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(tmp_path, fake_hang, stage_timeouts, budget=240):
    cache = tmp_path / "cpu_cache.json"
    cache.write_text(json.dumps({"mug_b16": 0.002}))
    env = dict(
        os.environ,
        BENCH_FAKE_HANG=fake_hang,
        BENCH_STAGE_TIMEOUTS=json.dumps(stage_timeouts),
        BENCH_BUDGET_SEC=str(budget),
        BENCH_CPU_CACHE=str(cache),
        BENCH_BF16="0", BENCH_SCAN="0", BENCH_BATCHES="0",
        BENCH_GENERATE="0", BENCH_SCALED="0", BENCH_PARITY="0",
    )
    t0 = time.time()
    out = subprocess.run([sys.executable, BENCH], capture_output=True,
                         text=True, env=env, cwd=REPO, timeout=budget + 60)
    elapsed = time.time() - t0
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert lines, f"no stdout at all; stderr: {out.stderr[-1000:]}"
    parsed = json.loads(lines[-1])  # the driver parses the last line
    return parsed, elapsed


def test_hung_train_stage_still_emits_artifact(tmp_path):
    parsed, elapsed = _run_bench(tmp_path, fake_hang="train",
                                 stage_timeouts={"train": 3})
    assert elapsed < 240
    assert parsed["metric"] == "train_steps_per_sec_per_chip_64x64x16f"
    assert parsed["value"] is None
    assert parsed["vs_baseline"] is None
    extra = parsed["extra"]
    # Preflight succeeded (CPU backend responds), so the diagnosis is a
    # per-stage timeout, not total unresponsiveness.
    assert extra["tpu_unresponsive"] is False
    assert extra["stages"]["train"]["timeout"] is True
    # The anchor survives a dead headline.
    assert extra["cpu_oracle_steps_per_sec"] == 0.002


def test_hung_preflight_reports_tpu_unresponsive(tmp_path):
    parsed, _ = _run_bench(tmp_path, fake_hang="preflight",
                           stage_timeouts={"preflight": 3})
    assert parsed["value"] is None
    extra = parsed["extra"]
    assert extra["tpu_unresponsive"] is True
    assert extra["stages"]["preflight"]["timeout"] is True
    # No TPU stage may have been attempted after a failed preflight.
    assert "train" not in extra["stages"]
    assert extra["cpu_oracle_steps_per_sec"] == 0.002


def test_mid_run_tunnel_death_stops_burning_budget(tmp_path):
    """The hang mode can start BETWEEN stages (observed live: preflight
    passed in 13s, every later stage hung). After two consecutive stage
    timeouts the parent re-probes; a failed re-probe must mark the tunnel
    dead and SKIP remaining TPU stages rather than timing out each one."""
    cache = tmp_path / "cpu_cache.json"
    cache.write_text(json.dumps({"mug_b16": 0.002}))
    env = dict(
        os.environ,
        # train and pallas_verify hang (the two consecutive timeouts);
        # the preflight succeeds ONCE (initial) then fails (re-probe).
        BENCH_FAKE_HANG="train,pallas_verify",
        BENCH_FAKE_FAIL_AFTER=f"preflight:1:{tmp_path}/pf_count",
        BENCH_STAGE_TIMEOUTS=json.dumps({"train": 3, "pallas_verify": 3}),
        BENCH_BUDGET_SEC="300",
        BENCH_CPU_CACHE=str(cache),
        BENCH_BF16="1", BENCH_SCAN="0", BENCH_BATCHES="0",
        BENCH_GENERATE="1", BENCH_SCALED="0", BENCH_PARITY="0",
    )
    t0 = time.time()
    out = subprocess.run([sys.executable, BENCH], capture_output=True,
                         text=True, env=env, cwd=REPO, timeout=360)
    elapsed = time.time() - t0
    assert out.returncode == 0, out.stderr[-2000:]
    parsed = json.loads(out.stdout.splitlines()[-1])
    extra = parsed["extra"]
    assert extra["tpu_died_mid_run"] is True
    assert extra["stages"]["train"]["timeout"] is True
    assert extra["stages"]["pallas_verify"]["timeout"] is True
    # Post-death stages were skipped, not timed out.
    assert extra["stages"]["train_bf16"] == {"skipped": "tpu_dead"}
    assert extra["stages"]["generate"] == {"skipped": "tpu_dead"}
    # ...which is exactly what keeps the run fast: well under the budget
    # (2 fake hangs x 3s + one preflight each side, not 4 x timeout).
    assert elapsed < 180


def test_healthy_cpu_run_emits_full_headline(tmp_path):
    """With no fake hang, the subprocess-staged bench must still produce a
    real headline (CPU backend; tiny budget-friendly stage set)."""
    import hashlib

    # Tiny geometry + short windows: the contract under test is the
    # parent/child protocol, not flagship throughput.
    overrides = json.dumps({
        "model.image_size": 32, "model.video_length": 8,
        "model.gen_features": 8, "model.disc_features": 8,
        "train.batch_size": 8})
    # The oracle cache is keyed by the overrides hash so a tiny-geometry
    # test can never poison the flagship anchor — prefill the suffixed
    # key this run will look up.
    key = "mug_b16_ov" + hashlib.sha1(overrides.encode()).hexdigest()[:8]
    cache = tmp_path / "cpu_cache.json"
    cache.write_text(json.dumps({key: 0.002}))
    env = dict(
        os.environ,
        BENCH_CPU_CACHE=str(cache),
        BENCH_BF16="0", BENCH_SCAN="0", BENCH_BATCHES="0",
        BENCH_GENERATE="0", BENCH_SCALED="0", BENCH_PARITY="0",
        BENCH_BUDGET_SEC="900",
        BENCH_OVERRIDES=overrides,
        BENCH_STEPS="2", BENCH_WARMUP="1",
    )
    out = subprocess.run([sys.executable, BENCH], capture_output=True,
                         text=True, env=env, cwd=REPO, timeout=960)
    assert out.returncode == 0, out.stderr[-2000:]
    parsed = json.loads(out.stdout.splitlines()[-1])
    assert parsed["value"] is not None and parsed["value"] > 0
    # vs_baseline is computed from the unrounded best; allow rounding slop.
    assert abs(parsed["vs_baseline"] - parsed["value"] / 0.002) < 1.0
    extra = parsed["extra"]
    assert extra["tpu_unresponsive"] is False
    assert extra["stages"]["train"]["ok"] is True
    # On the CPU test backend the on-device pallas check reports False
    # (it only runs on a real chip) but the field must exist.
    assert "pallas_verified_on_device" in extra
