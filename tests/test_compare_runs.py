"""Unit tests for the loss-curve comparator (VERDICT r3 missing #2):
alignment across different logging cadences, the nabc statistic's
zero/scale-invariance properties, windowed late-divergence detection, and
the CLI artifact contract."""

import json

import numpy as np
import pytest

from mocogan_tpu.eval import compare_runs as cr


def _log(steps, fn, key="loss_gen"):
    return [{"step": int(s), key: float(fn(s))} for s in steps]


def test_identical_runs_have_zero_divergence():
    log = _log(range(0, 1000, 10), lambda s: np.sin(s / 100) + 2)
    rep = cr.compare(log, log)
    assert rep["keys"]["loss_gen"]["nabc"] == pytest.approx(0.0, abs=1e-12)
    assert rep["max_nabc"] == pytest.approx(0.0, abs=1e-12)


def test_alignment_across_different_cadences():
    # Same underlying curve logged every 10 vs every 23 steps: divergence
    # must be interpolation noise only, far below any real signal.
    f = lambda s: np.sin(s / 120.0) * 3 + 5  # noqa: E731
    rep = cr.compare(_log(range(0, 2000, 10), f),
                     _log(range(0, 2000, 23), f))
    assert rep["keys"]["loss_gen"]["nabc"] < 0.02


def test_nabc_is_scale_invariant():
    steps = range(0, 1000, 10)
    a1 = _log(steps, lambda s: np.sin(s / 100.0))
    b1 = _log(steps, lambda s: np.sin(s / 100.0 + 0.5))
    a2 = _log(steps, lambda s: 10 * np.sin(s / 100.0))
    b2 = _log(steps, lambda s: 10 * np.sin(s / 100.0 + 0.5))
    n1 = cr.compare(a1, b1)["keys"]["loss_gen"]["nabc"]
    n2 = cr.compare(a2, b2)["keys"]["loss_gen"]["nabc"]
    assert n1 > 0.1  # a real phase shift is detected
    assert n1 == pytest.approx(n2, rel=1e-6)  # ...identically at 10x scale


def test_windows_localize_late_divergence():
    steps = list(range(0, 1000, 5))
    a = _log(steps, lambda s: 1.0 + 0.1 * np.sin(s / 50))
    # identical first half, drifts apart in the second half
    b = _log(steps, lambda s: 1.0 + 0.1 * np.sin(s / 50)
             + (max(0, s - 500) / 500.0))
    d = cr.compare(a, b, windows=10)["keys"]["loss_gen"]
    w = d["nabc_windows"]
    assert len(w) == 10
    assert max(w[:4]) < 0.05 * max(w)  # early windows ~flat
    assert w[-1] == max(w)             # divergence grows to the end


def test_disjoint_step_ranges_raise():
    a = _log(range(0, 100, 10), lambda s: 1.0)
    b = _log(range(200, 300, 10), lambda s: 1.0)
    with pytest.raises(ValueError, match="do not overlap"):
        cr.compare(a, b)


def test_metadata_dim_keys_are_not_compared():
    log = [{"step": s, "loss_gen": float(s), "fvd_proxy": 1.0,
            "fvd_proxy_dim": 64.0} for s in range(0, 100, 10)]
    rep = cr.compare(log, log)
    assert "fvd_proxy_dim" not in rep["keys"]
    assert set(rep["keys"]) == {"loss_gen", "fvd_proxy"}


def test_series_drops_missing_and_keeps_last_duplicate():
    log = [{"step": 0, "loss_gen": 1.0}, {"step": 10, "other": 2.0},
           {"step": 10, "loss_gen": 3.0}, {"step": 10, "loss_gen": 4.0}]
    s, v = cr.series(log, "loss_gen")
    assert s.tolist() == [0.0, 10.0]
    assert v.tolist() == [1.0, 4.0]


def test_cli_writes_report_and_overlay(tmp_path):
    for name, phase in (("a", 0.0), ("b", 0.4)):
        with open(tmp_path / f"{name}.jsonl", "w") as f:
            for s in range(0, 500, 10):
                f.write(json.dumps(
                    {"step": s,
                     "loss_gen": float(np.sin(s / 60 + phase) + 2),
                     "fvd_proxy": float(1.0 + phase)}) + "\n")
    out = tmp_path / "cmp"
    rep = cr.main([str(tmp_path / "a.jsonl"), str(tmp_path / "b.jsonl"),
                   "--out", str(out), "--labels", "base", "variant"])
    assert (out / "compare.json").exists()
    assert (out / "overlay.png").exists()
    assert set(rep["keys"]) == {"loss_gen", "fvd_proxy"}
    assert rep["labels"] == {"a": "base", "b": "variant"}
    assert rep["max_nabc"] > 0


def test_eval_fingerprint_mismatch_excludes_fvd_keys():
    """fvd curves from differing eval fingerprints must be annotated and
    excluded from the nabc aggregates (VERDICT r4 weak #4: eval-code
    drift must not read as training divergence)."""
    def log(fp, offset):
        recs = _log(range(0, 1000, 10), lambda s: 1.0)
        for r in recs:
            r["fvd_proxy"] = 0.02 + offset
            r["eval_fingerprint"] = fp
        return recs

    rep = cr.compare(log("v3-aaaa", 0.0), log("v3-bbbb", 5.0))
    assert rep["eval_fingerprints"]["fvd_comparability"] == "eval_mismatch"
    assert rep["keys"]["fvd_proxy"]["eval_mismatch"] is True
    # loss_gen is identical -> aggregates (which exclude fvd) are ~0
    # despite the huge fvd offset.
    assert rep["max_nabc"] < 1e-9
    assert "eval_mismatch" not in rep["keys"]["loss_gen"]


def test_eval_fingerprint_match_keeps_fvd_comparable():
    def log(offset):
        recs = _log(range(0, 1000, 10), lambda s: 1.0)
        for r in recs:
            r["fvd_proxy"] = 0.02 + offset
            r["eval_fingerprint"] = "v3-aaaa"
        return recs

    rep = cr.compare(log(0.0), log(0.0))
    assert rep["eval_fingerprints"]["fvd_comparability"] == "comparable"
    assert "eval_mismatch" not in rep["keys"]["fvd_proxy"]


def test_pre_fingerprint_logs_marked_unknown():
    """Logs from rounds <5 carry no fingerprint: still compared (the old
    behavior) but labeled unknown so the reader knows the caveat."""
    def log():
        recs = _log(range(0, 1000, 10), lambda s: 1.0)
        for r in recs:
            r["fvd_proxy"] = 0.02
        return recs

    rep = cr.compare(log(), log())
    assert rep["eval_fingerprints"]["fvd_comparability"] == "unknown"
    assert "eval_mismatch" not in rep["keys"]["fvd_proxy"]


def test_scaled_x_axis_aligns_on_clips_seen():
    """scale_a/scale_b multiply each run's step axis before alignment —
    the fair x-axis for batch-size A/Bs. Two runs tracing the SAME curve
    in clips-seen (one at batch 2x the other, half the steps) must show
    ~zero divergence under the right scales and nonzero without."""
    f = lambda clips: np.sin(clips / 3000.0) + 2  # noqa: E731
    log_b16 = _log(range(0, 2000, 10), lambda s: f(s * 16))
    log_b32 = _log(range(0, 1000, 10), lambda s: f(s * 32))
    rep = cr.compare(log_b16, log_b32, scale_a=16, scale_b=32)
    assert rep["x_axis"]["scale_a"] == 16
    assert rep["keys"]["loss_gen"]["nabc"] < 0.02
    # same logs aligned on raw steps compare different curve segments
    rep_raw = cr.compare(log_b16, log_b32)
    assert rep_raw["keys"]["loss_gen"]["nabc"] > 0.1
    assert "x_axis" not in rep_raw
