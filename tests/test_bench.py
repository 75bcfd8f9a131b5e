"""bench.py orchestrator logic — no device work, everything stubbed.

The timed modes themselves need the TPU; what IS testable on CPU is the
orchestration policy the driver relies on: the reachability probe
short-circuit, baseline-cache staleness, the two-point timer's noise-floor
error, headline fallback, and the smoke gate.
"""

import contextlib
import io
import json
import os
import sys
import tempfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


@pytest.fixture
def fresh_bench(monkeypatch):
    """bench with REPO pointed at a temp dir and the slow baseline stubbed."""
    with tempfile.TemporaryDirectory() as d:
        monkeypatch.setattr(bench, "REPO", d)
        monkeypatch.setattr(bench, "baseline_iteration_time",
                            lambda *a, **k: 40.0)
        yield bench


def _record_from(capsys_or_buf):
    return json.loads(capsys_or_buf.getvalue().strip().splitlines()[-1])


def _mode_map(overrides=None):
    base = {
        "probe": {"probe_ok": True, "backend": "stub", "n_devices": 1},
        "pallas_smoke": {"pallas_smoke_ok": True},
        "gram": {"gram_seconds": 1e-4, "entries_per_sec": 1e10},
        "parity_gate": {"nlpd_parity_ok": True, "cv_nlpd_f32": 1.0,
                        "cv_nlpd_f64": 1.0, "cv_nlpd_mixed": 1.0,
                        "z_max_abs_dev": 0.0, "z_max_abs_dev_mixed": 0.0},
        "admm_f32": {"iter_seconds": 0.01},
        "admm_parity": {"iter_seconds": 0.2},
        "admm_mixed": {"iter_seconds": 0.02},
        "admm_chained": {"chained_ms_per_iter": 2.5},
    }
    base.update(overrides or {})
    return base


def test_probe_short_circuit(fresh_bench, monkeypatch):
    calls = []

    def run_mode(mode, timeout):
        calls.append((mode, timeout))
        return {"error": f"{mode}: timeout after {timeout}s"}

    monkeypatch.setattr(fresh_bench, "_run_mode", run_mode)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fresh_bench.main()
    rec = _record_from(buf)
    # exactly two probe attempts, nothing else, honest null record
    assert calls == [("probe", 300), ("probe", 900)]
    assert rec["value"] is None
    assert "unreachable" in rec["error"]


def test_happy_path_record(fresh_bench, monkeypatch):
    modes = _mode_map()
    monkeypatch.setattr(fresh_bench, "_run_mode", lambda m, t: modes[m])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fresh_bench.main()
    rec = _record_from(buf)
    assert rec["value"] == 100.0                       # 1 / 0.01
    assert rec["vs_baseline"] == 2000.0                # 40 / 0.02 (mixed)
    assert rec["nlpd_parity_ok"] is True
    assert rec["gram_entries_per_sec_chip"] == 1e10
    assert rec["chained_ms_per_iter"] == 2.5
    assert "errors" not in rec


def test_headline_falls_back_to_mixed(fresh_bench, monkeypatch):
    modes = _mode_map({"admm_f32": {"error": "admm_f32: timeout after 1500s"}})
    monkeypatch.setattr(fresh_bench, "_run_mode", lambda m, t: modes[m])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fresh_bench.main()
    rec = _record_from(buf)
    assert rec["value"] == 50.0                        # 1 / 0.02 mixed
    assert "mixed-solver mode" in rec["unit"]
    assert any("admm_f32" in e for e in rec["errors"])


def test_smoke_failure_zeroes_run(fresh_bench, monkeypatch):
    modes = _mode_map({"pallas_smoke": {"pallas_smoke_ok": False}})
    monkeypatch.setattr(fresh_bench, "_run_mode", lambda m, t: modes[m])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fresh_bench.main()
    rec = _record_from(buf)
    assert rec["value"] == 0.0 and rec["pallas_smoke_ok"] is False


def test_baseline_cache_staleness(fresh_bench):
    class Spec:
        num_parameters = 40

    fresh_bench.get_baseline_seconds(Spec(), [])
    path = os.path.join(fresh_bench.REPO, "BASELINE_LOCAL.json")
    with open(path) as f:
        rec = json.load(f)
    # cache hit: same config
    assert fresh_bench.get_baseline_seconds(Spec(), []) == 40.0
    # stale config -> recompute (stub returns 40.0 again, but the file
    # must be rewritten with the CURRENT config)
    rec["config"]["qubits"] = 99
    rec["baseline_iteration_seconds"] = 123.0
    with open(path, "w") as f:
        json.dump(rec, f)
    assert fresh_bench.get_baseline_seconds(Spec(), []) == 40.0
    with open(path) as f:
        assert json.load(f)["config"]["qubits"] == bench.NUM_QUBITS


def test_two_point_time_raises_on_noise_floor():
    with pytest.raises(RuntimeError, match="noise floor"):
        bench._two_point_time(lambda k: (lambda: 0.0),
                              k_lo=4, k_hi=8, max_k=16)


def test_two_point_time_measures_linear_cost():
    import time as _time

    def make_k_program(k):
        def f():
            _time.sleep(0.002 * k)
            return 1.0
        return f

    dt = bench._two_point_time(make_k_program, k_lo=4, k_hi=24,
                               repeats=2, min_delta=0.02)
    assert 0.0015 < dt < 0.004, dt
