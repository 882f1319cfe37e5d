"""Unit tests for bench._wait_for_tpu — the bounded tunnel-retry loop that
protects the driver benchmark from transient remote-TPU (axon) outages.
The probe runs in a subprocess (JAX caches a failed backend init for the
process lifetime), so the loop is testable by monkeypatching subprocess.run."""

import subprocess
import types

import bench


def _fake_run(script):
    """subprocess.run stand-in following `script`: a list of 'ok' | 'fail'
    | 'hang' outcomes, one per probe attempt (last entry repeats)."""
    calls = []

    def run(argv, timeout=None, **kw):
        step = script[min(len(calls), len(script) - 1)]
        calls.append(step)
        if step == "hang":
            raise subprocess.TimeoutExpired(argv, timeout)
        return types.SimpleNamespace(returncode=0 if step == "ok" else 1)

    return run, calls


def test_wait_returns_immediately_when_tpu_up(monkeypatch):
    import subprocess as sp

    run, calls = _fake_run(["ok"])
    monkeypatch.setattr(sp, "run", run)
    monkeypatch.setenv("DRS_TPU_WAIT_S", "900")
    bench._wait_for_tpu()
    assert calls == ["ok"]


def test_wait_retries_through_failure_then_succeeds(monkeypatch):
    import subprocess as sp

    run, calls = _fake_run(["fail", "hang", "ok"])
    monkeypatch.setattr(sp, "run", run)
    monkeypatch.setenv("DRS_TPU_WAIT_S", "900")
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._wait_for_tpu()
    assert calls == ["fail", "hang", "ok"]


def test_wait_disabled_runs_no_probe(monkeypatch):
    import subprocess as sp

    run, calls = _fake_run(["fail"])
    monkeypatch.setattr(sp, "run", run)
    monkeypatch.setenv("DRS_TPU_WAIT_S", "0")
    # 0 disables the wait entirely: not even one (up-to-180s) probe may run
    bench._wait_for_tpu()
    assert calls == []


def test_wait_gives_up_at_deadline_and_proceeds(monkeypatch):
    import subprocess as sp

    run, calls = _fake_run(["fail", "fail"])
    monkeypatch.setattr(sp, "run", run)
    monkeypatch.setenv("DRS_TPU_WAIT_S", "10")
    # clock jumps past the deadline right after the first probe: must
    # return (proceed to the real run), not sleep and re-probe
    t = iter([0.0, 100.0, 200.0, 300.0])
    monkeypatch.setattr(bench.time, "monotonic", lambda: next(t))
    monkeypatch.setattr(bench.time, "sleep", lambda s: (_ for _ in ()).throw(
        AssertionError("must not sleep past the deadline")))
    bench._wait_for_tpu()
    assert calls == ["fail"]


def test_build_report_contract():
    """Pin the bench output contract: one JSON-serializable dict, headline
    T=1500 = best-of-3, DDIM row = MEDIAN of reps with per-rep list + IQR
    (variance-robustness added after the round-4 driver bench recorded a
    tunnel-degraded best-of-9 with no per-rep evidence; NOTES.md round-5)."""
    import json

    ddim = [0.9, 0.85, 1.2, 0.87, 0.88, 0.86, 0.9, 0.91, 0.89]
    r = bench.build_report(49, [7.1, 7.0, 7.2], ddim, "TPU v5 lite", 11.0)
    json.dumps(r)  # serializable in one line
    assert r["tile_seconds_t1500"] == 7.0              # best-of-3
    assert r["tile_seconds_ddim100"] == 0.89           # median, not min
    assert r["ddim100_rep_seconds"] == [round(t, 3) for t in ddim]
    assert r["ddim100_iqr_seconds"] > 0
    assert r["t1500_rep_seconds"] == [7.1, 7.0, 7.2]
    assert r["mfu_pct"] and 0 < r["mfu_pct"] < 100
    # no torch baseline -> None fields, report still builds
    r2 = bench.build_report(49, [7.0], [1.0], "unknown-device", None)
    assert r2["vs_baseline"] is None and r2["mfu_pct"] is None
