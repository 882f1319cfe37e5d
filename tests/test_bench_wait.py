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
