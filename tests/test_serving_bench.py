"""Smoke coverage for the serving benchmark entrypoint
(benchmarks/serving_bench.py): the full flow — server construction, warmup,
sequential HTTP latency, concurrent micro-batched throughput — at a tiny
DDIM step count, in-process on the CPU backend (conftest forces it).

Exists because an unexercised benchmark entrypoint once shipped broken
(round-2 ADVICE: learning_check's evaluate gates crashed with a NameError
at HEAD); every benchmarks/ entrypoint now gets at least a smoke test.
"""

import pytest

from benchmarks.serving_bench import _percentile, bench


def test_percentile_endpoints():
    xs = [5.0, 1.0, 3.0]
    assert _percentile(xs, 0) == 1.0
    assert _percentile(xs, 50) == 3.0
    assert _percentile(xs, 100) == 5.0


def test_serving_bench_smoke():
    out = bench(max_batch=2, quick=True, ddim_steps=2)
    assert out["max_batch"] == 2
    for k in (
        "ddim2_latency_p50_s",
        "ddim2_latency_p95_s",
        "ddim2_concurrent_req_per_s",
        "ddim2_concurrent_p95_s",
    ):
        assert k in out and out[k] > 0
    # p50 <= p95 by construction
    assert out["ddim2_latency_p50_s"] <= out["ddim2_latency_p95_s"]


def test_serving_bench_soak_smoke():
    """--soak mode: sustained mixed traffic; key-reuse + leak checks wired."""
    from benchmarks.serving_bench import soak

    out = soak(max_batch=2, seconds=4, n_threads=2, ddim_steps=2,
               tile_threads=1)
    assert out["mode"] == "soak"
    assert out["requests_failed"] == 0, out["errors_sample"]
    assert out["requests_ok"] > 0
    assert out["all_outputs_distinct"] is True
    # rates count only in-window completions BY DESIGN (ADVICE round-4);
    # on a heavily loaded host every completion of this 4 s smoke can land
    # in the drain, so assert on completion facts, not the windowed rate
    assert out["sustained_req_per_s"] >= 0
    assert out["latency_p50_s"] is not None
    # tile endpoint is a first-class soak subject (dedicated client thread)
    assert out["tile_requests"] > 0
    assert out["tile_p50_s"] is not None
    # rates are over the requested window; the drain tail is separate
    assert out["soak_seconds"] == 4
    assert out["drain_seconds"] >= 0


def test_soak_rejects_degenerate_thread_split():
    """tile_threads >= n_threads would silently soak nothing on /superres."""
    from benchmarks.serving_bench import soak

    with pytest.raises(ValueError):
        soak(max_batch=2, seconds=1, n_threads=2, ddim_steps=2, tile_threads=2)
