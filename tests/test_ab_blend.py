"""Smoke coverage for benchmarks/ab_blend.py (the streamed-vs-gather blend
A/B entrypoint). Every benchmarks/ entrypoint gets at least a smoke test
(round-2 ADVICE: an unexercised entrypoint once shipped broken); this one
runs the A/B at a tiny tile/step count on CPU and checks the two paths
produce identical outputs and sane stats."""

import sys

import pytest

# four full (tiny-)tile sampler runs on CPU -> slow tail, round gate only
pytestmark = pytest.mark.slow


def test_ab_blend_smoke(monkeypatch, capsys):
    import bench
    from benchmarks import ab_blend

    # shrink the workload: 64px LR tile -> ONE 64px patch; 2 DDIM steps
    monkeypatch.setattr(bench, "TILE", 64)
    monkeypatch.setattr(sys, "argv", ["ab_blend", "--reps", "1", "--ddim_steps", "2"])
    ab_blend.main()
    import json

    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    ab = out["ddim2"]
    # identical outputs are asserted inside main(); here: stats shape
    for path in ("streamed", "gather"):
        assert len(ab[path]["reps"]) == 1
        assert ab[path]["median"] > 0
        assert ab[path]["min"] == pytest.approx(ab[path]["median"])
