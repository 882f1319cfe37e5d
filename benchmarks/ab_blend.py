"""Interleaved A/B: streamed blend vs gather-then-blend on the bench tile.

Round 4's driver bench recorded `tile_seconds_ddim100: 1.218` (best-of-9)
vs round 3's 0.783, while the T=1500 tile and MFU stayed within 1% — the
round-5 verdict asks whether the round-4 streamed-blend refactor
(aggregation.py `__call__`, commit 6a4285e) costs real time on few-chunk
tiles, or whether the short measurement is remote-tunnel session variance.

This script answers with an interleaved same-session A/B on the EXACT
bench configuration (bench.setup_flagship: bf16 + s2d + tap44='block',
256px LR tile, patch 64 / stride 32 / B48 -> 2 chunks):

  A (streamed): AggregationSampler.__call__ — each gathered chunk is
    scatter-added into the canvas as it lands (round-4 path).
  B (gather):   extract_patches -> sample_patches -> one post-hoc blend
    loop — the round-3 `__call__` structure, reconstructed from the same
    public methods (identical chunk plan, identical key stream, identical
    jitted device graphs; ONLY the host-side blend ordering differs).

Reps alternate A,B,A,B,... so both variants sample the same tunnel/session
window; per-rep times, medians and IQRs are printed as one JSON object.

Usage (real TPU):
    python -m benchmarks.ab_blend [--reps 9] [--ddim_steps 100]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _blend_gather(agg, variables, img, key):
    """Round-3 gather-then-blend tile path (pre-6a4285e `__call__`),
    composed from the current public methods: materialize every patch,
    denoise them all, then blend once at the end. Device work is identical
    to the streamed path — same _chunk_plan, same key splits."""
    img = np.asarray(img, np.float32)
    h, w, c = img.shape
    patches, boxes = agg.extract_patches(img)
    sr = agg.sample_patches(variables, patches, key)
    canvas = np.zeros((h * agg.mag, w * agg.mag, c), np.float32)
    counts = np.zeros((h * agg.mag, w * agg.mag, 1), np.float32)
    wmask = agg.weight[:, :, None]
    for patch, (y0, y1, x0, x1) in zip(sr, boxes):
        canvas[y0:y1, x0:x1] += patch * wmask
        counts[y0:y1, x0:x1] += wmask
    assert (counts != 0).all()
    return np.clip(canvas / counts, 0.0, 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=9)
    p.add_argument("--ddim_steps", type=int, default=100)
    p.add_argument("--t1500", action="store_true",
                   help="also A/B the full T=1500 ancestral tile")
    args = p.parse_args()

    from diffusionremotesensing_tpu.utils import force_cpu_if_requested

    force_cpu_if_requested()  # DRS_FORCE_CPU=1 smoke runs

    import jax

    from bench import BATCH, MAG, PATCH, STRIDE, setup_flagship
    from diffusionremotesensing_tpu.aggregation import AggregationSampler

    _, variables, proc, img = setup_flagship()

    def ab(ddim_steps):
        agg = AggregationSampler(
            proc, PATCH, STRIDE, MAG, batch_size=BATCH, ddim_steps=ddim_steps
        )
        # warm both paths (compile is shared: same jitted sampler)
        agg(variables, img, key=jax.random.PRNGKey(7))
        _blend_gather(agg, variables, img, jax.random.PRNGKey(7))
        streamed, gathered = [], []
        for i in range(args.reps):
            t0 = time.perf_counter()
            a = agg(variables, img, key=jax.random.PRNGKey(11 + i))
            streamed.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            b = _blend_gather(agg, variables, img, jax.random.PRNGKey(11 + i))
            gathered.append(time.perf_counter() - t0)
            # same keys -> identical outputs; assert so the A/B can't be
            # comparing different computations
            assert np.array_equal(a, b), "streamed != gather output"

        def stats(ts):
            # aggregation definition shared with bench.build_report
            from bench import rep_stats

            return {"reps": [round(t, 4) for t in ts],
                    **{k: round(v, 4) for k, v in rep_stats(ts).items()}}

        return {"streamed": stats(streamed), "gather": stats(gathered)}

    out = {
        "device": jax.devices()[0].device_kind,
        "config": f"tile256 x{MAG} patch{PATCH}/stride{STRIDE} B{BATCH}",
        f"ddim{args.ddim_steps}": ab(args.ddim_steps),
    }
    if args.t1500:
        out["t1500"] = ab(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
