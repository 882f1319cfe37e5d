"""Microbenchmark: dense-s2d conv vs tap-structured XLA (conv_s2d44) vs
tap-structured Pallas (tap_conv) at the flagship sampler shapes
(B=48, 64x64 s2d grid, bf16). Run on the real TPU:

    python -m benchmarks.tapconv_bench [--iters 100 --reps 5]

Timing method: the op is CHAINED ``iters`` times inside one jitted
lax.scan (output feeds the next input, so steps serialize) and the whole
loop is timed — a single dispatch through the remote-TPU tunnel costs
~30 ms, which would swallow a 600 us op entirely (the first version of
this file measured exactly that; numbers recorded in NOTES.md round-3).
Weights are scaled so the chained activations neither explode nor vanish.

Records the round-3 VERDICT item 1 measurement; results go to NOTES.md.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed_loop(op, x0, iters, reps):
    """Best per-iteration seconds of op chained `iters` times in one jit."""

    @jax.jit
    def loop(x):
        def body(c, _):
            return op(c), None

        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    jax.block_until_ready(loop(x0))
    jax.block_until_ready(loop(x0))  # tunnel warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--skip_pallas", action="store_true")
    p.add_argument("--stem", action="store_true",
                   help="compare the fused stem kernel (tap_stem_block) vs "
                        "XLA conv0+bias+cond-add feeding tap_block, at the "
                        "flagship level-0 shape")
    args = p.parse_args()

    if args.stem:
        _stem_bench(args)
        return

    from bench import _machine_scoped_cache

    jax.config.update("jax_compilation_cache_dir", _machine_scoped_cache())

    from diffusionremotesensing_tpu.ops.s2d import (
        conv_s2d,
        conv_s2d44,
        k3_to_s2d,
        k3_to_s2d44,
    )
    from diffusionremotesensing_tpu.ops.tap_conv import tap_conv, tap_conv_pair

    B, H2 = args.batch, 64
    SAME = ((1, 1), (1, 1))
    key = jax.random.PRNGKey(0)

    for name, ci, co, wscale in (("blk_conv2", 32, 32, 0.03), ("blk_conv1", 16, 32, 0.04)):
        w = jax.random.normal(key, (3, 3, ci, co), jnp.float32) * wscale
        x = jax.random.normal(key, (B, H2, H2, 4 * ci), jnp.bfloat16)
        wd = jax.device_put(k3_to_s2d(w).astype(jnp.bfloat16))
        w44 = jax.device_put(k3_to_s2d44(w).astype(jnp.bfloat16))
        gf_ref = 2 * B * H2 * H2 * 9 * ci * co / 1e9  # reference-math GFLOP

        # chain: slice the (B,H2,H2,4co) output back to 4ci input channels
        def chain(f):
            return lambda c: f(c)[..., : 4 * ci]

        variants = {
            "dense": chain(lambda c: conv_s2d(c, wd, SAME)),
            "xla44": chain(lambda c: conv_s2d44(c, w44)),
        }
        if not args.skip_pallas:
            variants["pallas"] = chain(lambda c: tap_conv(c, w44))
        for lbl, op in variants.items():
            t = _timed_loop(op, x, args.iters, args.reps)
            print(f"{name} {lbl:7s} {t*1e6:8.1f} us  {gf_ref/t/1e3:6.1f} TF/s(ref)",
                  flush=True)

        # correctness on-device (bf16 tolerance) — single calls
        ref = np.asarray(conv_s2d(x, wd, SAME), np.float32)
        got = np.asarray(conv_s2d44(x, w44), np.float32)
        assert np.abs(got - ref).max() < 0.25, f"{name} xla44 mismatch"
        if not args.skip_pallas:
            got = np.asarray(tap_conv(x, w44), np.float32)
            assert np.abs(got - ref).max() < 0.25, f"{name} pallas mismatch"

    if not args.skip_pallas:
        # conv1 + skip as a fused pair (shared im2col build)
        w1 = jax.random.normal(key, (3, 3, 16, 32), jnp.float32) * 0.03
        w2 = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 16, 32), jnp.float32) * 0.03
        x = jax.random.normal(key, (B, H2, H2, 64), jnp.bfloat16)
        wa, wb = (jax.device_put(k3_to_s2d44(w).astype(jnp.bfloat16)) for w in (w1, w2))

        def pair_op(c):
            a, b = tap_conv_pair(c, wa, wb)
            return (a + b)[..., :64]

        t = _timed_loop(pair_op, x, args.iters, args.reps)
        gf_pair = 2 * 2 * B * H2 * H2 * 9 * 16 * 32 / 1e9
        print(f"conv1+skip pallas-pair {t*1e6:8.1f} us  "
              f"{gf_pair/t/1e3:6.1f} TF/s(ref, shared im2col)", flush=True)


def _stem_bench(args):
    """Chained A/B of the level-0 entry at the flagship shape: the fused
    stem kernel (conv0 + bias + cond-add + whole ResConvBlock-0 in one
    Pallas program) vs the adopted round-3 path (XLA dense-s2d conv0 +
    add fusion feeding the tap_block kernel)."""
    from bench import _machine_scoped_cache

    jax.config.update("jax_compilation_cache_dir", _machine_scoped_cache())

    from diffusionremotesensing_tpu.ops.s2d import conv_s2d, k3_to_s2d
    from diffusionremotesensing_tpu.ops.tap_block import (
        build_block_weights,
        build_cond_slabs,
        tap_block,
        tap_stem_block,
    )

    B, H2 = args.batch, 64
    SAME = ((1, 1), (1, 1))
    r = lambda k, s, sc: jax.random.normal(jax.random.PRNGKey(k), s, jnp.float32) * sc  # noqa: E731
    bn = lambda k: {"scale": r(k, (32,), 0.1) + 1.0, "bias": r(k + 1, (32,), 0.05),  # noqa: E731
                    "mean": r(k + 2, (32,), 0.05), "var": jnp.abs(r(k + 3, (32,), 0.1)) + 0.9}
    bw = build_block_weights(
        r(1, (3, 3, 16, 32), 0.04), r(2, (32,), 0.02), bn(10),
        r(3, (3, 3, 16, 32), 0.04), r(4, (32,), 0.02),
        r(5, (3, 3, 32, 32), 0.04), r(6, (32,), 0.02), bn(20),
        r(7, (1, 1, 16, 32), 0.04), r(8, (32,), 0.02), bn(30),
    )
    dt = jnp.bfloat16
    w0 = k3_to_s2d(r(9, (3, 3, 3, 16), 0.1))
    b04 = jnp.tile(r(11, (16,), 0.02), 4)
    cond = r(12, (B, H2, H2, 64), 0.2).astype(dt)
    te4 = jnp.tile(jnp.maximum(r(13, (B, 32), 0.1), 0.0), (1, 4)).astype(dt)
    condb = jax.device_put(build_cond_slabs(b04, B, H2, H2, cond_s2d=cond, dtype=dt))
    w0d = jax.device_put(w0.astype(dt))
    b04d = jax.device_put(b04.astype(dt))
    x = jax.random.normal(jax.random.PRNGKey(14), (B, H2, H2, 12), dt)

    def xla_path(c):
        h = conv_s2d(c, w0d, SAME) + b04d + cond
        return tap_block(h, te4, bw)[..., :12]

    def stem_path(c):
        return tap_stem_block(c, condb, te4, bw, w0d)[..., :12]

    # ref-math GFLOP for the whole block entry (conv0 + conv1 + skip +
    # shortcut + conv2 on original pixels)
    gf = 2 * B * (2 * H2) ** 2 * (9 * 3 * 16 + 9 * 16 * 32 * 2 + 16 * 32 + 9 * 32 * 32) / 1e9
    for lbl, op in (("xla+block", xla_path), ("stem", stem_path)):
        t = _timed_loop(op, x, args.iters, args.reps)
        print(f"level0-entry {lbl:10s} {t*1e6:8.1f} us  {gf/t/1e3:6.1f} TF/s(ref)",
              flush=True)

    ref = np.asarray(xla_path(x), np.float32)
    got = np.asarray(stem_path(x), np.float32)
    assert np.abs(got - ref).max() < 0.25, "stem kernel mismatch on device"
    print("on-device stem == xla+block (bf16 tol) OK", flush=True)


if __name__ == "__main__":
    main()
