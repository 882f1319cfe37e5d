"""Fused ancestral-update Pallas kernel: posterior step + noise in one program.

The per-step DDPM update
``x' = (x - (1-a)/sqrt(1-ah) * eps) / sqrt(a) + sqrt(b) * z`` with
``z ~ N(0,1)`` (zeroed at the final step) is the only non-conv work left in
the sampler loop. XLA executes it as one fusion over the (B,H2,W2,12)
state — profiled at ~286 us/step at the flagship shape (48,64,64,12),
1.5 TF/s / 78 GiB/s: the threefry bit generator plus the uniform->normal
transform run as f32 VPU work in a batch-minor layout that occupies 48 of
128 lanes (xprof ``multiply_add_fusion.5``, benchmarks/NOTES.md round-3).

This kernel absorbs the WHOLE fusion (the round-3 lesson: partial Pallas
replacements lose to the fusion-barrier tax) and swaps threefry for the
TPU's hardware PRNG (`pltpu.prng_random_bits`), turning bit generation
from the dominant VPU cost into a near-free sample. Normals come from the
bits via Box-Muller (sqrt/log/cos — exact N(0,1), no CLT truncation).

SEMANTICS NOTE: the noise STREAM differs from `jax.random.normal`'s
(different generator, same distribution) — outputs are statistically
identical but not bitwise reproducible against the threefry path, so this
is an opt-in (``fused_update=True`` on the samplers; default OFF preserves
reference-equivalent behavior per the repo invariants). The reference
itself draws `torch.randn` with no cross-framework bit contract
(/root/reference/train_diffusion_superres.py:263-284).

Testing: the TPU PRNG has no CPU interpret-mode lowering, so the kernel
accepts pre-drawn ``bits`` operands; the bits->normal->update math is then
pinned exactly on CPU (tests/test_fused_update.py) and only the bit source
changes on the real chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:  # pallas is TPU-only here; import lazily so CPU test envs still work
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False

_TWO_PI = 6.283185307179586


def _bits_to_normal(b1, b2):
    """Box-Muller on two uint32 bit arrays -> N(0,1) f32 of the same shape.

    Uniforms come from the mantissa-bitcast trick — ``0x3F800000 | (bits
    >> 9)`` reinterpreted as f32 is uniform in [1,2) — because Mosaic has
    no uint32->f32 convert (sitofp); bitcast_convert_type lowers fine on
    TPU and everywhere else. u1 = 2 - f in (0,1] keeps log(u1) finite at
    bits==0 (occurs ~150 times per 1500-step tile at the flagship shape);
    u2 = f - 1 in [0,1). One draw per pair (the sin partner is discarded;
    hardware bits are free). 23-bit resolution."""
    one = jnp.uint32(0x3F800000)
    shift = jnp.uint32(9)
    f1 = lax.bitcast_convert_type(one | lax.shift_right_logical(b1, shift), jnp.float32)
    f2 = lax.bitcast_convert_type(one | lax.shift_right_logical(b2, shift), jnp.float32)
    u1 = 2.0 - f1
    u2 = f2 - 1.0
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _update_kernel(coef_ref, seed_ref, x_ref, eps_ref, o_ref):
    """o = ca*x - cb*eps + cn*z on one batch item, z from the on-chip PRNG
    seeded per (step key, batch program) for independent streams."""
    b = pl.program_id(0)
    # Mosaic rejects prng_seed with >2 values ("Setting seed with more than
    # 2 values is not supported", observed on-chip 08-18): fold the batch
    # program id into the first word with a Knuth multiplicative hash so
    # per-item streams stay decorrelated.
    bh = jnp.uint32(b) * jnp.uint32(2654435761)
    pltpu.prng_seed(seed_ref[0] ^ bh, seed_ref[1])
    shape = x_ref.shape
    b1 = pltpu.prng_random_bits(shape).astype(jnp.uint32)
    b2 = pltpu.prng_random_bits(shape).astype(jnp.uint32)
    z = _bits_to_normal(b1, b2)
    ca, cb, cn = coef_ref[0], coef_ref[1], coef_ref[2]
    x = x_ref[...].astype(jnp.float32)
    eps = eps_ref[...].astype(jnp.float32)
    o_ref[...] = (ca * x - cb * eps + cn * z).astype(o_ref.dtype)


def _update_kernel_bits(coef_ref, x_ref, eps_ref, b1_ref, b2_ref, o_ref):
    """Deterministic variant: identical math, bits supplied as operands
    (CPU/interpret-mode exactness tests; also usable for replay)."""
    z = _bits_to_normal(b1_ref[0].astype(jnp.uint32), b2_ref[0].astype(jnp.uint32))
    ca, cb, cn = coef_ref[0], coef_ref[1], coef_ref[2]
    x = x_ref[...].astype(jnp.float32)
    eps = eps_ref[...].astype(jnp.float32)
    o_ref[...] = (ca * x - cb * eps + cn * z).astype(o_ref.dtype)


def update_coefs(schedule, i):
    """The three per-step scalars, computed OUTSIDE the kernel (tiny traced
    scalar ops): x' = ca*x - cb*eps + cn*z reproduces diffusion.ddpm_step
    with the reference's zero-noise final step (i == 1)."""
    alpha = schedule.alpha[i]
    alpha_hat = schedule.alpha_hat[i]
    beta = schedule.beta[i]
    ca = lax.rsqrt(alpha)
    cb = ca * (1.0 - alpha) / jnp.sqrt(1.0 - alpha_hat)
    cn = jnp.sqrt(beta) * (i > 1).astype(jnp.float32)
    return jnp.stack([ca.astype(jnp.float32), cb.astype(jnp.float32), cn])


@functools.partial(jax.jit, static_argnames=("interpret",))
def ancestral_update(x, eps, coefs, seed, bits=None, interpret: bool = False):
    """Fused x' = ca*x - cb*eps + cn*z over a (B,H,W,C) state.

    x, eps: (B,H,W,C) float arrays (any mix of f32/bf16; math runs f32,
    output keeps x.dtype). coefs: (3,) f32 from :func:`update_coefs`.
    seed: (2,) uint32/int32 — per-step key material (callers pass
    ``jax.random.key_data(k)``); each batch item folds in its program id.
    bits: optional pair-stacked (2,B,H,W,C) uint32 replacing the on-chip
    PRNG (deterministic; required for interpret mode)."""
    B, H, W, C = x.shape
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    blk = lambda: pl.BlockSpec(  # noqa: E731
        (1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    if bits is None:
        if interpret:
            raise NotImplementedError(
                "the TPU PRNG has no interpret-mode lowering; pass bits"
            )
        return pl.pallas_call(
            _update_kernel,
            grid=(B,),
            in_specs=[smem, smem, blk(), blk()],
            out_specs=blk(),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(coefs, jnp.asarray(seed, jnp.uint32), x, eps)
    bblk = lambda: pl.BlockSpec(  # noqa: E731
        (1, 1, H, W, C), lambda b: (0, b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _update_kernel_bits,
        grid=(B,),
        in_specs=[smem, blk(), blk(), bblk(), bblk()],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(coefs, x, eps, bits[:1], bits[1:])
    return out
