"""Tap-structured Pallas conv for the s2d level-0 3x3 layers.

The s2d execution of level 0 (ops/s2d.py) evaluates each 3x3 conv with a
dense (3,3,4C,4Co) kernel that is 75% structural zeros — the MXU multiplies
them anyway, paying 4x the reference MACs for full lane occupancy. The
round-2 per-op profile (benchmarks/NOTES.md speed-of-light table) put
~800us of the 4.58ms sampler step in these ops, with `s2d.blk_conv2` alone
at 637us (46% of peak on the inflated MACs = ~11.5% on reference math).

This kernel removes the inflation. The four output taps of one s2d pixel
jointly read a 4x4 window of ORIGINAL pixels, so the conv is a single
(16C -> 4Co) contraction per s2d pixel (ops/s2d.k3_to_s2d44 derivation):
1.78x reference MACs instead of 4x, at full MXU occupancy on both sides.
XLA can run that formulation too (ops/s2d.conv_s2d44) but needs the input
transposed back to the original layout first — a (50MB at the flagship
shape) HBM round trip per conv. Here the gather IS the kernel: each
program pulls one batch item's s2d tile into VMEM, assembles the
(H2*W2, 16C) im2col matrix with 16 in-VMEM tap-slice copies (zero-padded
edges == the 3x3 conv's SAME padding on the original grid), and issues one
MXU matmul against the reshaped (16C, 4Co) kernel. No d2s tensor ever
exists in HBM.

`tap_conv_pair` evaluates two convs that share an input (blk_conv1 +
blk_skip both read the stem output) off a single im2col build.

Equivalence with the dense-s2d path is pinned in tests/test_tap_conv.py
(interpret mode on CPU); adoption is measured on the real chip and
recorded in benchmarks/NOTES.md. Reference math being reproduced:
/root/reference/UNet_model_superres.py:110-172 (ResConvBlock convs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU/GPU-only; import lazily so CPU test envs still work
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False

# window position r (in the 4x4 original-pixel window) -> (row offset into
# the 1-zero-padded s2d tile, tap row index): original row 2i + r - 1 is
# s2d row i + p tap q with (p, q) = divmod(r - 1, 2); padded offset = p + 1.
_RS = {0: (0, 1), 1: (1, 0), 2: (1, 1), 3: (2, 0)}

# Piece order for the im2col concat, chosen so Mosaic never has to relayout:
# piece k (32 lanes wide) lands at lane offset 32*(k%4) in the 16C result,
# and its SOURCE (tap block tb at lane offset 32*tb of the input tile) must
# sit at the same offset — so order the 16 (r,s) window positions with
# tb = 2*qi(r)+qj(s) cycling 0,1,2,3. (The first attempt concatenated in
# (r,s) order; Mosaic rejected the mixed source offsets with 'result/input
# offset mismatch'.) The matmul weight rows are permuted to match (_w2d).
_BY_TB = {tb: [] for tb in range(4)}
for _r in range(4):
    for _s in range(4):
        _BY_TB[2 * _RS[_r][1] + _RS[_s][1]].append((_r, _s))
_ORDER = [_BY_TB[k % 4][k // 4] for k in range(16)]


def _w2d(w44: jax.Array) -> jax.Array:
    """(4,4,C,4Co) tap-structured kernel -> (16C, 4Co) matmul weight with
    rows in _ORDER (matching the im2col concat order)."""
    return jnp.concatenate([w44[r, s] for (r, s) in _ORDER], axis=0)


def col_variants(t: jax.Array):
    """Column-shift variants (cols -1..W-2 / 0..W-1 / 1..W) of a tile,
    built with roll+mask so every variant keeps SUBLANE OFFSET 0 — slicing
    the column (sublane) dim directly yields mismatched offsets that
    Mosaic's tpu.concatenate rejects ('result/input offset mismatch on
    non-concat dimension'). Shared by tap_conv and tap_block; this is the
    canonical home of the layout rule."""
    W = t.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
    cm1 = jnp.where(col > 0, jnp.roll(t, 1, axis=1), 0)
    cp1 = jnp.where(col < W - 1, jnp.roll(t, -1, axis=1), 0)
    return {0: cm1, 1: t, 2: cp1}


def _im2col_s2d44(tile: jax.Array) -> jax.Array:
    """(H2, W2, 4C) s2d tile -> (H2, W2, 16C) im2col channels for the 4x4
    stride-2 window, piece order _ORDER (see _w2d).

    Layout discipline (the whole point of this formulation): row shifts ride
    the untiled leading dim (free slices of the row-padded tile); column
    shifts via :func:`col_variants`; lane slices keep their native 32*tb
    offset which _ORDER makes equal to the destination offset."""
    H2, W2, C4 = tile.shape
    C = C4 // 4
    rp = jnp.pad(tile, ((1, 1), (0, 0), (0, 0)))  # s2d rows -1..H2
    variants = col_variants(rp)
    pieces = []
    for (r, s) in _ORDER:
        ar, qi = _RS[r]
        as_, qj = _RS[s]
        tb = 2 * qi + qj
        pieces.append(variants[as_][ar : ar + H2, :, tb * C : (tb + 1) * C])
    return jnp.concatenate(pieces, axis=-1)


def _tap_conv_kernel(x_ref, w_ref, out_ref):
    X = _im2col_s2d44(x_ref[0])
    out_ref[0] = jax.lax.dot_general(
        X, w_ref[:], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _tap_conv_pair_kernel(x_ref, wa_ref, wb_ref, outa_ref, outb_ref):
    X = _im2col_s2d44(x_ref[0])
    dn = (((2,), (0,)), ((), ()))
    outa_ref[0] = jax.lax.dot_general(
        X, wa_ref[:], dn, preferred_element_type=jnp.float32
    ).astype(outa_ref.dtype)
    outb_ref[0] = jax.lax.dot_general(
        X, wb_ref[:], dn, preferred_element_type=jnp.float32
    ).astype(outb_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tap_conv(x_s2d: jax.Array, w44: jax.Array, interpret: bool = False) -> jax.Array:
    """s2d-layout 3x3 SAME conv via the tap-structured Pallas kernel.

    x_s2d: (B, H2, W2, 4C); w44: (4,4,C,4Co) from ops/s2d.k3_to_s2d44.
    Returns (B, H2, W2, 4Co) == conv_s2d(x_s2d, k3_to_s2d(w), SAME).
    """
    B, H2, W2, C4 = x_s2d.shape
    C = C4 // 4
    co4 = w44.shape[3]
    w2d = _w2d(w44).astype(x_s2d.dtype)
    spec_x = pl.BlockSpec((1, H2, W2, C4), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, H2, W2, co4), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops = 2 * B * H2 * W2 * 16 * C * co4
    return pl.pallas_call(
        _tap_conv_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H2, W2, co4), x_s2d.dtype),
        grid=(B,),
        in_specs=[spec_x, spec_w],
        out_specs=spec_o,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x_s2d.size + B * H2 * W2 * co4 + w2d.size) * x_s2d.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_s2d, w2d)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tap_conv_pair(
    x_s2d: jax.Array, w44_a: jax.Array, w44_b: jax.Array, interpret: bool = False
):
    """Two tap-structured convs sharing one input (and one im2col build):
    returns (conv(x, a), conv(x, b))."""
    B, H2, W2, C4 = x_s2d.shape
    C = C4 // 4
    ca, cb = w44_a.shape[3], w44_b.shape[3]
    wa = _w2d(w44_a).astype(x_s2d.dtype)
    wb = _w2d(w44_b).astype(x_s2d.dtype)
    spec_x = pl.BlockSpec((1, H2, W2, C4), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops = 2 * B * H2 * W2 * 16 * C * (ca + cb)
    return pl.pallas_call(
        _tap_conv_pair_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, H2, W2, ca), x_s2d.dtype),
            jax.ShapeDtypeStruct((B, H2, W2, cb), x_s2d.dtype),
        ),
        grid=(B,),
        in_specs=[spec_x, spec_w, spec_w],
        out_specs=(
            pl.BlockSpec((1, H2, W2, ca), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2, W2, cb), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x_s2d.size + B * H2 * W2 * (ca + cb) + wa.size + wb.size)
            * x_s2d.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_s2d, wa, wb)
