"""Vertically-packed Pallas kernel for the s2d composed head convs.

The s2d tail ends in two convs with only ``out4 = 12`` output channels —
``head_up4`` (the head composed through up2's ConvTranspose: 4x4, 64ch in)
and ``head_at`` (the head's attention branch: 3x3, 4*32ch in), both derived
in ``models/unet.prepare_s2d_kernels`` from the reference layers
/root/reference/UNet_model_superres.py:174-178 (``output`` 1x1),
:331-333 (``up_conv2``) and :57-108 (attention gate). 12 output lanes is
9.4% MXU lane occupancy; the round-2/3 profiles put the pair at ~500us of
the 4.45ms sampler step (~15% of bf16 peak — the single worst-occupancy op
group left).

This kernel packs V=8 VERTICALLY-adjacent output pixels into the lane dim
(96 of 128 lanes, 8x the occupancy). For one packed output row group
G (output rows 8G..8G+7), the 8 pixels' conv windows jointly read rows
8G-1..8G+KH+6, so each window row sits at a "slot" s = j + dy (j = packed
index, dy = kernel row): the conv becomes ONE matmul

    X[(G, w), (s, dx, ch)] @ W[(s, dx, ch), (j, o)],  W row hit iff 0<=s-j<KH

with (V+KH-1)/KH x the reference MACs (2.75x for the 4x4, 3.33x for the
3x3) at 8x the lane width — ~2.5x net at equal MXU efficiency, and the two
convs share one kernel (single accumulator, no HBM round trip between).

Vertical (not horizontal) packing is what makes the gather free: the packed
group index G and slot s both ride the LEADING (untiled) dim — after a
leading-dim pad and a (rows/8, 8, W, C) leading reshape, every im2col piece
is a static leading-dim slice of a column-shift variant (roll+mask, the
ops/tap_conv.col_variants discipline). No sublane->lane relayout exists in
the kernel (Mosaic cannot lower those — measured, benchmarks/NOTES.md
round-3 packed-head entry).

Exactness is pinned against the XLA conv pair in tests/test_packed_head.py
and through the model in tests/test_s2d_model.py (interpret mode on CPU).
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

V = 8  # vertical packing factor: 8 * out4(12) = 96 lanes


def kpack_weights(k: jax.Array, v: int = V) -> jax.Array:
    """(KH,KW,Ci,Co) conv kernel -> (S*KW*Ci, v*Co) packed matmul weight,
    S = v+KH-1 slots; row (s,dx,ch) feeds output (j,o) with k[s-j,dx,ch,o]
    when 0 <= s-j < KH (zero otherwise — the packing's MAC overhead)."""
    kh, kw, ci, co = k.shape
    s = v + kh - 1
    w = jnp.zeros((s, kw, ci, v, co), k.dtype)
    for j in range(v):
        for dy in range(kh):
            w = w.at[j + dy, :, :, j, :].set(k[dy])
    return w.reshape(s * kw * ci, v * co)


def _col_shift_variants(t: jax.Array, kw: int):
    """kw column-shift variants V_dx[h, w] = t[h, w + dx - 1] (zero outside
    [0, W) — the conv's horizontal SAME/(1,2) padding), built as whole-tile
    roll+mask so every variant keeps sublane offset 0 (the
    ops/tap_conv.col_variants layout rule)."""
    w_dim = t.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w_dim, 1), 1)
    out = []
    for dx in range(kw):
        off = dx - 1
        if off == 0:
            out.append(t)
        elif off < 0:
            out.append(jnp.where(col >= -off, jnp.roll(t, -off, axis=1), 0))
        else:
            out.append(jnp.where(col < w_dim - off, jnp.roll(t, -off, axis=1), 0))
    return out


def _accum_packed_conv(acc, xp, w_ref, kh: int, kw: int, n_g: int, k0: int):
    """Accumulate the packed conv of row-padded tile xp (n_g*8+8, W, C)
    against w_ref rows [k0, k0+S*kw*C). Instead of materializing the im2col
    matrix (measured: the concat's lane-offset relayouts dominate), this
    issues one K=128-wide accumulating matmul per (slot, column-variant)
    piece — each piece a FREE static leading-dim slice of a column-shift
    variant (the reshape splits only the untiled leading dim). For 64-lane
    inputs the kw variants are pre-paired into 128-lane tensors so every
    matmul contracts a full 128-lane tile at lane offset 0."""
    w_dim, c = xp.shape[1], xp.shape[2]
    cvs = _col_shift_variants(xp, kw)
    if c < 128 and kw % 2 == 0:
        cvs = [
            jnp.concatenate(cvs[i : i + 2], axis=-1) for i in range(0, kw, 2)
        ]
    parts = [v.reshape(n_g + 1, 8, w_dim, v.shape[-1]) for v in cvs]
    dn = (((2,), (0,)), ((), ()))
    k = k0
    for s in range(V + kh - 1):
        g0, a = divmod(s, 8)
        for p in parts:
            ck = p.shape[-1]
            acc += jax.lax.dot_general(
                p[g0 : g0 + n_g, a], w_ref[k : k + ck],
                dn, preferred_element_type=jnp.float32,
            )
            k += ck
    return acc


def _packed_head_kernel(hh_ref, at_ref, w1_ref, w2_ref, out_ref):
    n_g = out_ref.shape[1]
    no = out_ref.shape[3]
    w_dim = hh_ref.shape[2]

    # leading-dim pad: padded row r' = input row r'-1 (top conv padding);
    # rows >= H+1 are dead zeros that exist only for the 8-row reshape
    hh = jnp.pad(hh_ref[0], ((1, 7), (0, 0), (0, 0)))
    at = jnp.pad(at_ref[0], ((1, 7), (0, 0), (0, 0)))
    acc = jnp.zeros((n_g, w_dim, no), jnp.float32)
    acc = _accum_packed_conv(acc, hh, w1_ref, 4, 4, n_g, 0)
    acc = _accum_packed_conv(acc, at, w2_ref, 3, 3, n_g, 0)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def packed_head(hh, attn_s, w1p, w2p, interpret: bool = False):
    """Fused packed evaluation of the two composed-head convs:

        conv(hh, head_up4, pad ((1,2),(1,2))) + conv(attn_s, head_at, SAME)

    hh (B,H,W,C1), attn_s (B,H,W,C2); w1p/w2p from :func:`kpack_weights` of
    the (4,4,C1,out4) / (3,3,C2,out4) kernels. H must be a multiple of 8
    (whole packed groups). Returns (B,H,W,out4)."""
    b, h_dim, w_dim, c1 = hh.shape
    no = w1p.shape[1]          # V * out4
    out4 = no // V
    gr = h_dim // V
    dt = hh.dtype
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        _packed_head_kernel,
        out_shape=jax.ShapeDtypeStruct((b, gr, w_dim, no), dt),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h_dim, w_dim, c1), lambda bb: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim, w_dim, attn_s.shape[3]),
                         lambda bb: (bb, 0, 0, 0), memory_space=pltpu.VMEM),
            vspec, vspec,
        ],
        out_specs=pl.BlockSpec(
            (1, gr, w_dim, no), lambda bb: (bb, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * gr * w_dim * (w1p.shape[0] + w2p.shape[0]) * no,
            bytes_accessed=(hh.size + attn_s.size + b * h_dim * w_dim * out4)
            * dt.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(hh, attn_s, w1p.astype(dt), w2p.astype(dt))
    # unpack: y[b, G, w, j*out4+o] -> out[b, 8G+j, w, o] (tiny tensor — the
    # XLA-side relayout is ~out4/C of the conv inputs' traffic)
    return (
        y.reshape(b, gr, w_dim, V, out4)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, h_dim, w_dim, out4)
    )
