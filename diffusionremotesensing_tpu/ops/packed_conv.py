"""V-packed Pallas 3x3 SAME conv for narrow-output layers (Co <= 64).

The flagship UNet's level-1 convs emit 64 channels — 50% MXU lane occupancy
is their hard ceiling, and the round-2 speed-of-light profile has them well
under even that (`conv_block1.conv2` 64->64 @64²: 336us = 22% of bf16 peak;
`up_conv1` 192->64 @64²: 603us = 37%; benchmarks/NOTES.md). Reference
layers: /root/reference/UNet_model_superres.py:120-142 (ResConvBlock conv2),
:357-361 (up_conv1). Parity forbids widening the channels, but the OUTPUT
PIXELS can be packed instead: V vertically-adjacent output rows share lanes
(V*Co <= 128), turning the conv into slot-structured matmuls

    X[(G, w), (s, dx, ch)] @ W[(s, dx, ch), (j, o)],  W row hit iff 0<=s-j<KH

(same algebra as ops/packed_head.kpack_weights, V=2 here) at
(V+KH-1)/KH = 1.33x the reference MACs for 2x the lane width — net ~1.5x at
equal MXU efficiency, more when XLA's narrow-conv selection is far off peak.

Layout discipline (ops/tap_conv.col_variants / ops/packed_head rules):
vertical packing rides the LEADING (untiled) dim, so every im2col piece is a
static leading-dim slice of a whole-tile column-shift variant (roll+mask) —
no sublane->lane relayouts exist in the kernel. Per slot the kw variants
concatenate into one (<=128*kw)-lane tensor contracted by a single matmul.

Exactness is pinned against the XLA conv in tests/test_packed_conv.py
(interpret mode on CPU). MEASURED NEGATIVE standalone at the level-1
flagship shapes (0.75x / 1.02x vs the XLA conv — the per-slot concat's
non-128 lane widths and the V=2 slot fragmentation cost more than the lane
win buys; benchmarks/NOTES.md round-3) — not wired into the model; kept as
validated infrastructure for genuinely low-occupancy shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from diffusionremotesensing_tpu.ops.packed_head import (
    _col_shift_variants,
    kpack_weights,
)

try:  # pallas is TPU/GPU-only; import lazily so CPU test envs still work
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False


def _packed_conv_kernel(x_ref, w_ref, *rest, v: int, kh: int, kw: int):
    b_ref, out_ref = rest if len(rest) == 2 else (None, rest[0])
    n_g = out_ref.shape[1]
    w_dim = x_ref.shape[2]

    # leading-dim pad: padded row r' = input row r' - (kh//2) (SAME top
    # padding); rows >= H + kh//2 are zeros (conv bottom pad + dead rows
    # that exist only for the v-row reshape). Total padded rows must equal
    # (n_g+1)*v; the highest slot reads padded row H+kh-2, so v >= kh-1.
    assert v >= kh - 1, (v, kh)
    xp = jnp.pad(x_ref[0], ((kh // 2, v - kh // 2), (0, 0), (0, 0)))
    cvs = _col_shift_variants(xp, kw)
    # one (kw*C)-lane tensor per slot-slice: a single matmul per slot
    cat = jnp.concatenate(cvs, axis=-1)
    parts = cat.reshape(n_g + 1, v, w_dim, cat.shape[-1])
    acc = jnp.zeros((n_g, w_dim, out_ref.shape[3]), jnp.float32)
    dn = (((2,), (0,)), ((), ()))
    ck = cat.shape[-1]
    for s in range(v + kh - 1):
        g0, a = divmod(s, v)
        acc += jax.lax.dot_general(
            parts[g0 : g0 + n_g, a], w_ref[s * ck : (s + 1) * ck],
            dn, preferred_element_type=jnp.float32,
        )
    if b_ref is not None:
        acc += b_ref[...].astype(jnp.float32)  # (1, v*Co) broadcasts
    out_ref[0] = acc.astype(out_ref.dtype)


def pack_conv_weights(k: jax.Array, v: int) -> jax.Array:
    """(KH,KW,Ci,Co) SAME-conv kernel -> packed matmul weight whose row
    order matches the kernel's per-slot concat: (s, dx, ch) with the kw
    column variants concatenated within each slot."""
    return kpack_weights(k, v=v)


@functools.partial(jax.jit, static_argnames=("v", "kh", "kw", "interpret"))
def packed_conv(x, wp, v: int, kh: int = 3, kw: int = 3, bias=None,
                interpret: bool = False):
    """V-packed SAME conv: x (B,H,W,Ci) * packed weight wp (from
    :func:`pack_conv_weights` of a (kh,kw,Ci,Co) kernel). H must be a
    multiple of ``v``. ``bias``, if given, is the (Co,) conv bias — added
    in-kernel (pass the UNPACKED bias; it is tiled v-fold here). Returns
    (B,H,W,Co), accumulated in f32."""
    b, h_dim, w_dim, ci = x.shape
    no = wp.shape[1]               # v * Co
    co = no // v
    gr = h_dim // v
    dt = x.dtype
    operands = [x, wp.astype(dt)]
    in_specs = [
        pl.BlockSpec((1, h_dim, w_dim, ci), lambda bb: (bb, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if bias is not None:
        operands.append(jnp.tile(bias, v).reshape(1, no).astype(dt))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    y = pl.pallas_call(
        functools.partial(_packed_conv_kernel, v=v, kh=kh, kw=kw),
        out_shape=jax.ShapeDtypeStruct((b, gr, w_dim, no), dt),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, gr, w_dim, no), lambda bb: (bb, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * gr * w_dim * wp.shape[0] * no,
            bytes_accessed=(x.size + b * h_dim * w_dim * co) * dt.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    # unpack: y[b, G, w, j*Co+o] -> out[b, vG+j, w, o]
    return (
        y.reshape(b, gr, w_dim, v, co)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, h_dim, w_dim, co)
    )
