"""Fused Pallas kernel for the s2d stage-2 attention gate + composed-head
attention branch (inference).

The round-3 post-`tap_block` profile (benchmarks/NOTES.md) shows the level-0
attention chain — gating signal, w_g/w_x/psi, sigmoid, broadcast multiply,
block-diagonal result conv + BN — as four standalone HBM-bound fusions
(~342 us/step at the flagship B=48 shape), followed by the 12-lane
``head_at`` conv (~152 us at 9.4% MXU lane occupancy). Every op is a 1x1
matmul or elementwise in s2d layout (ops/pallas_kernels.py derivation:
w_x's 2x2/s2 conv is one 4C-contraction, psi's nearest x2 upsample is a
broadcast over the taps, result_conv is block-diagonal), so the whole chain
fuses into ONE program with a single read of res0_s / h and a single packed
write:

    g      = relu(h @ Wgate' + bgate')        # gating signal, BN folded
    psi    = sigmoid(relu(g @ Wg + x @ Wx + b...) @ Wpsi + bpsi)
    attn_s = (x * psi) @ Wrc' + brc'          # result conv, BN folded
    out    = packed_conv3x3(attn_s, head_at)  # V=8 vertically packed

The trailing ``head_at`` conv (the composed head's attention branch,
models/unet.prepare_s2d_kernels) uses ops/packed_head's vertically-packed
matmul: 8 output rows share the lane dim (96 of 128 lanes instead of 12),
and since attn_s never leaves VMEM the packing's relayout cost is only the
tiny (B, H/8, W, 96) unpack outside. BatchNorms fold into the adjacent
matmul weights (inference affine).

Reference math being reproduced: the attention gate
/root/reference/UNet_model_superres.py:57-108, gating_signal :44-54, and
the head's attention-branch conv (the ``up_conv2``/``output`` composition's
attn half). Equivalence is pinned through the full model in
tests/test_att_block.py (interpret mode on CPU); on-chip adoption numbers
in benchmarks/NOTES.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from diffusionremotesensing_tpu.ops.packed_head import (
    V,
    _accum_packed_conv,
    kpack_weights,
)

try:  # pallas is TPU/GPU-only; import lazily so CPU test envs still work
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False


def att_block_fits_vmem(Hg: int, Wg: int, C4: int, Ch: int,
                        itemsize: int = 2) -> bool:
    """Whether :func:`att_head_block`'s per-sample program fits the ~16 MB
    scoped-VMEM stack. Conservative tally of the resident (1, Hg, Wg, *)
    buffers: the x/h input blocks, the gated/at/xp compute-dtype
    intermediates (~4 C4-planes), and the f32 dot outputs (the rc
    contraction at C4 lanes dominates; the g/a pair adds ~C4/2). Known-good
    on-chip at the flagship res0_s shape (64, 64, C4=128, Ch=64) — 4*32
    s2d lanes — at ~7.9 MB by this tally (tests/test_att_block.py pins it);
    whole-tile gate shapes (128^2 and up) blow the budget and Mosaic fails
    with "Scoped allocation ... limit 16.00M" instead of spilling, so
    callers fall back to the numerically-identical XLA chain
    (tests/test_att_block.py) when this returns False."""
    est = Hg * Wg * ((4 * C4 + Ch) * itemsize + 6 * C4)
    return est <= 15 * 2**20


def build_att_weights(
    wgate, bgate, bn_gate,     # (Ch,C) 1x1 gating conv, (C,), BN dict (C,)
    wg, bg,                    # (C,C) w_g, (C,)
    wx1, bx,                   # (1,1,4C,C) from ops/s2d.k2s2_to_1x1, (C,)
    wpsi, bpsi,                # (C,1), (1,)
    rc4, brc, bn_att,          # (1,1,4C,4C) block-diag result conv, (C,),
                               # BN dict per ORIGINAL channel (C,)
    wat,                       # (3,3,4C,out4) composed-head attn branch
    eps: float = 1e-5,
):
    """Fold the two inference BatchNorms and assemble the kernel weights
    (f32 — the caller casts to the compute dtype). BN folding: the gating
    BN into the gating conv, the attention-gate BN (tiled 4x over the s2d
    taps) into the result conv's columns."""
    sg = bn_gate["scale"] / jnp.sqrt(bn_gate["var"] + eps)
    tile = lambda v: jnp.tile(v, 4)  # noqa: E731
    sa = tile(bn_att["scale"] / jnp.sqrt(bn_att["var"] + eps))
    c = bg.shape[0]
    return {
        "gw": wgate.reshape(-1, c) * sg,
        "gb": (bgate - bn_gate["mean"]) * sg + bn_gate["bias"],
        "wg": wg.reshape(c, c),
        "bg": bg,
        "wx": wx1.reshape(-1, c),
        "bx": bx,
        "wpsi": wpsi.reshape(c, 1),
        "bpsi": bpsi.reshape(1),
        "rc": rc4.reshape(4 * c, 4 * c) * sa,
        "brc": (tile(brc) - tile(bn_att["mean"])) * sa + tile(bn_att["bias"]),
        "atp": kpack_weights(wat),
    }


def _att_head_kernel(
    x_ref,     # (1, Hg, Wg, 4C)  res0_s (s2d level-0 skip)
    h_ref,     # (1, Hg, Wg, Ch)  up_conv1 output (the gating input)
    gw_ref, gb_ref,      # (Ch, C), (1, C)   gating conv, BN folded
    wg_ref, bg_ref,      # (C, C), (1, C)
    wx_ref, bx_ref,      # (4C, C), (1, C)
    wpsi_ref, bpsi_ref,  # (C, 1), (1, 1)
    rc_ref, brc_ref,     # (4C, 4C), (1, 4C) result conv, BN folded
    atp_ref,             # ((V+2)*3*4C, V*out4) packed head_at weights
    out_ref,   # (1, GR, Wg, V*out4)
):
    _, Hg, Wg, C4 = x_ref.shape
    GR = out_ref.shape[1]
    dt = out_ref.dtype
    N = Hg * Wg
    f32 = jnp.float32
    dn = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)  # noqa: E731

    x = x_ref[0].reshape(N, C4)
    h2 = h_ref[0].reshape(N, h_ref.shape[3])

    g = jnp.maximum(dn(h2, gw_ref[:]) + gb_ref[0], 0.0).astype(dt)
    a = jnp.maximum(dn(g, wg_ref[:]) + bg_ref[0]
                    + dn(x, wx_ref[:]) + bx_ref[0], 0.0).astype(dt)
    psi = jax.nn.sigmoid(dn(a, wpsi_ref[:]) + bpsi_ref[0])
    gated = (x * psi.astype(dt)).astype(dt)
    at = (dn(gated, rc_ref[:]) + brc_ref[0]).astype(dt)

    # head_at as a V=8 vertically-packed 3x3 conv (packed_head discipline:
    # the group index and window slot ride the untiled leading dim)
    xp = jnp.pad(at.reshape(Hg, Wg, C4), ((1, 7), (0, 0), (0, 0)))
    acc = jnp.zeros((GR, Wg, out_ref.shape[3]), f32)
    acc = _accum_packed_conv(acc, xp, atp_ref, 3, 3, GR, 0)
    out_ref[0] = acc.astype(dt)


def unpack_v8(y: jax.Array, out4: int) -> jax.Array:
    """(B, GR, W, V*out4) packed rows -> (B, GR*V, W, out4) (tiny tensor —
    the XLA-side relayout is ~out4/4C of the kernel inputs' traffic)."""
    b, gr, w, _ = y.shape
    return (
        y.reshape(b, gr, w, V, out4)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, gr * V, w, out4)
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def att_head_block(x_s2d, h, w, interpret: bool = False):
    """Fused [gating2 + s2d attention gate + packed head_at] program.

    x_s2d (B,Hg,Wg,4C) the level-0 skip in s2d layout; h (B,Hg,Wg,Ch) the
    stage-1 concat-conv output; w from :func:`build_att_weights` (cast to
    the compute dtype by the caller's kernel-dict cast). Hg must be a
    multiple of 8 (whole packed groups — callers fall back to the XLA path
    otherwise). Returns the packed head_at contribution (B, Hg/8, Wg, V*out4);
    unpack with :func:`unpack_v8`."""
    B, Hg, Wg, C4 = x_s2d.shape
    no = w["atp"].shape[1]
    dt = x_s2d.dtype
    gr = Hg // V
    c = w["wg"].shape[0]
    row = lambda a, n: a.reshape(1, n).astype(dt)  # noqa: E731
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _att_head_kernel,
        out_shape=jax.ShapeDtypeStruct((B, gr, Wg, no), dt),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hg, Wg, C4), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, Wg, h.shape[3]), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [vspec] * 11,
        out_specs=pl.BlockSpec(
            (1, gr, Wg, no), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Hg * Wg * (
                w["gw"].shape[0] * c + c * c + C4 * c + c + C4 * C4
            ) + 2 * B * gr * Wg * w["atp"].shape[0] * no,
            bytes_accessed=(x_s2d.size + h.size + B * gr * Wg * no) * dt.itemsize,
            transcendentals=B * Hg * Wg,
        ),
        interpret=interpret,
    )(
        x_s2d,
        h.astype(dt),
        w["gw"].astype(dt), row(w["gb"], c),
        w["wg"].astype(dt), row(w["bg"], c),
        w["wx"].astype(dt), row(w["bx"], c),
        w["wpsi"].astype(dt), row(w["bpsi"], 1),
        w["rc"].astype(dt), row(w["brc"], C4),
        w["atp"].astype(dt),
    )
