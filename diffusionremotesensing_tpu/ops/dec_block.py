"""Fused Pallas kernel for the decoder tail at level 1/0 (inference).

The round-3 post-`tap_block`/`att_block` profile (benchmarks/NOTES.md) puts
~1.13 ms of the 4.45 ms sampler step in the chain

    h   = conv3x3(concat(up1_out, attn1)) + b      # stage-1 concat conv,
                                                   # 602 us at its 64-lane
                                                   # MXU ceiling
    hh  = relu(BN(conv3x3(h + te) + b))            # UpConvBlock-2 body,
                                                   # 193 us + a 73 us copy
    out = conv4x4(hh, head_up4, pad (1,2))         # composed head, 266 us
                                                   # at 12 of 128 lanes

with two (B,64,64,64) intermediates round-tripping HBM between the fusions.
This kernel computes the whole chain in one program per batch item: the two
3x3s as column-shift-variant accumulating matmuls (64-lane operands pair
two variants into one 128-lane contraction — ops/packed_head discipline),
the head as a V=8 vertically-packed matmul (96 output lanes instead of 12),
and the UpConvBlock BatchNorm folded into the conv weights. Four outputs:
``h`` (the gating branch still needs it in HBM), the packed head
contribution, and the first row/column of ``hh`` (the boundary-fix strip
convs stay outside — they are tiny and shape-dependent).

Reference math being reproduced: the up-stage concat conv
(/root/reference/UNet_model_superres.py:351-379 ``up_conv`` applications),
UpConvBlock (:174-207), and the head composition derived in
models/unet.prepare_s2d_kernels. Equivalence pinned at kernel/model/
sampler/mesh levels in tests/test_dec_block.py (interpret mode on CPU);
on-chip adoption numbers in benchmarks/NOTES.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from diffusionremotesensing_tpu.ops.packed_head import (
    V,
    _accum_packed_conv,
    _col_shift_variants,
    kpack_weights,
)

try:  # pallas is TPU/GPU-only; import lazily so CPU test envs still work
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False


def _pair3(w3):
    """(3,3,C,Co) -> column-paired matmul blocks: ((3,2C,Co) for the dx=0/1
    variant pair, (3,C,Co) for dx=2) — matches the kernel's paired
    column-shift contraction for sub-128-lane inputs."""
    return (
        jnp.concatenate([w3[:, 0], w3[:, 1]], axis=1),
        w3[:, 2],
    )


def dec_block_fits_vmem(H: int, W: int, Ca: int, Cb: int, Cm: int,
                        itemsize: int = 2) -> bool:
    """Whether :func:`dec_block`'s per-sample program fits the ~16 MB
    scoped-VMEM stack. Conservative tally of the resident (1, H, W, *)
    buffers: each conv input plus its three column-shift variants (~4
    planes apiece for xa/xb and the h/hp/hh/xp chain at Cm), and the two
    f32 accumulators. Known-good on-chip at the flagship
    (64, 64, Ca=128, Cb=64, Cm=64) shape (~11 MB by this tally);
    whole-tile gate shapes exceed the budget and crash Mosaic instead of
    spilling, so callers fall back to the numerically-identical XLA chain
    (tests/test_dec_block.py) when this returns False."""
    est = H * W * ((4 * Ca + 4 * Cb + 5 * Cm) * itemsize + 8 * Cm)
    return est <= 15 * 2**20


def build_dec_weights(w_uc1, b_uc1, ca, w_up2, b_up2, bn_up2, k4, eps=1e-5):
    """Assemble the kernel weights (f32; the caller's kernel-dict cast
    applies the compute dtype).

    w_uc1 (3,3,Ca+Cb,Cm) the stage-1 concat conv; ``ca`` the up-branch
    channel count (the concat order is [up1_out, attn1]); w_up2/b_up2 +
    bn_up2 the UpConvBlock-2 conv with its inference BatchNorm to fold;
    k4 (4,4,Cm,out4) the composed head_up4 kernel."""
    s = bn_up2["scale"] / jnp.sqrt(bn_up2["var"] + eps)
    wb = w_up2 * s
    bb = (b_up2 - bn_up2["mean"]) * s + bn_up2["bias"]
    wbp, wbl = _pair3(wb)
    wap, wal = _pair3(w_uc1[:, :, ca:])
    return {
        "wau": w_uc1[:, :, :ca],   # (3,3,Ca,Cm) — Ca >= 128, unpaired
        "wap": wap,                # attn-branch columns, paired / last
        "wal": wal,
        "ba": b_uc1,
        "wbp": wbp,
        "wbl": wbl,
        "bb": bb,
        "k4p": kpack_weights(k4),
    }


def _accum_conv3(acc, xpad, n, w9=None, wp=None, wl=None):
    """3x3 SAME conv accumulation over a (n+2)-row zero-padded tile via
    column-shift variants and static row slices. Full-lane inputs (w9:
    (3,3,C,Co), C >= 128) contract per (dr,dc); narrower inputs pair the
    dx=0/1 variants into one 128-lane contraction (wp (3,2C,Co) + wl
    (3,C,Co) from :func:`_pair3`)."""
    dn = (((2,), (0,)), ((), ()))
    cvs = _col_shift_variants(xpad, 3)
    if w9 is not None:
        for dr in range(3):
            for dc in range(3):
                acc = acc + jax.lax.dot_general(
                    cvs[dc][dr : dr + n], w9[dr, dc], dn,
                    preferred_element_type=jnp.float32,
                )
        return acc
    pair = jnp.concatenate(cvs[0:2], axis=-1)
    for dr in range(3):
        acc = acc + jax.lax.dot_general(
            pair[dr : dr + n], wp[dr], dn, preferred_element_type=jnp.float32
        )
        acc = acc + jax.lax.dot_general(
            cvs[2][dr : dr + n], wl[dr], dn, preferred_element_type=jnp.float32
        )
    return acc


def _dec_kernel(
    xa_ref,    # (1, H, W, Ca)   up1 ConvTranspose output
    xb_ref,    # (1, H, W, Cb)   attention-1 output
    te_ref,    # (1, 1, Cm)      relu'd UpConvBlock-2 time bias, row b
    wau_ref, wap_ref, wal_ref, ba_ref,   # concat conv (see build_dec_weights)
    wbp_ref, wbl_ref, bb_ref,            # UpConvBlock conv, BN folded
    k4p_ref,                             # ((V+3)*4*Cm, V*out4) packed head
    h_ref,     # (1, H, W, Cm)   stage-1 concat-conv output (gating input)
    hr0_ref,   # (1, 1, W, Cm)   hh row 0  (boundary-fix strip)
    hc0_ref,   # (1, H, 1, Cm)   hh col 0  (boundary-fix strip)
    outp_ref,  # (1, H//V, W, V*out4) packed head_up4(hh)
):
    _, H, W, _ = xa_ref.shape
    Cm = h_ref.shape[3]
    GR = outp_ref.shape[1]
    dt = h_ref.dtype
    f32 = jnp.float32

    # ---- stage-1 concat conv: two contraction groups over one accumulator
    acc = jnp.zeros((H, W, Cm), f32)
    acc = _accum_conv3(
        acc, jnp.pad(xa_ref[0], ((1, 1), (0, 0), (0, 0))), H, w9=wau_ref[:]
    )
    acc = _accum_conv3(
        acc, jnp.pad(xb_ref[0], ((1, 1), (0, 0), (0, 0))), H,
        wp=wap_ref[:], wl=wal_ref[:],
    )
    h = (acc + ba_ref[0]).astype(dt)
    h_ref[0] = h

    # ---- UpConvBlock-2 body: time bias, conv, BN (folded), relu
    hp = jnp.pad((h + te_ref[0, 0, :]).astype(dt), ((1, 1), (0, 0), (0, 0)))
    acc2 = jnp.zeros((H, W, Cm), f32)
    acc2 = _accum_conv3(acc2, hp, H, wp=wbp_ref[:], wl=wbl_ref[:])
    hh = jnp.maximum(acc2 + bb_ref[0], 0.0).astype(dt)
    hr0_ref[0] = hh[0:1]
    hc0_ref[0] = hh[:, 0:1, :]

    # ---- composed head as a V=8 vertically-packed 4x4 conv, pad ((1,2),(1,2))
    xp = jnp.pad(hh, ((1, 7), (0, 0), (0, 0)))
    accp = jnp.zeros((GR, W, outp_ref.shape[3]), f32)
    accp = _accum_packed_conv(accp, xp, k4p_ref, 4, 4, GR, 0)
    outp_ref[0] = accp.astype(dt)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dec_block(xa, xb, te, w, interpret: bool = False):
    """Fused decoder tail: xa (B,H,W,Ca) the stage-1 ConvTranspose output,
    xb (B,H,W,Cb) the attention-1 output, te (B,Cm) the relu'd UpConvBlock-2
    time bias, w from :func:`build_dec_weights`. H must be a multiple of 8
    (whole packed head groups — callers fall back to the XLA path
    otherwise). Returns (h, hh_row0, hh_col0, packed_head_up4); unpack the
    last with ops/att_block.unpack_v8."""
    B, H, W, _ = xa.shape
    Cm = w["ba"].shape[0]
    no = w["k4p"].shape[1]
    gr = H // V
    dt = xa.dtype
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    item = lambda c: pl.BlockSpec(  # noqa: E731
        (1, H, W, c), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _dec_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, Cm), dt),
            jax.ShapeDtypeStruct((B, 1, W, Cm), dt),
            jax.ShapeDtypeStruct((B, H, 1, Cm), dt),
            jax.ShapeDtypeStruct((B, gr, W, no), dt),
        ),
        grid=(B,),
        in_specs=[
            item(xa.shape[3]),
            item(xb.shape[3]),
            pl.BlockSpec((1, 1, Cm), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ] + [vspec] * 8,
        out_specs=(
            item(Cm),
            pl.BlockSpec((1, 1, W, Cm), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, 1, Cm), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gr, W, no), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * (xa.shape[3] + xb.shape[3] + Cm) * Cm
            + 2 * B * gr * W * w["k4p"].shape[0] * no,
            bytes_accessed=(xa.size + xb.size + B * H * W * Cm
                            + B * gr * W * no) * dt.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xa,
        xb.astype(dt),
        te.astype(dt)[:, None, :],
        w["wau"].astype(dt), w["wap"].astype(dt), w["wal"].astype(dt),
        w["ba"].reshape(1, Cm).astype(dt),
        w["wbp"].astype(dt), w["wbl"].astype(dt),
        w["bb"].reshape(1, Cm).astype(dt),
        w["k4p"].astype(dt),
    )
