"""Space-to-depth execution of narrow-channel conv levels (TPU layout fix).

Motivation (measured, TPU v5e, see benchmarks/NOTES.md round-2 section): at
the UNet's full-resolution level the feature maps have 3-32 channels, and
every conv there runs at 0.3-4% MFU — the 128-wide MXU lanes and (8,128)
vector tiling are mostly padding. The op_profile trace attributes ~64% of a
sampler step to this level (conv_block0/conv2 alone is 21.8%).

Fix: evaluate the whole level in space-to-depth (s2d) layout — x viewed as
(B, H/2, W/2, 4C) with the 2x2 pixel taps stacked on the channel axis — so
channel counts quadruple (12/64/128 lanes) while the math stays EXACTLY the
reference computation. Parameters are untouched (parity contract); the
equivalent s2d kernels are assembled from the original kernels at trace time
by the transforms below. Each transform is validated against the direct
lax op in tests/test_s2d.py.

Layout convention: tap index t = 2*di + dj for offsets (di, dj) in {0,1}^2,
    x[b, 2i+di, 2j+dj, c] == s2d(x)[b, i, j, t*C + c].

Kernel transforms (W is HWIO; derivations in comments):
  * 3x3 stride-1 SAME     -> 3x3 s2d conv, (3,3,4Ci,4Co), SAME  (4x MACs)
  * 1x1                   -> block-diagonal 1x1, (1,1,4Ci,4Co)  (4x MACs)
  * 3x3 stride-2 pad-1    -> 2x2 s2d conv, (2,2,4Ci,Co), pad (1,0) (0.9x)
  * 2x2 stride-2 pad-0    -> 1x1 s2d conv, (1,1,4Ci,Co)         (1x MACs)
  * ConvTranspose k3s2p1op1 (as the lhs-dilated kernel of
    models/blocks.ConvTranspose2x) -> 2x2 conv, (2,2,Ci,4Co), pad (0,1) (1.8x)

The MAC inflation buys full MXU lanes; measured net wins in NOTES.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "space_to_depth",
    "depth_to_space",
    "s2d_concat",
    "k3_to_s2d",
    "k3_to_s2d44",
    "k1_to_blockdiag",
    "k3s2_to_s2d",
    "k2s2_to_1x1",
    "kT_to_s2d",
    "kdown_to_s2d_out",
    "conv_s2d",
    "conv_s2d44",
]


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), taps ordered (0,0),(0,1),(1,0),(1,1)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, h2, w2, di, dj, c)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """(B, H2, W2, 4C) -> (B, 2*H2, 2*W2, C)."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h2, 2 * w2, c)


def s2d_concat(a: jax.Array, b: jax.Array) -> jax.Array:
    """Channel-concat of two s2d tensors == s2d of the channel-concat.

    Taps are the outer grouping of the s2d channel axis, so a plain concat
    would interleave wrongly; concat per tap instead."""
    B, H, W, ca4 = a.shape
    cb4 = b.shape[-1]
    ar = a.reshape(B, H, W, 4, ca4 // 4)
    br = b.reshape(B, H, W, 4, cb4 // 4)
    return jnp.concatenate([ar, br], axis=-1).reshape(B, H, W, ca4 + cb4)


def _tile_taps(v: jax.Array) -> jax.Array:
    """Per-channel vector (C,) -> (4C,) tiled over the 4 taps."""
    return jnp.tile(v, 4)


def k3_to_s2d(w: jax.Array) -> jax.Array:
    """3x3 stride-1 SAME conv kernel (3,3,Ci,Co) -> s2d kernel (3,3,4Ci,4Co).

    out[2i+di, 2j+dj] = sum_{u,v} W[u,v] x[2i+di+u-1, 2j+dj+v-1]: the input
    row 2i+di+u-1 = 2(i+p)+qi with p = floor((di+u-1)/2), qi = (di+u-1)%2,
    so each original tap (u, di) lands at s2d position p (in {-1,0,1}) and
    input tap qi. 75% of the s2d kernel is structurally zero — the MXU
    multiplies them anyway, trading 4x MACs for 4x lane occupancy."""
    ci, co = w.shape[2], w.shape[3]
    ws = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for di in range(2):
        for u in range(3):
            p, qi = divmod(di + u - 1, 2)
            for dj in range(2):
                for v in range(3):
                    q, qj = divmod(dj + v - 1, 2)
                    ti, to = 2 * qi + qj, 2 * di + dj
                    ws = ws.at[
                        p + 1, q + 1, ti * ci : (ti + 1) * ci, to * co : (to + 1) * co
                    ].add(w[u, v])
    return ws


def k3_to_s2d44(w: jax.Array) -> jax.Array:
    """3x3 stride-1 SAME conv kernel (3,3,Ci,Co) -> TAP-STRUCTURED stride-2
    kernel (4,4,Ci,4Co), applied to the ORIGINAL-layout input with stride 2
    and padding (1,1); the output is directly in s2d (tap-stacked) layout.

    The four output taps of one s2d pixel jointly read only a 4x4 window of
    original pixels (rows 2i-1..2i+2): output tap t = 2*di+dj at s2d pixel
    (i,j) is sum_{u,v} W[u,v] x[2i+di+u-1, 2j+dj+v-1], so window position
    (r,s) = (di+u, dj+v) carries W[r-di, s-dj] into output block t. This
    costs 4*4*Ci*4Co = 64*Ci*Co MACs per s2d pixel = **1.78x the reference
    math** — vs 4x for the dense s2d kernel of :func:`k3_to_s2d` — while
    keeping full MXU occupancy (16Ci contraction, 4Co output lanes)."""
    ci, co = w.shape[2], w.shape[3]
    ws = jnp.zeros((4, 4, ci, 4 * co), w.dtype)
    for di in range(2):
        for dj in range(2):
            t = 2 * di + dj
            for u in range(3):
                for v in range(3):
                    ws = ws.at[di + u, dj + v, :, t * co : (t + 1) * co].set(w[u, v])
    return ws


def conv_s2d44(x_s2d, w44, dtype=None):
    """Tap-structured evaluation of a level-0 3x3 SAME conv: depth-to-space
    back to the original layout, then ONE stride-2 4x4 conv (kernel from
    :func:`k3_to_s2d44`) emitting the tap-stacked s2d output. Equals
    ``conv_s2d(x_s2d, k3_to_s2d(w), SAME)`` exactly (tests/test_s2d.py)
    at 2.25x fewer MACs; the d2s transpose is the price (fused away by the
    Pallas variant in ops/tap_conv.py)."""
    dt = dtype or x_s2d.dtype
    x = depth_to_space(x_s2d.astype(dt))
    return jax.lax.conv_general_dilated(
        x,
        w44.astype(dt),
        window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def k1_to_blockdiag(w: jax.Array) -> jax.Array:
    """1x1 conv kernel (1,1,Ci,Co) -> block-diagonal (1,1,4Ci,4Co)."""
    ci, co = w.shape[2], w.shape[3]
    ws = jnp.zeros((1, 1, 4 * ci, 4 * co), w.dtype)
    for t in range(4):
        ws = ws.at[0, 0, t * ci : (t + 1) * ci, t * co : (t + 1) * co].set(w[0, 0])
    return ws


def k3s2_to_s2d(w: jax.Array) -> jax.Array:
    """3x3 stride-2 pad-1 conv kernel (3,3,Ci,Co) -> (2,2,4Ci,Co), to be
    applied with padding ((1,0),(1,0)) at stride 1 on the s2d input
    (the conv output is already at the s2d grid resolution).

    out[i,j] reads input rows 2i-1..2i+1 = s2d rows {(i-1, tap1), (i, tap0),
    (i, tap1)} -> window p in {-1, 0}."""
    ci, co = w.shape[2], w.shape[3]
    ws = jnp.zeros((2, 2, 4 * ci, co), w.dtype)
    for u in range(3):
        p, qi = divmod(u - 1, 2)
        for v in range(3):
            q, qj = divmod(v - 1, 2)
            ti = 2 * qi + qj
            ws = ws.at[p + 1, q + 1, ti * ci : (ti + 1) * ci, :].add(w[u, v])
    return ws


def k2s2_to_1x1(w: jax.Array) -> jax.Array:
    """2x2 stride-2 pad-0 conv kernel (2,2,Ci,Co) -> (1,1,4Ci,Co): the 2x2
    window IS one s2d block, so the conv is a single matmul over 4Ci."""
    ci, co = w.shape[2], w.shape[3]
    ws = jnp.zeros((1, 1, 4 * ci, co), w.dtype)
    for di in range(2):
        for dj in range(2):
            t = 2 * di + dj
            ws = ws.at[0, 0, t * ci : (t + 1) * ci, :].set(w[di, dj])
    return ws


def kT_to_s2d(k: jax.Array) -> jax.Array:
    """ConvTranspose2x kernel (3,3,Ci,Co) (the lhs-dilated formulation of
    models/blocks.ConvTranspose2x: conv(x, k, lhs_dilation=2, pad (1,2)))
    -> (2,2,Ci,4Co), to be applied at stride 1 with padding ((0,1),(0,1))
    on the NORMAL-layout input, producing the s2d-layout x2 output.

    1D derivation: out[2i]   = K[1] x[i]
                   out[2i+1] = K[0] x[i] + K[2] x[i+1]
    so tap di=0 uses (p=0, K[1]); di=1 uses (p=0, K[0]) and (p=1, K[2])."""
    ci, co = k.shape[2], k.shape[3]
    # per output tap d: list of (p, u) pairs
    taps = {0: [(0, 1)], 1: [(0, 0), (1, 2)]}
    ws = jnp.zeros((2, 2, ci, 4 * co), k.dtype)
    for di in range(2):
        for dj in range(2):
            t = 2 * di + dj
            for (p, u) in taps[di]:
                for (q, v) in taps[dj]:
                    ws = ws.at[p, q, :, t * co : (t + 1) * co].add(k[u, v])
    return ws


def kdown_to_s2d_out(w2: jax.Array) -> jax.Array:
    """Down-conv s2d kernel (2,2,4Ci,Co) (from :func:`k3s2_to_s2d`) ->
    (3,3,4Ci,4Co) emitting the SPACE-TO-DEPTH of the down conv's output:
    apply at stride (2,2) with padding ((1,0),(1,0)) on the s2d input.

    Derivation: output tap (di,dj) of s2d-out pixel (I,J) is the down conv's
    output at (2I+di, 2J+dj) = sum_{p,q in 0,1} W2[p,q] x_s2d[2I+di-1+p, ...],
    so window position r = di+p in {0,1,2} carries W2[r-di, s-dj] into output
    tap block 2di+dj. MACs: 9/8 of the (2,2) form (1.14x the reference
    stride-2 conv) for 4x output-lane occupancy — the down conv's output
    channel count (32 at level 0) is the narrowest tensor in the s2d tail."""
    ci4, co = w2.shape[2], w2.shape[3]
    ws = jnp.zeros((3, 3, ci4, 4 * co), w2.dtype)
    for di in range(2):
        for dj in range(2):
            t = 2 * di + dj
            for p in range(2):
                for q in range(2):
                    ws = ws.at[di + p, dj + q, :, t * co : (t + 1) * co].set(
                        w2[p, q]
                    )
    return ws


def conv_s2d(x, w, padding, dtype=None, strides=(1, 1)):
    """conv helper in NHWC/HWIO with explicit padding (stride 1 default)."""
    dt = dtype or x.dtype
    return jax.lax.conv_general_dilated(
        x.astype(dt),
        w.astype(dt),
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
