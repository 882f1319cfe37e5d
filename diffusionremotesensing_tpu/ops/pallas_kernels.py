"""Fused Pallas TPU kernels for the UNet's hot blocks.

The additive attention gate (/root/reference/UNet_model_superres.py:57-108,
rebuilt in models/blocks.py:AttentionGate) is a chain of small memory-bound
ops — four 1x1/2x2 convs, add, ReLU, sigmoid, nearest x2 upsample, broadcast
multiply, BatchNorm — each of which can round-trip HBM at XLA's fusion
boundaries (convolutions are fusion barriers). This kernel computes the
whole gate in VMEM with one read of x, one read of g, and one write.

Key design move: the kernel operates entirely in **space-to-depth layout**.
With x viewed as (Hg, Wg, 4C) — the four 2x2-tap pixels stacked on the
channel axis — every op in the gate becomes lane-dimension-friendly:

* the 2x2/s2 conv ``w_x`` is ONE matmul with a 4C contraction;
* the psi nearest-x2 upsample disappears: psi is (Hg*Wg, 1) and broadcasts
  directly over the 4C tap channels (upsample == tap-wise broadcast);
* the result 1x1 conv is a block-diagonal (4C, 4C) matmul (Wr repeated on
  the diagonal), MXU-friendly at these channel widths (C = 32/64/128).

The s2d/d2s layout transforms run outside the kernel where XLA fuses them
with producers/consumers. Grid: one program per batch element (full spatial
extent fits VMEM at this model's sizes: <= 64x64x128 fp32 = 2 MB).

A pure-XLA path with identical semantics lives in models/blocks.py;
``use_pallas=True`` on the model flips every gate to this kernel (validated
equivalent in tests/test_pallas.py; CPU/interpret fallback for test envs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# the s2d layout rule has ONE home (tap order contract): ops/s2d.py
from diffusionremotesensing_tpu.ops.s2d import (
    depth_to_space as _depth_to_space,
    space_to_depth as _space_to_depth,
)

try:  # pallas is TPU/GPU-only; import lazily so CPU test envs still work
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False


def _gate_kernel(
    xs_ref,     # (1, Hg, Wg, 4C)  space-to-depth view of x (taps 00,01,10,11)
    g_ref,      # (1, Hg, Wg, C)   gating signal (half res)
    wg_ref,     # (C, C)    w_g 1x1 kernel
    bg_ref,     # (1, C)
    wx_ref,     # (4C, C)   w_x 2x2/s2 kernel as one contraction
    bx_ref,     # (1, C)
    wpsi_ref,   # (C, 1)
    bpsi_ref,   # (1, 1)
    wr4_ref,    # (4C, 4C)  result 1x1 kernel, block-diagonal over taps
    br4_ref,    # (1, 4C)
    bn_scale_ref,  # (1, 4C)  BN affine, tiled over taps
    bn_bias_ref,   # (1, 4C)
    bn_mean_ref,   # (1, 4C)
    bn_var_ref,    # (1, 4C)
    out_ref,    # (1, Hg, Wg, 4C)  gated output, still in s2d layout
):
    _, Hg, Wg, C4 = xs_ref.shape
    C = C4 // 4
    N = Hg * Wg

    xs = xs_ref[0].reshape(N, C4)
    g2d = g_ref[0].reshape(N, C)

    # g1 = g @ Wg + bg  (1x1 conv == channel matmul)
    g1 = jnp.dot(g2d, wg_ref[:], preferred_element_type=jnp.float32) + bg_ref[0]

    # x1 = 2x2/s2 conv as one 4C-contraction matmul
    x1 = jnp.dot(xs, wx_ref[:], preferred_element_type=jnp.float32) + bx_ref[0]

    # psi = sigmoid(relu(g1 + x1) @ Wpsi + bpsi): (N, 1)
    a = jnp.maximum(g1 + x1, 0.0)
    psi = jax.nn.sigmoid(
        jnp.dot(a, wpsi_ref[:], preferred_element_type=jnp.float32) + bpsi_ref[0]
    )

    # nearest-x2 upsample == broadcast over the 4 tap channels in s2d layout
    gated = xs * psi
    r = jnp.dot(gated, wr4_ref[:], preferred_element_type=jnp.float32) + br4_ref[0]
    inv_std = jax.lax.rsqrt(bn_var_ref[0] + 1e-5)
    r = (r - bn_mean_ref[0]) * inv_std * bn_scale_ref[0] + bn_bias_ref[0]
    out_ref[0] = r.reshape(Hg, Wg, C4).astype(out_ref.dtype)


def fused_attention_gate(
    x: jnp.ndarray,     # (B, H, W, C)
    g: jnp.ndarray,     # (B, H/2, W/2, C)
    wg: jnp.ndarray,    # (1, 1, C, C) HWIO
    bg: jnp.ndarray,    # (C,)
    wx: jnp.ndarray,    # (2, 2, C, C) HWIO
    bx: jnp.ndarray,    # (C,)
    wpsi: jnp.ndarray,  # (1, 1, C, 1)
    bpsi: jnp.ndarray,  # (1,)
    wr: jnp.ndarray,    # (1, 1, C, C)
    br: jnp.ndarray,    # (C,)
    bn_scale: jnp.ndarray,
    bn_bias: jnp.ndarray,
    bn_mean: jnp.ndarray,
    bn_var: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inference-mode fused attention gate (BatchNorm in affine form)."""
    B, H, W, C = x.shape
    Hg, Wg = H // 2, W // 2
    f32 = jnp.float32

    xs2d = _space_to_depth(x)
    # block-diagonal Wr over the 4 taps: (4C, 4C)
    wr2 = wr.reshape(C, C).astype(f32)
    eye4 = jnp.eye(4, dtype=f32)
    wr4 = jnp.einsum("ab,ij->aibj", eye4, wr2).reshape(4 * C, 4 * C)

    def tile4(v):
        return jnp.tile(v.reshape(1, C).astype(f32), (1, 4))

    args = (
        xs2d,
        g,
        wg.reshape(C, C).astype(f32),
        bg.reshape(1, C).astype(f32),
        wx.astype(f32).reshape(4 * C, C),
        bx.reshape(1, C).astype(f32),
        wpsi.reshape(C, 1).astype(f32),
        bpsi.reshape(1, 1).astype(f32),
        wr4,
        tile4(br),
        tile4(bn_scale),
        tile4(bn_bias),
        tile4(bn_mean),
        tile4(bn_var),
    )
    s2d_spec = pl.BlockSpec((1, Hg, Wg, 4 * C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    gate_spec = pl.BlockSpec((1, Hg, Wg, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    param_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_s2d = pl.pallas_call(
        _gate_kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hg, Wg, 4 * C), x.dtype),
        grid=(B,),
        in_specs=[s2d_spec, gate_spec] + [param_spec] * 12,
        out_specs=s2d_spec,
        interpret=interpret,
    )(*args)
    return _depth_to_space(out_s2d)


def attention_gate_reference(x, g, wg, bg, wx, bx, wpsi, bpsi, wr, br, s, b_, m, v):
    """XLA reference implementation of the same fused gate (for validation)."""
    g1 = jax.lax.conv_general_dilated(
        g, wg, (1, 1), ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bg
    x1 = jax.lax.conv_general_dilated(
        x, wx, (2, 2), ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bx
    psi = jax.nn.sigmoid(
        jax.lax.conv_general_dilated(
            jnp.maximum(g1 + x1, 0.0), wpsi, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bpsi
    )
    psi_up = jnp.repeat(jnp.repeat(psi, 2, axis=1), 2, axis=2)
    r = jax.lax.conv_general_dilated(
        x * psi_up, wr, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + br
    return (r - m) * jax.lax.rsqrt(v + 1e-5) * s + b_
