"""Image resizing with PyTorch ``F.interpolate`` numerics, as TPU matmuls.

The reference conditions its super-resolution UNet on a bicubic-upsampled LR
image (``F.interpolate(lr, scale_factor=mag, mode='bicubic')``,
/root/reference/UNet_model_superres.py:349). PyTorch's bicubic uses the
cubic-convolution kernel with A = -0.75 and half-pixel coordinate mapping
(align_corners=False); ``jax.image.resize(method='cubic')`` uses the Keys
kernel with A = -0.5, so outputs differ. For checkpoint-output parity we
implement the torch kernel exactly.

TPU-first formulation: a separable resize is two small dense matmuls
(out = W_h @ x @ W_w^T per image channel) instead of gather ops. The
(out_size, in_size) weight matrices are built host-side with numpy at trace
time (shapes are static under jit) and become XLA constants; the einsums map
onto the MXU.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

_A = -0.75  # torch's cubic convolution alpha


def _cubic_weights(t: np.ndarray) -> np.ndarray:
    """4-tap cubic convolution weights for fractional offset t in [0,1).

    Returns shape t.shape + (4,), taps at floor-1, floor, floor+1, floor+2.
    """
    A = _A
    w0 = ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A
    w1 = ((A + 2) * t - (A + 3)) * t * t + 1
    u = 1.0 - t
    w2 = ((A + 2) * u - (A + 3)) * u * u + 1
    w3 = 1.0 - w0 - w1 - w2
    return np.stack([w0, w1, w2, w3], axis=-1)


@functools.lru_cache(maxsize=256)
def bicubic_resize_weights(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) torch-bicubic resampling matrix (float32).

    Half-pixel mapping: src = (dst + 0.5) * in/out - 0.5; 4 taps around
    floor(src), indices clamped to the valid range (border replication),
    matching torch's non-antialiased bicubic for both up- and downscaling.
    """
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    src_floor = np.floor(src)
    t = src - src_floor
    taps = _cubic_weights(t)  # (out, 4)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for k in range(4):
        idx = np.clip(src_floor.astype(np.int64) + (k - 1), 0, in_size - 1)
        np.add.at(mat, (dst.astype(np.int64), idx), taps[:, k])
    return mat.astype(np.float32)


def resize_bicubic(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Torch-parity bicubic resize of NHWC (or HWC) images to (out_h, out_w)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    wh = jnp.asarray(bicubic_resize_weights(h, out_h), dtype=x.dtype)
    ww = jnp.asarray(bicubic_resize_weights(w, out_w), dtype=x.dtype)
    # (N,H,W,C) -> (N,out_h,W,C) -> (N,out_h,out_w,C); both are MXU matmuls.
    # precision='highest' forces f32 accumulation on TPU (default MXU matmul
    # rounds inputs to bf16, which costs ~1e-2 abs error vs torch bicubic).
    y = jnp.einsum("nhwc,Hh->nHwc", x, wh, precision="highest")
    y = jnp.einsum("nhwc,Ww->nhWc", y, ww, precision="highest")
    return y[0] if squeeze else y


def upsample_bicubic(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bicubic upsampling by an integer scale factor (NHWC)."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bicubic(x, h * scale, w * scale)


def upsample_nearest(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Nearest-neighbor upsampling by an integer factor (NHWC).

    Matches torch ``F.interpolate(mode='nearest', scale_factor=scale)`` for
    integer factors (pure pixel repetition).
    """
    x = jnp.repeat(x, scale, axis=-3)
    x = jnp.repeat(x, scale, axis=-2)
    return x
