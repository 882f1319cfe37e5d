"""On-device DownBlur degradation: decode on the host, degrade on the TPU.

Motivation (measured, benchmarks/NOTES.md round 2): the flagship training
recipe is data-bound — the host pipeline peaks at ~280 img/s on this machine
while the device consumes ~1140 img/s, and most of the per-item cost is
PIL's blur + resize (decode is only ~1.3 ms). With this module the host does
decode ONLY (~780 img/s) and ships uint8 batches; the bilinear resize,
bicubic downsample and Gaussian blur of the reference's get_data_superres
pipeline (/root/reference/utils.py:93-166) run batched on the accelerator.

Parity with PIL (pinned in tests/test_device_degradation.py):
* resize (bilinear + bicubic): BIT-EXACT in exact arithmetic. Pillow's
  convolution resampling is replicated including its fixed-point details —
  PRECISION_BITS = 22 weight quantization with C truncate-toward-zero,
  horizontal-then-vertical passes, uint8 clip8 rounding (floor(v + 0.5))
  between passes. The on-device f32 execution can in principle flip a tie
  when an accumulator lands exactly on k + 1/2 (~2^-22 of pixels); measured
  0 differing pixels over 55k-pixel sweeps (and 0 in the CPU float64 tests).
* GaussianBlur: Pillow applies 3 extended box filters (Gwosdek et al.,
  ssvm'11) whose fractional edge weight alpha matches the per-pass variance
  sigma^2/3 exactly. We convolve the three box kernels into ONE separable
  kernel and round once at the end: max |diff| <= 2/255 with <1% of pixels
  off by 1 (Pillow rounds its fixed-point accumulator per pass). The
  degradation is a stochastic data augmentation; a sub-LSB difference on the
  conditioning image is far below the pipeline's own randomness.

TPU formulation: every op is a dense matmul. Resize is two (out, in) weight
matrices (einsum over H then W); the blur is two Toeplitz band matrices with
edge-clamp folded into the rows. All matrices are built host-side in numpy
at trace time (static shapes) and become XLA constants on the MXU.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pil_resize_weights",
    "pil_gaussian_kernel",
    "blur_band_matrix",
    "make_downblur_transform",
]

_PRECISION = 1 << 22  # Pillow Resample.c PRECISION_BITS = 32 - 8 - 2


def _pil_filter(name: str):
    if name == "bilinear":
        return 1.0, lambda x: np.clip(1.0 - np.abs(x), 0.0, None)
    if name == "bicubic":
        a = -0.5

        def f(x):
            x = np.abs(x)
            return np.where(
                x < 1,
                ((a + 2) * x - (a + 3)) * x * x + 1,
                np.where(x < 2, (((x - 5) * x + 8) * x - 4) * a, 0.0),
            )

        return 2.0, f
    raise ValueError(f"unknown PIL filter {name!r}")


@functools.lru_cache(maxsize=256)
def pil_resize_weights(in_size: int, out_size: int, name: str) -> np.ndarray:
    """(out, in) resampling matrix replicating PIL Image.resize exactly.

    Pillow (Resample.c): center = (i+0.5)*scale, support scaled by
    max(scale, 1) (antialias on downscale), weights normalized then
    quantized to 22-bit fixed point with C truncation toward zero.
    """
    support, f = _pil_filter(name)
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = support * filterscale
    W = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        w = f((np.arange(xmin, xmax) + 0.5 - center) / filterscale)
        w = w / w.sum()
        W[i, xmin:xmax] = np.trunc(
            w * _PRECISION + np.where(w >= 0, 0.5, -0.5)
        ) / _PRECISION
    return W


def _extended_box_kernel(sigma: float, passes: int = 3) -> np.ndarray:
    """One pass of Pillow's GaussianBlur: an extended box filter whose
    fractional edge weight matches the target per-pass variance sigma^2/n
    (Gwosdek et al., 'Theoretical foundations of Gaussian convolution by
    extended box filtering')."""
    s2 = sigma * sigma / passes
    l = 0
    while (l + 1) * (l + 2) / 3.0 <= s2:
        l += 1
    inner_var = l * (l + 1) * (2 * l + 1) / 3.0
    alpha = (s2 * (2 * l + 1) - inner_var) / (2.0 * (l + 1) ** 2 - 2.0 * s2)
    k = np.concatenate([[alpha], np.ones(2 * l + 1), [alpha]])
    return k / (2 * l + 1 + 2 * alpha)


@functools.lru_cache(maxsize=64)
def pil_gaussian_kernel(sigma: float, passes: int = 3) -> np.ndarray:
    """Composite 1D kernel of Pillow's GaussianBlur (the three extended box
    passes convolved into one), normalized, odd length."""
    k = _extended_box_kernel(sigma, passes)
    c = k
    for _ in range(passes - 1):
        c = np.convolve(c, k)
    return c / c.sum()


@functools.lru_cache(maxsize=256)
def blur_band_matrix(size: int, sigma: float, passes: int = 3) -> np.ndarray:
    """(size, size) matrix applying Pillow's GaussianBlur along one axis:
    the product of ``passes`` extended-box band matrices, each with PIL's
    edge clamp (out-of-range taps read the edge pixel). Clamping must happen
    per pass — clamping a pre-composed kernel diverges near the borders."""
    k = _extended_box_kernel(sigma, passes)
    R = len(k) // 2
    B = np.zeros((size, size), np.float64)
    for i in range(size):
        for d in range(-R, R + 1):
            B[i, min(max(i + d, 0), size - 1)] += k[d + R]
    M = B
    for _ in range(passes - 1):
        M = B @ M
    return M


def _round_u8(x):
    """Pillow clip8: floor(v + 0.5) clamped to [0, 255]."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def _resize_u8(x, oh: int, ow: int, name: str):
    """PIL-exact resize of a uint8-valued float batch (B, H, W, C):
    horizontal pass, clip8, vertical pass, clip8 — Pillow's order."""
    h, w = x.shape[1], x.shape[2]
    if w != ow:
        Ww = jnp.asarray(pil_resize_weights(w, ow, name), jnp.float32)
        x = _round_u8(jnp.einsum("bhwc,Ww->bhWc", x, Ww))
    if h != oh:
        Wh = jnp.asarray(pil_resize_weights(h, oh, name), jnp.float32)
        x = _round_u8(jnp.einsum("bhwc,Hh->bHwc", x, Wh))
    return x


def make_downblur_transform(
    source_size: int,
    magnification_factor: int,
    blur_radius: float,
    image_size: Optional[int] = None,
):
    """Build the jittable batched DownBlur transform.

    Input:  {'hr_u8': (B, source_size, source_size, C) uint8}
    Output: {'x': HR float [0,1], 'cond': degraded LR float [0,1]} matching
    SuperresDownBlurDataset (datasets.py:58-106) up to the documented blur
    tolerance. float32 throughout: all intermediates are integers < 2^24, so
    the fixed-point uint8 math is exact in f32.
    """
    hr = image_size or source_size
    lr = hr // magnification_factor
    Mh = jnp.asarray(blur_band_matrix(lr, float(blur_radius)), jnp.float32)

    @jax.jit
    def transform(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        y = batch["hr_u8"].astype(jnp.float32)
        if hr != y.shape[1]:
            y = _resize_u8(y, hr, hr, "bilinear")
        x = _resize_u8(y, lr, lr, "bicubic")
        # separable blur: band matrix on H then W (one linear op, rounded
        # once — composite of PIL's three extended box passes)
        x = jnp.einsum("Hh,bhwc->bHwc", Mh, x)
        x = _round_u8(jnp.einsum("Ww,bhwc->bhWc", Mh, x))
        out = {"x": y / 255.0, "cond": x / 255.0}
        if "pad_mask" in batch:
            out["pad_mask"] = batch["pad_mask"]
        return out

    return transform
