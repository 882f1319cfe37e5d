"""Torch-parity tests for the bicubic/nearest resize ops."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from diffusionremotesensing_tpu.ops.resize import (
    resize_bicubic,
    upsample_bicubic,
    upsample_nearest,
)


@pytest.mark.parametrize("scale", [2, 4])
@pytest.mark.parametrize("size", [8, 13])
def test_bicubic_upsample_matches_torch(scale, size):
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 3, size, size)).astype(np.float32)  # NCHW
    ref = F.interpolate(torch.from_numpy(img), scale_factor=scale, mode="bicubic").numpy()
    got = upsample_bicubic(jnp.asarray(img.transpose(0, 2, 3, 1)), scale)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("out_size", [7, 224])
def test_bicubic_arbitrary_resize_matches_torch(out_size):
    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(img), size=(out_size, out_size), mode="bicubic", align_corners=False
    ).numpy()
    got = resize_bicubic(jnp.asarray(img.transpose(0, 2, 3, 1)), out_size, out_size)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    # torch computes fractional tap offsets in float32, we use float64:
    # worst-case abs deviation ~3e-5 (>90 dB), irrelevant for PSNR parity.
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_nearest_upsample_matches_torch():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((1, 1, 5, 5)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(img), scale_factor=2, mode="nearest").numpy()
    got = upsample_nearest(jnp.asarray(img.transpose(0, 2, 3, 1)), 2)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref)
