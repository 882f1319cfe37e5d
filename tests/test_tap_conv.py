"""Tap-structured conv (ops/s2d.k3_to_s2d44 + ops/tap_conv): both the XLA
formulation and the Pallas kernel (interpret mode on CPU) must reproduce the
direct 3x3 SAME conv / the dense-s2d path exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionremotesensing_tpu.ops.s2d import (
    conv_s2d,
    conv_s2d44,
    k3_to_s2d,
    k3_to_s2d44,
    space_to_depth,
)
from diffusionremotesensing_tpu.ops.tap_conv import tap_conv, tap_conv_pair


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("ci,co,h", [(3, 16, 8), (32, 32, 16), (16, 32, 8)])
def test_conv_s2d44_matches_conv3x3(ci, co, h):
    x = _rand(3, (2, h, h, ci))
    w = _rand(4, (3, 3, ci, co)) * 0.1
    want = space_to_depth(_conv(x, w))
    got = conv_s2d44(space_to_depth(x), k3_to_s2d44(w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_conv_s2d44_matches_dense_s2d():
    """Same math as the dense s2d kernel at 2.25x fewer MACs."""
    x = _rand(5, (2, 16, 16, 32))
    w = _rand(6, (3, 3, 32, 32)) * 0.1
    dense = conv_s2d(space_to_depth(x), k3_to_s2d(w), ((1, 1), (1, 1)))
    tap = conv_s2d44(space_to_depth(x), k3_to_s2d44(w))
    np.testing.assert_allclose(np.asarray(tap), np.asarray(dense), atol=1e-5)


@pytest.mark.parametrize("ci,co,h", [(3, 16, 8), (32, 32, 16), (16, 32, 8)])
def test_pallas_tap_conv_matches_conv3x3(ci, co, h):
    x = _rand(7, (2, h, h, ci))
    w = _rand(8, (3, 3, ci, co)) * 0.1
    want = space_to_depth(_conv(x, w))
    got = tap_conv(space_to_depth(x), k3_to_s2d44(w), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_tap_conv_pair_matches_two_convs():
    x = _rand(9, (2, 8, 8, 16))
    wa = _rand(10, (3, 3, 16, 32)) * 0.1
    wb = _rand(11, (3, 3, 16, 32)) * 0.1
    got_a, got_b = tap_conv_pair(
        space_to_depth(x), k3_to_s2d44(wa), k3_to_s2d44(wb), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_a), np.asarray(space_to_depth(_conv(x, wa))), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_b), np.asarray(space_to_depth(_conv(x, wb))), atol=1e-5
    )


def test_pallas_tap_conv_bf16_close():
    """bf16 inputs (the inference dtype) stay within bf16 tolerance."""
    x = _rand(12, (1, 16, 16, 32)).astype(jnp.bfloat16)
    w = (_rand(13, (3, 3, 32, 32)) * 0.1).astype(jnp.bfloat16)
    want = conv_s2d(space_to_depth(x), k3_to_s2d(w), ((1, 1), (1, 1)))
    got = tap_conv(space_to_depth(x), k3_to_s2d44(w), interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.05, rtol=0.05
    )


def test_tap_block_vmem_guard_whole_tile_shape():
    """Whole-tile aggregation (one 256px-LR patch -> a (1,256,256,4C) s2d
    program) OOMed the (B,2)-grid tap_block's scoped VMEM on-chip; the shape
    guard must route such shapes to the dense-s2d path, numerically
    identically (the 512HR forward here), while the flagship and HR-256
    whole-tile shapes keep the kernel."""
    from diffusionremotesensing_tpu.ops.tap_block import tap_block_fits_vmem

    assert tap_block_fits_vmem(64, 64, 64, 128, batch=48)   # flagship bench shape
    assert tap_block_fits_vmem(128, 128, 64, 128, batch=1)  # HR-256 whole tile (ran on-chip)
    assert not tap_block_fits_vmem(128, 128, 64, 128, batch=9)  # OOMed at 22.3MB (B>1 double-buffers x)
    assert not tap_block_fits_vmem(256, 256, 64, 128, batch=1)  # HR-512 whole tile (OOMed at 56MB)
    assert tap_block_fits_vmem(32, 32, 512, 512, batch=48)  # flagship l1 level (measured on-chip)

    import numpy as np

    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )

    mb = residual_attention_unet_superres(magnification_factor=2, s2d=True, tap44="block")
    m0 = residual_attention_unet_superres(magnification_factor=2, s2d=True, tap44=False)
    v = init_unet_params(mb, jax.random.PRNGKey(0), image_size=64)
    x = jnp.asarray(np.random.default_rng(0).random((1, 512, 512, 3), np.float32))
    lr = jnp.asarray(np.random.default_rng(1).random((1, 256, 256, 3), np.float32))
    t = jnp.array([7])
    ob = mb.apply(v, x, t, lr, train=False)
    o0 = m0.apply(v, x, t, lr, train=False)
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(o0))
