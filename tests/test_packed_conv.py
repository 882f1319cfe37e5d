"""V-packed Pallas 3x3 SAME conv (ops/packed_conv): interpret mode must
reproduce the XLA conv exactly at the level-1 flagship shapes (64->64 and
192->64, V=2) and at other (Ci, Co, V) combinations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionremotesensing_tpu.ops.packed_conv import (
    pack_conv_weights,
    packed_conv,
)


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _rand(key, shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * scale


@pytest.mark.parametrize(
    "h,w,ci,co,v",
    [
        (16, 16, 64, 64, 2),    # conv_block1.conv2 shape family
        (16, 24, 192, 64, 2),   # up_conv1 shape family (non-square)
        (8, 8, 16, 32, 4),      # wider packing
        (16, 16, 32, 64, 2),    # conv_block1.conv1 shape family
    ],
)
def test_packed_conv_matches_xla(h, w, ci, co, v):
    x = _rand(1, (2, h, w, ci), 0.3)
    k = _rand(2, (3, 3, ci, co), 0.05)
    got = packed_conv(x, pack_conv_weights(k, v), v=v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_conv(x, k)), atol=2e-5
    )


def test_packed_conv_bf16_close():
    x = _rand(3, (1, 16, 16, 64), 0.3).astype(jnp.bfloat16)
    k = (_rand(4, (3, 3, 64, 64)) * 0.05).astype(jnp.bfloat16)
    got = packed_conv(x, pack_conv_weights(k, 2), v=2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(_conv(x, k), np.float32),
        atol=0.05, rtol=0.05,
    )


def test_packed_conv_in_kernel_bias():
    x = _rand(7, (2, 16, 16, 32), 0.3)
    k = _rand(8, (3, 3, 32, 64), 0.05)
    b = _rand(9, (64,))
    got = packed_conv(x, pack_conv_weights(k, 2), v=2, bias=b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_conv(x, k) + b), atol=2e-5
    )


def test_packed_conv_rejects_tall_kernels():
    """v >= kh-1 (the highest slot must fit the v-row reshape)."""
    x = _rand(5, (1, 16, 16, 8))
    k = _rand(6, (5, 3, 8, 8))
    with pytest.raises(AssertionError):
        packed_conv(x, pack_conv_weights(k, 2), v=2, kh=5, interpret=True)
