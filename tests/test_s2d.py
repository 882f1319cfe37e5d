"""Space-to-depth execution: every kernel transform must reproduce the
direct lax op exactly (same math, different layout)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionremotesensing_tpu.ops.s2d import (
    conv_s2d,
    depth_to_space,
    k1_to_blockdiag,
    k2s2_to_1x1,
    k3_to_s2d,
    k3s2_to_s2d,
    kT_to_s2d,
    kdown_to_s2d_out,
    s2d_concat,
    space_to_depth,
)


def _conv(x, w, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def test_s2d_roundtrip():
    x = _rand(0, (2, 8, 8, 3))
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)


def test_s2d_concat_matches_concat():
    a, b = _rand(1, (2, 8, 8, 3)), _rand(2, (2, 8, 8, 5))
    got = s2d_concat(space_to_depth(a), space_to_depth(b))
    want = space_to_depth(jnp.concatenate([a, b], axis=-1))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ci,co,h", [(3, 16, 8), (32, 32, 16), (16, 32, 8)])
def test_k3_s2d_matches_conv3x3(ci, co, h):
    x = _rand(3, (2, h, h, ci))
    w = _rand(4, (3, 3, ci, co)) * 0.1
    want = _conv(x, w, 1, ((1, 1), (1, 1)))
    got = depth_to_space(
        conv_s2d(space_to_depth(x), k3_to_s2d(w), ((1, 1), (1, 1)))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("ci,co", [(32, 32), (16, 4)])
def test_k1_blockdiag_matches_conv1x1(ci, co):
    x = _rand(5, (2, 8, 8, ci))
    w = _rand(6, (1, 1, ci, co)) * 0.1
    want = _conv(x, w, 1, "VALID")
    got = depth_to_space(conv_s2d(space_to_depth(x), k1_to_blockdiag(w), "VALID"))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_k3s2_matches_strided_conv():
    ci, co = 32, 32
    x = _rand(7, (2, 16, 16, ci))
    w = _rand(8, (3, 3, ci, co)) * 0.1
    want = _conv(x, w, 2, ((1, 1), (1, 1)))  # 3x3 s2 pad1: 16 -> 8
    got = conv_s2d(space_to_depth(x), k3s2_to_s2d(w), ((1, 0), (1, 0)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_kdown_emits_s2d_of_strided_conv():
    """down conv re-blocked to EMIT s2d: stride-2 (3,3) form of the (2,2)
    s2d down kernel == space_to_depth of the down conv's output."""
    ci, co = 16, 32
    x = _rand(21, (2, 16, 16, ci))
    w = _rand(22, (3, 3, ci, co)) * 0.1
    want = space_to_depth(_conv(x, w, 2, ((1, 1), (1, 1))))
    w2 = k3s2_to_s2d(w)
    got = conv_s2d(
        space_to_depth(x), kdown_to_s2d_out(w2), ((1, 0), (1, 0)), strides=(2, 2)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_k2s2_matches_attention_wx():
    ci, co = 32, 32
    x = _rand(9, (2, 16, 16, ci))
    w = _rand(10, (2, 2, ci, co)) * 0.1
    want = _conv(x, w, 2, "VALID")  # 2x2 s2 pad0
    got = conv_s2d(space_to_depth(x), k2s2_to_1x1(w), "VALID")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_kT_matches_convtranspose2x():
    ci, co = 16, 16
    x = _rand(11, (2, 8, 8, ci))
    k = _rand(12, (3, 3, ci, co)) * 0.1
    # the ConvTranspose2x formulation (models/blocks.py:141-148)
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = depth_to_space(conv_s2d(x, kT_to_s2d(k), ((0, 1), (0, 1))))
    np.testing.assert_allclose(got, want, atol=1e-5)
