"""Vertically-packed composed-head kernel (ops/packed_head): the fused
Pallas evaluation of conv(hh, head_up4, pad (1,2)) + conv(attn_s, head_at,
SAME) must reproduce the XLA conv pair exactly (interpret mode on CPU), at
every output width the model produces (out4 = 4*out_dim: 12 for superres/
generation, 4 for SAR->NDVI), plus the model-level enablement semantics
(packed_head True/False — default off, measured E2E negative per
benchmarks/NOTES.md round-3 — and the non-multiple-of-8 fallback)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionremotesensing_tpu.ops.packed_head import kpack_weights, packed_head


def _rand(key, shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * scale


def _xla_pair(hh, at, k1, k2):
    c = lambda x, w, pad: jax.lax.conv_general_dilated(  # noqa: E731
        x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return c(hh, k1, ((1, 2), (1, 2))) + c(at, k2, ((1, 1), (1, 1)))


@pytest.mark.parametrize(
    "h,w,c1,c2,out4",
    [
        (16, 16, 64, 128, 12),  # flagship channel widths (small spatial)
        (16, 16, 64, 128, 4),   # SAR->NDVI output width (out_dim=1)
        (8, 24, 32, 64, 12),    # non-square, one packed group
    ],
)
def test_packed_head_matches_xla_pair(h, w, c1, c2, out4):
    hh = _rand(1, (2, h, w, c1), 0.3)
    at = _rand(2, (2, h, w, c2), 0.3)
    k1 = _rand(3, (4, 4, c1, out4), 0.05)
    k2 = _rand(4, (3, 3, c2, out4), 0.05)
    got = packed_head(hh, at, kpack_weights(k1), kpack_weights(k2), interpret=True)
    want = _xla_pair(hh, at, k1, k2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_packed_head_bf16_close():
    hh = _rand(5, (1, 16, 16, 64), 0.3).astype(jnp.bfloat16)
    at = _rand(6, (1, 16, 16, 128), 0.3).astype(jnp.bfloat16)
    k1 = (_rand(7, (4, 4, 64, 12)) * 0.05).astype(jnp.bfloat16)
    k2 = (_rand(8, (3, 3, 128, 12)) * 0.05).astype(jnp.bfloat16)
    got = packed_head(hh, at, kpack_weights(k1), kpack_weights(k2), interpret=True)
    want = _xla_pair(hh, at, k1, k2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05, rtol=0.05,
    )


def test_kpack_weights_structure():
    """Row (s,dx,ch) of the packed weight feeds output (j,o) with k[s-j]
    when 0 <= s-j < KH, zero otherwise (the docstring's slot contract)."""
    kh, kw, ci, co = 3, 3, 2, 4
    k = _rand(9, (kh, kw, ci, co))
    wp = np.asarray(kpack_weights(k, v=8)).reshape(8 + kh - 1, kw, ci, 8, co)
    kn = np.asarray(k)
    for s in range(8 + kh - 1):
        for j in range(8):
            want = kn[s - j] if 0 <= s - j < kh else np.zeros((kw, ci, co))
            np.testing.assert_array_equal(wp[s, :, :, j], want)


def _model_out(tap44, packed_head_flag, image_size=32):
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )

    m = residual_attention_unet_superres(
        magnification_factor=2, s2d=True, tap44=tap44,
        packed_head=packed_head_flag,
    )
    m0 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    v = init_unet_params(m0, jax.random.PRNGKey(7), image_size=image_size)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, image_size, image_size, 3)).astype(np.float32)
    t = np.array([2, 8], np.int32)
    cond = rng.random((2, image_size // 2, image_size // 2, 3)).astype(np.float32)
    return np.asarray(m.apply(v, x, t, cond, train=False))


def test_model_packed_head_forced_matches_reference_path():
    """packed_head=True with tap44=False: the packed kernel alone (no other
    Pallas level) must match the bit-reference dense-s2d output."""
    ref = _model_out(tap44=False, packed_head_flag=False)
    got = _model_out(tap44=False, packed_head_flag=True)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_model_packed_head_fallback_on_odd_height():
    """H/2 not a multiple of 8 (e.g. 24px input -> hh rows 12): the model
    must fall back to the XLA pair and still match the reference path."""
    ref = _model_out(tap44=False, packed_head_flag=False, image_size=24)
    got = _model_out(tap44="block", packed_head_flag=True, image_size=24)
    np.testing.assert_allclose(got, ref, atol=2e-5)
