"""Fused decoder-tail kernel (ops/dec_block.py, dec_block=True): the single
Pallas program must equal the XLA chain it replaces — stage-1 concat conv,
UpConvBlock-2 body (time bias, conv, BN, relu), composed head_up4 — at the
kernel, model, and sharded levels (interpret mode on CPU). Reference math:
/root/reference/UNet_model_superres.py:174-207 (UpConvBlock) and :351-379
(the up-stage concat convs); the head composition is derived in
models/unet.prepare_s2d_kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionremotesensing_tpu.ops.att_block import unpack_v8
from diffusionremotesensing_tpu.ops.dec_block import build_dec_weights, dec_block
from diffusionremotesensing_tpu.ops.s2d import conv_s2d


def _rand(key, shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * scale


def _pieces(ca=128, cb=64, cm=64, out4=12):
    return {
        "w_uc1": _rand(1, (3, 3, ca + cb, cm), 0.08),
        "b_uc1": _rand(2, (cm,), 0.1),
        "w_up2": _rand(3, (3, 3, cm, cm), 0.08),
        "b_up2": _rand(4, (cm,), 0.1),
        "bn": {
            "scale": _rand(5, (cm,), 0.2) + 1.0,
            "bias": _rand(6, (cm,), 0.1),
            "mean": _rand(7, (cm,), 0.1),
            "var": jnp.abs(_rand(8, (cm,), 0.2)) + 0.5,
        },
        "k4": _rand(9, (4, 4, cm, out4), 0.1),
    }


def _xla_oracle(xa, xb, te, p, eps=1e-5):
    h = conv_s2d(jnp.concatenate([xa, xb], axis=-1), p["w_uc1"],
                 ((1, 1), (1, 1))) + p["b_uc1"]
    bn = p["bn"]
    hh = conv_s2d(h + te[:, None, None, :], p["w_up2"], ((1, 1), (1, 1))) + p["b_up2"]
    hh = (hh - bn["mean"]) * jax.lax.rsqrt(bn["var"] + eps) * bn["scale"] + bn["bias"]
    hh = jnp.maximum(hh, 0.0)
    out = conv_s2d(hh, p["k4"], ((1, 2), (1, 2)))
    return h, hh, out


def _folded(p, ca=128):
    return build_dec_weights(
        p["w_uc1"], p["b_uc1"], ca, p["w_up2"], p["b_up2"], p["bn"], p["k4"]
    )


@pytest.mark.parametrize("hg", [8, 16])
def test_kernel_matches_xla_chain(hg):
    p = _pieces()
    xa = _rand(20, (2, hg, 8, 128), 0.5)
    xb = _rand(21, (2, hg, 8, 64), 0.5)
    te = jnp.maximum(_rand(22, (2, 64), 0.3), 0.0)
    want_h, want_hh, want_out = _xla_oracle(xa, xb, te, p)
    h, hr0, hc0, outp = dec_block(xa, xb, te, _folded(p), interpret=True)
    np.testing.assert_allclose(np.asarray(h), np.asarray(want_h), atol=2e-4)
    np.testing.assert_allclose(np.asarray(hr0), np.asarray(want_hh[:, :1]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(hc0), np.asarray(want_hh[:, :, :1]), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(unpack_v8(outp, 12)), np.asarray(want_out), atol=5e-4
    )


def test_model_dec_block_matches_s2d():
    """Full superres forward: dec_block=True == the plain s2d execution."""
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )

    m0 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    m1 = residual_attention_unet_superres(
        magnification_factor=2, s2d=True, dec_block=True
    )
    v = init_unet_params(m0, jax.random.PRNGKey(30), image_size=16)
    rng = np.random.default_rng(30)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([1, 5], np.int32)
    cond = rng.random((2, 8, 8, 3)).astype(np.float32)
    ref = np.asarray(m0.apply(v, x, t, cond, train=False))
    got = np.asarray(m1.apply(v, x, t, cond, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_model_dec_block_fallback_odd_rows():
    """Level-1 rows not a multiple of 8 -> the flag keeps the XLA path."""
    from diffusionremotesensing_tpu.models.unet import (
        ResidualAttentionUNet,
        init_unet_params,
    )

    m0 = ResidualAttentionUNet(conditioning="class", num_classes=3, s2d=True)
    m1 = ResidualAttentionUNet(
        conditioning="class", num_classes=3, s2d=True, dec_block=True
    )
    v = init_unet_params(m0, jax.random.PRNGKey(31), image_size=24)
    rng = np.random.default_rng(31)
    x = rng.standard_normal((2, 24, 24, 3)).astype(np.float32)
    t = np.array([2, 4], np.int32)
    lab = np.array([0, 2], np.int32)
    ref = np.asarray(m0.apply(v, x, t, lab, train=False))
    got = np.asarray(m1.apply(v, x, t, lab, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_sampler_full_kernel_stack_matches_s2d():
    """Full reverse chain with every fused kernel on at once (tap44='stem' +
    fused_att + dec_block) — the maximal Pallas configuration."""
    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )

    m0 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    m1 = residual_attention_unet_superres(
        magnification_factor=2, s2d=True, tap44="stem", fused_att=True,
        dec_block=True,
    )
    v = init_unet_params(m0, jax.random.PRNGKey(32), image_size=32)
    key = jax.random.PRNGKey(33)
    x_T = jax.random.normal(jax.random.PRNGKey(34), (2, 32, 32, 3))
    cond = jax.random.uniform(jax.random.PRNGKey(35), (2, 16, 16, 3))
    out0 = np.asarray(make_process(m0, "cosine", 5, 32).sampler()(v, key, x_T, cond))
    out1 = np.asarray(make_process(m1, "cosine", 5, 32).sampler()(v, key, x_T, cond))
    np.testing.assert_allclose(out1, out0, atol=1e-4)


def test_kernel_under_batch_sharded_mesh():
    """The kernel grid is batch-parallel; GSPMD must partition it along the
    data axis (xa/xb/te batch-sharded, weights replicated)."""
    from diffusionremotesensing_tpu.parallel.sharding import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )

    p = _pieces()
    w = _folded(p)
    xa = _rand(40, (8, 8, 8, 128), 0.5)
    xb = _rand(41, (8, 8, 8, 64), 0.5)
    te = jnp.maximum(_rand(42, (8, 64), 0.3), 0.0)
    ref = [np.asarray(o) for o in dec_block(xa, xb, te, w, interpret=True)]
    mesh = make_mesh()
    xas = jax.device_put(xa, batch_sharding(mesh))
    xbs = jax.device_put(xb, batch_sharding(mesh))
    tes = jax.device_put(te, batch_sharding(mesh))
    ws = jax.device_put(w, replicated_sharding(mesh))
    got = dec_block(xas, xbs, tes, ws, interpret=True)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), r, atol=1e-6)


def test_model_full_stack_sar_one_channel():
    """SAR->NDVI variant: out_dim=1 makes the packed heads 4-lane blocks
    (V*out4 = 32) — pins the packing math at the narrowest real width."""
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_sar_to_ndvi,
    )

    m0 = residual_attention_unet_sar_to_ndvi(s2d=True)
    m1 = residual_attention_unet_sar_to_ndvi(
        s2d=True, fused_att=True, dec_block=True
    )
    v = init_unet_params(m0, jax.random.PRNGKey(60), image_size=16)
    rng = np.random.default_rng(60)
    x = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    t = np.array([1, 3], np.int32)
    sar = rng.random((2, 16, 16, 2)).astype(np.float32)
    ref = np.asarray(m0.apply(v, x, t, sar, train=False))
    got = np.asarray(m1.apply(v, x, t, sar, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_model_full_stack_generation_cfg():
    """Class-conditional variant with a CFG mask through the full kernel
    stack (bias-only stem slabs + fused attention + decoder tail)."""
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_generation,
    )

    m0 = residual_attention_unet_generation(num_classes=4, s2d=True)
    m1 = residual_attention_unet_generation(
        num_classes=4, s2d=True, tap44="stem", fused_att=True, dec_block=True
    )
    v = init_unet_params(m0, jax.random.PRNGKey(61), image_size=16)
    rng = np.random.default_rng(61)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([2, 6], np.int32)
    lab = np.array([1, 3], np.int32)
    mask = np.array([1.0, 0.0], np.float32)
    ref = np.asarray(m0.apply(v, x, t, lab, cond_mask=mask, train=False))
    got = np.asarray(m1.apply(v, x, t, lab, cond_mask=mask, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_dec_block_fits_vmem_shapes():
    """VMEM guard (unet._forward_s2d's use_dec): flagship shapes fit, the
    whole-tile gate shapes that crash Mosaic do not."""
    from diffusionremotesensing_tpu.ops.dec_block import dec_block_fits_vmem

    assert dec_block_fits_vmem(64, 64, 128, 64, 64)       # flagship bench shape
    assert dec_block_fits_vmem(8, 8, 128, 64, 64)         # CPU test shapes
    assert not dec_block_fits_vmem(128, 128, 128, 64, 64)  # HR-256 whole tile
    assert not dec_block_fits_vmem(256, 256, 128, 64, 64)  # HR-512 whole tile
