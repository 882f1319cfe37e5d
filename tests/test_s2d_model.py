"""s2d inference path of the UNet == the ordinary path (same params)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionremotesensing_tpu.models.unet import (
    ResidualAttentionUNet,
    init_unet_params,
    residual_attention_unet_superres,
)


def test_s2d_forward_matches_normal_superres():
    m0 = residual_attention_unet_superres(magnification_factor=2)
    m1 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    v = init_unet_params(m0, jax.random.PRNGKey(0), image_size=32)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    t = np.array([3, 9], np.int32)
    cond = rng.random((2, 16, 16, 3)).astype(np.float32)

    ref = np.asarray(m0.apply(v, x, t, cond, train=False))
    got = np.asarray(m1.apply(v, x, t, cond, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_s2d_forward_matches_normal_generation():
    m0 = ResidualAttentionUNet(conditioning="class", num_classes=4)
    m1 = ResidualAttentionUNet(conditioning="class", num_classes=4, s2d=True)
    v = init_unet_params(m0, jax.random.PRNGKey(1), image_size=16)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([1, 5], np.int32)
    lab = np.array([0, 3], np.int32)

    ref = np.asarray(m0.apply(v, x, t, lab, train=False))
    got = np.asarray(m1.apply(v, x, t, lab, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_s2d_sampler_matches_normal_sampler():
    """Full reverse chain through make_process (the s2d hoisted cond path)."""
    from diffusionremotesensing_tpu.diffusion import make_process

    m0 = residual_attention_unet_superres(magnification_factor=2)
    m1 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    v = init_unet_params(m0, jax.random.PRNGKey(2), image_size=32)

    key = jax.random.PRNGKey(3)
    x_T = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3))
    cond = jax.random.uniform(jax.random.PRNGKey(5), (2, 16, 16, 3))

    out0 = np.asarray(make_process(m0, "cosine", 6, 32).sampler()(v, key, x_T, cond))
    out1 = np.asarray(make_process(m1, "cosine", 6, 32).sampler()(v, key, x_T, cond))
    np.testing.assert_allclose(out1, out0, atol=1e-4)


def test_s2d_training_path_unchanged():
    """train=True must take the ordinary path (batch-stat BN) even with s2d on."""
    m1 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    v = init_unet_params(m1, jax.random.PRNGKey(6), image_size=16)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([1, 2], jnp.int32)
    cond = jnp.zeros((2, 8, 8, 3))
    out, mut = m1.apply(v, x, t, cond, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 16, 16, 3)
    assert "batch_stats" in mut


def test_s2d_forward_matches_normal_sar():
    from diffusionremotesensing_tpu.models.unet import residual_attention_unet_sar_to_ndvi

    m0 = residual_attention_unet_sar_to_ndvi()
    m1 = residual_attention_unet_sar_to_ndvi(s2d=True)
    v = init_unet_params(m0, jax.random.PRNGKey(7), image_size=16)

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    t = np.array([2, 8], np.int32)
    sar = rng.random((2, 16, 16, 2)).astype(np.float32)

    ref = np.asarray(m0.apply(v, x, t, sar, train=False))
    got = np.asarray(m1.apply(v, x, t, sar, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)
