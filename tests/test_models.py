"""Model structure: parameter-count parity with the torch reference and
shape/conditioning behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionremotesensing_tpu.models.unet import (
    init_unet_params,
    param_count,
    residual_attention_unet_generation,
    residual_attention_unet_sar_to_ndvi,
    residual_attention_unet_superres,
)


def test_param_count_superres():
    # 4,383,058 measured on /root/reference/UNet_model_superres.py:266-325
    m = residual_attention_unet_superres(magnification_factor=2)
    v = init_unet_params(m, jax.random.PRNGKey(0), image_size=16)
    assert param_count(v["params"]) == 4_383_058


def test_param_count_sar_to_ndvi():
    # 4,382,238 measured on /root/reference/UNet_model_SAR_TO_NDVI.py:263-321
    m = residual_attention_unet_sar_to_ndvi()
    v = init_unet_params(m, jax.random.PRNGKey(0), image_size=16)
    assert param_count(v["params"]) == 4_382_238


def test_param_count_generation():
    # 4,383,022 measured on UNet_model_generation.py:226-284 (10 classes)
    m = residual_attention_unet_generation(num_classes=10)
    v = init_unet_params(m, jax.random.PRNGKey(0), image_size=16)
    assert param_count(v["params"]) == 4_383_022


def test_superres_forward_shape():
    mag = 2
    m = residual_attention_unet_superres(magnification_factor=mag)
    v = init_unet_params(m, jax.random.PRNGKey(0), image_size=32)
    x = jnp.ones((2, 32, 32, 3))
    t = jnp.array([5, 9])
    lr = jnp.ones((2, 16, 16, 3))
    out = m.apply(v, x, t, lr, train=False)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_sar_forward_shape():
    m = residual_attention_unet_sar_to_ndvi()
    v = init_unet_params(m, jax.random.PRNGKey(0), image_size=32)
    x = jnp.ones((2, 32, 32, 1))
    sar = jnp.ones((2, 32, 32, 2))
    out = m.apply(v, x, jnp.array([3, 4]), sar, train=False)
    assert out.shape == (2, 32, 32, 1)


def test_generation_forward_and_cfg_mask():
    m = residual_attention_unet_generation(num_classes=10)
    v = init_unet_params(m, jax.random.PRNGKey(0), image_size=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.array([5, 5])
    y = jnp.array([3, 7])
    out_cond = m.apply(v, x, t, y, train=False)
    out_uncond = m.apply(v, x, t, None, train=False)
    # mask=0 must reproduce the unconditional (y=None) path exactly
    out_masked = m.apply(v, x, t, y, jnp.zeros((2,)), train=False)
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_uncond), atol=1e-6)
    # and conditioning must actually change the output
    assert np.abs(np.asarray(out_cond) - np.asarray(out_uncond)).max() > 1e-6


def test_batchnorm_train_mode_updates_stats():
    m = residual_attention_unet_generation(num_classes=10)
    v = init_unet_params(m, jax.random.PRNGKey(0), image_size=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    t = jnp.array([1, 2, 3, 4])
    y = jnp.array([0, 1, 2, 3])
    out, updates = m.apply(
        v, x, t, y, train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(v["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(after, before))


@pytest.mark.parametrize("mag", [2, 4])
def test_superres_magnification(mag):
    m = residual_attention_unet_superres(magnification_factor=mag)
    size = 8 * mag
    v = init_unet_params(m, jax.random.PRNGKey(0), image_size=size)
    x = jnp.ones((1, size, size, 3))
    lr = jnp.ones((1, 8, 8, 3))
    out = m.apply(v, x, jnp.array([1]), lr, train=False)
    assert out.shape == (1, size, size, 3)
