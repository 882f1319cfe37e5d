"""Losses: golden checks vs torch, VGG19 feature extractor structure."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from diffusionremotesensing_tpu.losses import (
    VGG19Features,
    huber,
    load_vgg19_params,
    mae,
    make_loss_fn,
    mse,
    vgg_perceptual_loss_fn,
)


def _pair(shape=(4, 8, 8, 3), seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal(shape).astype(np.float32),
        rng.standard_normal(shape).astype(np.float32),
    )


def test_mse_mae_match_torch():
    a, b = _pair()
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    np.testing.assert_allclose(float(mse(a, b)), torch.nn.MSELoss()(ta, tb).item(), rtol=1e-5)
    np.testing.assert_allclose(float(mae(a, b)), torch.nn.L1Loss()(ta, tb).item(), rtol=1e-5)


def test_huber_matches_torch():
    a, b = _pair(seed=1)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    np.testing.assert_allclose(
        float(huber(a, b)), torch.nn.HuberLoss()(ta, tb).item(), rtol=1e-5
    )


def test_make_loss_fn_selection():
    assert make_loss_fn("MSE") is mse
    assert make_loss_fn("MAE") is mae
    assert make_loss_fn("Huber") is huber
    try:
        make_loss_fn("bogus")
        raise AssertionError("should have raised")
    except ValueError:
        pass


def test_vgg19_structure_and_weight_import():
    """The flax VGG19 features stack must accept torchvision-format weights
    (conv indices 0,2,5,...,34) and produce the 512-channel /32 feature map."""
    rng = np.random.default_rng(0)
    torch_idx = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
    widths = [64, 64, 128, 128, 256, 256, 256, 256, 512, 512, 512, 512, 512, 512, 512, 512]
    state = {}
    in_ch = 3
    for idx, w in zip(torch_idx, widths):
        state[f"features.{idx}.weight"] = rng.standard_normal((w, in_ch, 3, 3)).astype(np.float32) * 0.01
        state[f"features.{idx}.bias"] = np.zeros((w,), np.float32)
        in_ch = w
    variables = load_vgg19_params(state)
    model = VGG19Features()
    out = model.apply(variables, jnp.ones((1, 64, 64, 3)))
    assert out.shape == (1, 2, 2, 512)  # 64 / 2^5, 512 channels


def test_perceptual_loss_runs_and_is_zero_for_identical():
    loss = vgg_perceptual_loss_fn(seed=0)
    a, _ = _pair(shape=(1, 32, 32, 3))
    assert float(loss(a, a)) == 0.0
    a, b = _pair(shape=(1, 32, 32, 3), seed=2)
    assert float(loss(a, b)) > 0.0


def test_combined_loss_weighting():
    fn = make_loss_fn("MSE+Perceptual_noise")
    a, b = _pair(shape=(1, 32, 32, 3), seed=3)
    v = float(fn(jnp.asarray(a), jnp.asarray(b)))
    assert np.isfinite(v) and v > 0
