"""Losses: golden checks vs torch, VGG19 feature extractor structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
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


@pytest.mark.slow
def test_pad_mask_weighted_loss_matches_unpadded():
    """With pad_mask weights (1 real / 0 pad), every loss and its gradient
    w.r.t. the REAL predictions must equal the unpadded computation exactly,
    and pad rows must get zero gradient — the loader's wrap-padded final
    batch (data/loader.py pad_to_multiple) must not over-weight repeats."""
    rng = np.random.default_rng(7)
    n_real, n_pad = 3, 5  # uneven: pads are wrap-repeats of the 3 real rows
    pred = rng.standard_normal((n_real, 8, 8, 3)).astype(np.float32)
    tgt = rng.standard_normal((n_real, 8, 8, 3)).astype(np.float32)
    idx = np.arange(n_pad) % n_real
    pred_p = np.concatenate([pred, pred[idx]])
    tgt_p = np.concatenate([tgt, tgt[idx]])
    w = np.concatenate([np.ones(n_real, np.float32), np.zeros(n_pad, np.float32)])

    for loss in (mse, mae, huber, vgg_perceptual_loss_fn(seed=0)):
        ref, g_ref = jax.value_and_grad(lambda p: loss(p, jnp.asarray(tgt)))(
            jnp.asarray(pred)
        )
        got, g_got = jax.value_and_grad(
            lambda p: loss(p, jnp.asarray(tgt_p), weights=jnp.asarray(w))
        )(jnp.asarray(pred_p))
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g_got[:n_real]), np.asarray(g_ref), rtol=1e-5, atol=1e-7
        )
        np.testing.assert_array_equal(np.asarray(g_got[n_real:]), 0.0)


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


# ---------------------------------------------------------------- VGG oracle
#
# torchvision is not installed here, so the oracle is a hand-built
# torch.nn.Sequential with torchvision's exact vgg19.features layer plan
# (conv3x3 pad1 + ReLU x{2,2,4,4,4} with MaxPool2d(2,2) after each block —
# state_dict conv indices 0,2,5,7,10,12,14,16,19,21,23,25,28,30,32,34).
# Weights are random but SHARED through load_vgg19_params, which pins the
# conv/pool numerics and the full loss formula even without the pretrained
# values (reference VGGPerceptualLoss, train_diffusion_superres.py:25-63).


def _torch_vgg19_features(seed: int = 0) -> torch.nn.Sequential:
    torch.manual_seed(seed)
    layers, in_ch = [], 3
    for width, n_convs in [(64, 2), (128, 2), (256, 4), (512, 4), (512, 4)]:
        for _ in range(n_convs):
            conv = torch.nn.Conv2d(in_ch, width, 3, padding=1)
            # variance-preserving init so 16 stacked ReLU convs neither
            # explode nor underflow (default init shrinks activations ~1e-7x)
            torch.nn.init.kaiming_normal_(conv.weight, nonlinearity="relu")
            torch.nn.init.normal_(conv.bias, std=0.1)
            layers += [conv, torch.nn.ReLU(inplace=True)]
            in_ch = width
        layers.append(torch.nn.MaxPool2d(2, 2))
    return torch.nn.Sequential(*layers)


def test_vgg19_forward_matches_torch_oracle():
    """Golden: flax VGG19Features == the torch vgg19.features replica with
    the same weights, end to end through all 16 convs + 5 pools."""
    tm = _torch_vgg19_features(seed=0)
    tm.eval()
    variables = load_vgg19_params(tm.state_dict())
    rng = np.random.default_rng(4)
    x = rng.random((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(VGG19Features().apply(variables, jnp.asarray(x)))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale, rtol=2e-4)


def test_perceptual_and_combined_loss_match_reference_formula():
    """Golden: the full MSE+Perceptual_noise value == the reference's
    CombinedLoss(MSE, VGGPerceptualLoss, weight_first=0.3) computed in torch
    with the replica features (bicubic-224 resize, ImageNet normalize, MSE of
    final feature maps — train_diffusion_superres.py:40-76, :352-357)."""
    tm = _torch_vgg19_features(seed=1)
    tm.eval()
    variables = load_vgg19_params(tm.state_dict())

    rng = np.random.default_rng(5)
    a = rng.random((2, 32, 32, 3)).astype(np.float32)
    b = rng.random((2, 32, 32, 3)).astype(np.float32)
    ta = torch.from_numpy(a.transpose(0, 3, 1, 2))
    tb = torch.from_numpy(b.transpose(0, 3, 1, 2))

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def torch_preprocess(img):
        img = torch.nn.functional.interpolate(
            img, size=(224, 224), mode="bicubic", align_corners=False
        )
        return (img - mean) / std

    with torch.no_grad():
        fp, ft = tm(torch_preprocess(ta)), tm(torch_preprocess(tb))
        ref_perc = torch.mean((fp - ft) ** 2).item()
        ref_combined = 0.3 * torch.nn.MSELoss()(ta, tb).item() + 0.7 * ref_perc

    got_perc = float(vgg_perceptual_loss_fn(variables)(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got_perc, ref_perc, rtol=1e-3)

    combined = make_loss_fn("MSE+Perceptual_noise", vgg_variables=variables)
    got = float(combined(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref_combined, rtol=1e-3)


def test_trainer_rejects_random_vgg_by_default():
    """Selecting MSE+Perceptual_noise without pretrained weights must be a
    hard error (the reference semantics need torchvision's weights); the
    random-feature fallback is opt-in via allow_random_vgg."""
    import pytest

    from diffusionremotesensing_tpu.models.unet import residual_attention_unet_generation
    from diffusionremotesensing_tpu.train import Trainer

    model = residual_attention_unet_generation(num_classes=2)
    with pytest.raises(ValueError, match="allow_random_vgg"):
        Trainer(model, "linear", noise_steps=10, image_size=16,
                loss="MSE+Perceptual_noise")
    t = Trainer(model, "linear", noise_steps=10, image_size=16,
                loss="MSE+Perceptual_noise", allow_random_vgg=True)
    assert t.loss_fn is not None
