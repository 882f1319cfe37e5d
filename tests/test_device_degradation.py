"""On-device DownBlur degradation: PIL parity of every stage + end-to-end
equality with the host dataset, and the trainer integration."""

import numpy as np
import pytest
from PIL import Image, ImageFilter

from diffusionremotesensing_tpu.data.device_degradation import (
    blur_band_matrix,
    make_downblur_transform,
    pil_gaussian_kernel,
    pil_resize_weights,
)


def _rand_u8(h, w, c=3, seed=0):
    return (np.random.default_rng(seed).random((h, w, c)) * 255).astype(np.uint8)


@pytest.mark.parametrize("name,flt", [("bilinear", Image.BILINEAR), ("bicubic", Image.BICUBIC)])
@pytest.mark.parametrize("ih,iw,oh,ow", [(57, 83, 28, 41), (40, 40, 80, 80), (64, 64, 32, 32), (37, 53, 37, 53)])
def test_resize_bit_exact_vs_pil(name, flt, ih, iw, oh, ow):
    """The resampling matrices + clip8 rounding reproduce PIL EXACTLY
    (Pillow's 22-bit fixed-point weights, horizontal-then-vertical)."""
    img = _rand_u8(ih, iw)
    ref = np.asarray(Image.fromarray(img).resize((ow, oh), flt), int)
    x = img.astype(np.float64)
    Ww = pil_resize_weights(iw, ow, name)
    Wh = pil_resize_weights(ih, oh, name)
    if iw != ow:
        x = np.clip(np.floor(np.einsum("hwc,Ww->hWc", x, Ww) + 0.5), 0, 255)
    if ih != oh:
        x = np.clip(np.floor(np.einsum("hwc,Hh->Hwc", x, Wh) + 0.5), 0, 255)
    np.testing.assert_array_equal(x.astype(int), ref)


@pytest.mark.parametrize("sigma", [0.5, 0.8, 1.0, 1.5, 2.7])
def test_gaussian_blur_tolerance_vs_pil(sigma):
    """Composite extended-box kernel (Gwosdek variance matching, Pillow's
    GaussianBlur construction) applied once: within 2/255 of PIL, which
    rounds its fixed-point accumulator per pass."""
    img = _rand_u8(40, 52, seed=3)
    ref = np.asarray(Image.fromarray(img).filter(ImageFilter.GaussianBlur(sigma)), int)
    Mh = blur_band_matrix(40, sigma)
    Mw = blur_band_matrix(52, sigma)
    x = np.einsum("Hh,hwc->Hwc", Mh, img.astype(np.float64))
    x = np.einsum("Ww,hwc->hWc", Mw, x)
    got = np.clip(np.floor(x + 0.5), 0, 255).astype(int)
    d = np.abs(got - ref)
    assert d.max() <= 2
    assert (d > 0).mean() < 0.65  # usually ±1 on a minority; never more than 2
    assert d.mean() < 0.7


def test_gaussian_kernel_normalized_and_symmetric():
    for s in [0.5, 1.0, 2.0]:
        k = pil_gaussian_kernel(s)
        assert abs(k.sum() - 1.0) < 1e-12
        np.testing.assert_allclose(k, k[::-1])


@pytest.mark.parametrize("mag", [2, 4])
def test_transform_matches_host_dataset(tmp_path, mag):
    """End-to-end: device transform output == SuperresDownBlurDataset items
    (x exact; cond within the documented 2/255 blur tolerance) — at x2 AND
    the x4 generality-gate magnification."""
    import jax

    from diffusionremotesensing_tpu.data.datasets import (
        DecodeOnlyDataset,
        SuperresDownBlurDataset,
    )

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(7)
    for i in range(4):
        Image.fromarray((rng.random((48, 48, 3)) * 255).astype(np.uint8)).save(
            d / f"{i}.png"
        )

    host = SuperresDownBlurDataset(str(d), magnification_factor=mag, blur_radius=0.7, image_size=32)
    dec = DecodeOnlyDataset(str(d), image_size=32)
    transform = make_downblur_transform(32, mag, 0.7)

    batch = {"hr_u8": np.stack([dec[i]["hr_u8"] for i in range(4)])}
    out = jax.tree_util.tree_map(np.asarray, transform(batch))
    for i in range(4):
        ref = host[i]
        np.testing.assert_allclose(out["x"][i], ref["x"], atol=1e-6)
        d_lsb = np.abs(out["cond"][i] - ref["cond"]) * 255.0
        assert d_lsb.max() <= 2.0 + 1e-4

def test_trainer_runs_with_device_degradation(tmp_path):
    """One training epoch through the batch_transform hook."""
    import jax

    from diffusionremotesensing_tpu.data.datasets import DecodeOnlyDataset
    from diffusionremotesensing_tpu.data.loader import DataLoader
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )
    from diffusionremotesensing_tpu.train import Trainer

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(1)
    for i in range(8):
        Image.fromarray((rng.random((16, 16, 3)) * 255).astype(np.uint8)).save(
            d / f"{i}.png"
        )
    ds = DecodeOnlyDataset(str(d), image_size=16)
    loader = DataLoader(ds, batch_size=4, shuffle=False)

    model = residual_attention_unet_superres(magnification_factor=2)
    variables = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    trainer = Trainer(
        model, "linear", noise_steps=10, image_size=16, lr=1e-3, loss="MSE",
        batch_transform=make_downblur_transform(16, 2, 0.5),
    )
    state = trainer.train(trainer.init_state(variables), epochs=1,
                          train_loader=loader, verbose=False)
    assert int(state.step) == 2
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(state.params)[0])).all()
