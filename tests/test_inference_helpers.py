"""model_name parsing convention and make_process wiring."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# other test modules prepend /root/reference to sys.path, which shadows OUR
# superres_and_NDVIgen with the reference's (torch-only) module of the same
# name — pin the repo root first
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "superres_and_NDVIgen" in sys.modules:
    del sys.modules["superres_and_NDVIgen"]

from superres_and_NDVIgen import parse_imgsize, parse_lr_imgsize, parse_magnification  # noqa: E402


def test_model_name_parsing():
    name = "Residual_Attention_UNet_superres_magnification2_LRimgsize128_up42_sentinel2_patches_downblur"
    assert parse_magnification(name) == 2
    assert parse_lr_imgsize(name) == 128
    assert parse_imgsize("Residual_Attention_UNet_EMA_imgsize128_SAR_TO_NDVI") == 128
    with pytest.raises(IndexError):
        parse_magnification("no_parts_here")


def test_make_process_class_conditioning_has_no_encoder():
    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_generation,
        residual_attention_unet_superres,
    )

    gen = residual_attention_unet_generation(num_classes=2)
    proc = make_process(gen, "linear", 5, 16)
    assert proc.encode_cond_fn is None  # labels need no hoisted stem

    sr = residual_attention_unet_superres(magnification_factor=2)
    proc_sr = make_process(sr, "linear", 5, 16)
    assert proc_sr.encode_cond_fn is not None
    # end-to-end through the wired process
    v = init_unet_params(sr, jax.random.PRNGKey(0), image_size=16)
    out = proc_sr.sample(v, jax.random.PRNGKey(1), n=1, cond=jnp.zeros((8, 8, 3)))
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
