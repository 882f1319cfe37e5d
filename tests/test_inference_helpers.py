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


def _tiny_snapshot(tmp_path, model_name, model, image_size):
    """Save an init-params snapshot under tmp_path/models_run/<name>/weights."""
    from diffusionremotesensing_tpu.io import save_snapshot
    from diffusionremotesensing_tpu.models.unet import init_unet_params

    v = init_unet_params(model, jax.random.PRNGKey(0), image_size=image_size)
    d = os.path.join(str(tmp_path), "models_run", model_name, "weights")
    os.makedirs(d)
    save_snapshot(os.path.join(d, "snapshot.msgpack"),
                  {"params": v["params"], "batch_stats": v.get("batch_stats", {})}, 0)


def _short_T(monkeypatch):
    """Wrap make_process so the helpers' hardcoded T=1500 becomes T=5."""
    import diffusionremotesensing_tpu.diffusion as diff

    real = diff.make_process
    monkeypatch.setattr(
        diff, "make_process",
        lambda model, sched, T, size, **kw: real(model, sched, 5, size, **kw),
    )


def test_super_resolver_end_to_end(tmp_path, monkeypatch):
    """Drive the reference-parity inference driver (superres_and_NDVIgen.py
    super_resolver, /root/reference/superres_and_NDVIgen.py:21-76) through
    name parsing, model construction (the default s2d/tap44 path), snapshot
    load, and sampling — pinned after a missing default_tap44 import made
    every default-flag invocation crash with NameError."""
    from diffusionremotesensing_tpu.models.unet import residual_attention_unet_superres
    from superres_and_NDVIgen import super_resolver

    name = "Residual_Attention_UNet_superres_magnification2_LRimgsize8_test"
    _tiny_snapshot(tmp_path, name,
                   residual_attention_unet_superres(magnification_factor=2), 16)
    monkeypatch.chdir(tmp_path)
    _short_T(monkeypatch)

    out = super_resolver(np.zeros((8, 8, 3), np.float32), model_name=name)
    assert out.shape == (16, 16, 3)
    assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 1.0


def test_sar_to_ndvi_generator_end_to_end(tmp_path, monkeypatch):
    """Same pinning for SAR_to_NDVI_generator (reference
    superres_and_NDVIgen.py:79-135): .npy input, [-1,1]->[0,1] rescale,
    default s2d/tap44 construction, sampling."""
    import superres_and_NDVIgen as mod
    from diffusionremotesensing_tpu.models.unet import residual_attention_unet_sar_to_ndvi

    name = "Residual_Attention_UNet_EMA_imgsize128_SAR_TO_NDVI"
    _tiny_snapshot(tmp_path, name, residual_attention_unet_sar_to_ndvi(), 16)
    monkeypatch.chdir(tmp_path)
    _short_T(monkeypatch)
    # the model name hardcodes imgsize128; sample at 16px to keep the test fast
    monkeypatch.setattr(mod, "parse_imgsize", lambda _name: 16)

    sar = np.random.default_rng(0).uniform(-0.9, 0.9, (2, 16, 16)).astype(np.float32)
    np.save(os.path.join(str(tmp_path), "sar.npy"), sar)
    out = mod.SAR_to_NDVI_generator(os.path.join(str(tmp_path), "sar.npy"))
    assert out.shape == (1, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()
