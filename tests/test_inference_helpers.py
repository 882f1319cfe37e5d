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


def test_process_sample_ddim_routing():
    """DiffusionProcess.sample(ddim_steps=N) must produce exactly the
    ddim_sampler output (same key split as the ancestral path), and reject
    capture_frames (the DDIM scan records no frames)."""
    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )

    sr = residual_attention_unet_superres(magnification_factor=2)
    proc = make_process(sr, "cosine", 12, 16)
    v = init_unet_params(sr, jax.random.PRNGKey(0), image_size=16)
    cond = jnp.linspace(0, 1, 8 * 8 * 3).reshape(8, 8, 3)

    key = jax.random.PRNGKey(7)
    out = proc.sample(v, key, n=2, cond=cond, ddim_steps=4)

    # reproduce by hand: sample() splits (key, k_init) and builds x_T from
    # k_init, then calls the cached ddim sampler with the remaining key
    k2, k_init = jax.random.split(key)
    x_T = jax.random.normal(k_init, (2, 16, 16, 3))
    ref = proc.ddim_sampler(4, clip_x0=True)(
        v, k2, x_T, jnp.broadcast_to(cond[None], (2, 8, 8, 3))
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # ancestral default is untouched by the new kwargs
    anc = proc.sample(v, key, n=2, cond=cond)
    assert not np.array_equal(np.asarray(anc), np.asarray(out))

    with pytest.raises(ValueError, match="capture_frames"):
        proc.sample(v, key, n=1, cond=cond, ddim_steps=4, capture_frames=True)


def test_super_resolver_ddim_fast_path(tmp_path, monkeypatch):
    """super_resolver(ddim_steps=...) drives the DDIM sampler through the
    checkpoint-driven helper; default (None) stays the ancestral path."""
    from diffusionremotesensing_tpu.models.unet import residual_attention_unet_superres
    from superres_and_NDVIgen import super_resolver

    name = "Residual_Attention_UNet_superres_magnification2_LRimgsize8_test"
    _tiny_snapshot(tmp_path, name,
                   residual_attention_unet_superres(magnification_factor=2), 16)
    monkeypatch.chdir(tmp_path)
    _short_T(monkeypatch)

    lr = np.random.default_rng(1).random((8, 8, 3)).astype(np.float32)
    out_ddim = super_resolver(lr, model_name=name, ddim_steps=3)
    out_anc = super_resolver(lr, model_name=name)
    assert out_ddim.shape == (16, 16, 3)
    assert np.isfinite(out_ddim).all()
    assert out_ddim.min() >= 0.0 and out_ddim.max() <= 1.0
    assert not np.array_equal(out_ddim, out_anc)
