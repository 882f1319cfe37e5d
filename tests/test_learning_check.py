"""Pure-function tests for the learning/quality-gate harness
(benchmarks/learning_check.py) — the training/eval flows themselves run on
the TPU outside the suite; results are recorded in benchmarks/NOTES.md."""

import numpy as np

from benchmarks.learning_check import (
    _draw_image,
    _degrade_lr,
    _sar_pair,
    SAR_SIZE,
)


def test_draw_image_is_deterministic_and_structured():
    a = _draw_image(np.random.default_rng(7), 64)
    b = _draw_image(np.random.default_rng(7), 64)
    assert a.shape == (64, 64, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    # sharp structure exists: plenty of large horizontal gradients
    g = np.abs(np.diff(a.astype(np.int32), axis=1)).max(axis=2)
    assert (g > 64).mean() > 0.01


def test_degrade_lr_shape_and_range():
    hr = _draw_image(np.random.default_rng(0), 64)
    lr = _degrade_lr(hr)
    assert lr.shape == (32, 32, 3)
    assert 0.0 <= lr.min() and lr.max() <= 1.0
    assert _degrade_lr(hr, mag=4).shape == (16, 16, 3)  # x4 gate variant


def test_sar_pair_is_nonlinear_in_the_channels():
    """The NDVI target must NOT be fittable by per-pixel linear regression —
    otherwise the gate's linear baseline would trivially tie the model."""
    rng = np.random.default_rng(3)
    sars, ndvis = zip(*(_sar_pair(rng, SAR_SIZE) for _ in range(4)))
    sar = np.concatenate([s.reshape(2, -1).T for s in sars])     # (N, 2)
    ndvi = np.concatenate([n.ravel() for n in ndvis])
    assert ndvi.min() >= 0.0 and ndvi.max() <= 1.0
    X = np.concatenate([sar, np.ones((len(sar), 1))], axis=1)
    w, *_ = np.linalg.lstsq(X, ndvi, rcond=None)
    resid = X @ w - ndvi
    rms = float(np.sqrt(np.mean(resid**2)))
    assert rms > 0.02, f"target is ~linear in SAR (rms {rms}); gate is trivial"


def test_load_eval_variables_smoke(tmp_path):
    """The shared evaluate* snapshot loader must actually run — a missing
    import here shipped once (ADVICE r2) and broke all three eval gates."""
    import jax.numpy as jnp

    from benchmarks.learning_check import _load_eval_variables
    from diffusionremotesensing_tpu.io import save_snapshot

    state = {
        "params": {"dense": {"kernel": jnp.ones((2, 3))}},
        "batch_stats": {"bn": {"mean": jnp.zeros((3,))}},
    }
    path = str(tmp_path / "snapshot.msgpack")
    save_snapshot(path, state, epochs_run=4)
    variables = _load_eval_variables(path)
    assert set(variables) == {"params", "batch_stats"}
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["dense"]["kernel"]), np.ones((2, 3))
    )
    np.testing.assert_array_equal(
        np.asarray(variables["batch_stats"]["bn"]["mean"]), np.zeros((3,))
    )


def test_pattern_classifier_is_reliable_on_real_class_images():
    """The generation gate's classifier must be ~perfect on actual dataset
    images — otherwise gate accuracy would measure the classifier, not the
    model."""
    from benchmarks.learning_check import GEN_CLASSES, _gen_image, classify_by_pattern

    rng = np.random.default_rng(5)
    imgs, labels = [], []
    for c, name in enumerate(GEN_CLASSES):
        for _ in range(8):
            imgs.append(_gen_image(rng, name).astype(np.float32) / 255.0)
            labels.append(c)
    pred = classify_by_pattern(np.stack(imgs))
    assert (pred == np.asarray(labels)).mean() == 1.0


def test_color_diversity_detects_mode_collapse():
    """The diversity statistic must separate healthy per-image color draws
    from within-class collapse (all samples identical colors)."""
    from benchmarks.learning_check import GEN_CLASSES, _color_diversity, _gen_image

    rng = np.random.default_rng(9)
    imgs, labels = [], []
    for c, name in enumerate(GEN_CLASSES):
        for _ in range(8):
            imgs.append(_gen_image(rng, name).astype(np.float32) / 255.0)
            labels.append(c)
    healthy = _color_diversity(np.stack(imgs), np.asarray(labels), len(GEN_CLASSES))

    # collapsed: one fixed image per class, repeated
    col_imgs, col_labels = [], []
    for c, name in enumerate(GEN_CLASSES):
        fixed = _gen_image(np.random.default_rng(c), name).astype(np.float32) / 255.0
        for _ in range(8):
            col_imgs.append(fixed)
            col_labels.append(c)
    collapsed = _color_diversity(np.stack(col_imgs), np.asarray(col_labels), len(GEN_CLASSES))
    assert healthy > 0.05
    assert collapsed < 0.2 * healthy


def test_evaluate_sar_smoke(tmp_path, monkeypatch, capsys):
    """Drive evaluate_sar end-to-end (tiny size, DDIM-2): the summary-building
    tail once crashed with a NameError AFTER all the sampling compute was
    spent, because no test reached it."""
    import benchmarks.learning_check as lc
    from diffusionremotesensing_tpu.io import save_snapshot
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_sar_to_ndvi,
    )

    monkeypatch.setattr(lc, "SAR_SIZE", 16)
    d = tmp_path / "eval_pairs"
    d.mkdir()
    rng = np.random.default_rng(3)
    for i in range(2):
        np.save(str(d / f"sar_{i}.npy"), rng.uniform(0, 1, (2, 16, 16)).astype(np.float32))
        np.save(str(d / f"ndvi_{i}.npy"), rng.uniform(0, 1, (1, 16, 16)).astype(np.float32))

    import jax

    v = init_unet_params(residual_attention_unet_sar_to_ndvi(), jax.random.PRNGKey(0),
                         image_size=16)
    snap = str(tmp_path / "snapshot.msgpack")
    save_snapshot(snap, {"params": v["params"], "batch_stats": v.get("batch_stats", {})}, 0)

    summary = lc.evaluate_sar(str(tmp_path), snap, ddim_steps=2, noise_steps=8)
    assert set(summary) >= {"sar_psnr_db", "sar_ssim", "linear_baseline_psnr_db",
                            "beats_linear"}
    assert np.isfinite(summary["sar_psnr_db"])


def test_fused_update_env_guard(monkeypatch):
    """DRS_FUSED_UPDATE=1 + --ddim_steps would silently gate the WRONG
    sampler (the kernel only exists on the DDPM branch): hard error."""
    import pytest

    from benchmarks.learning_check import _fused_update_env

    import jax

    monkeypatch.delenv("DRS_FUSED_UPDATE", raising=False)
    assert _fused_update_env(None) is False
    assert _fused_update_env(100) is False
    monkeypatch.setenv("DRS_FUSED_UPDATE", "1")
    with pytest.raises(RuntimeError, match="ddim"):
        _fused_update_env(100)
    # the kernel's hardware PRNG has no interpret-mode lowering: a forced-CPU
    # gate run cannot execute what it claims to measure — hard error too
    with pytest.raises(RuntimeError, match="TPU"):
        _fused_update_env(None)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _fused_update_env(None) is True


def test_evaluate_superres_smoke_with_eval_patch(tmp_path, monkeypatch):
    """Drive evaluate() end-to-end at tiny sizes, covering the default
    64/32-style tiling AND the --eval_patch/--eval_stride whole-tile mode
    (the tile runs as ONE patch; summary must record the tiling used)."""
    import jax
    import benchmarks.learning_check as lc
    from PIL import Image
    from diffusionremotesensing_tpu.io import save_snapshot
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )

    monkeypatch.setattr(lc, "HR", 16)  # model/patch size: 16 -> LR patch 8
    d = tmp_path / "eval_tiles"
    d.mkdir()
    rng = np.random.default_rng(7)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            str(d / f"tile_{i}.png"))

    v = init_unet_params(residual_attention_unet_superres(magnification_factor=2),
                         jax.random.PRNGKey(0), image_size=16)
    snap = str(tmp_path / "snapshot.msgpack")
    save_snapshot(snap, {"params": v["params"], "batch_stats": v.get("batch_stats", {})}, 0)

    tiled = lc.evaluate(str(tmp_path), snap, ddim_steps=2, noise_steps=8)
    assert (tiled["patch_size"], tiled["stride"]) == (8, 4)

    whole = lc.evaluate(str(tmp_path), snap, ddim_steps=2, noise_steps=8,
                        eval_patch=16, eval_stride=16)
    assert (whole["patch_size"], whole["stride"]) == (16, 16)
    for s in (tiled, whole):
        assert np.isfinite(s["mean_sr_psnr_db"])
        assert "beats_bicubic" in s or "mean_bicubic_psnr_db" in s
