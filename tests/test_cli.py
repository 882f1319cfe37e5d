"""End-to-end CLI smoke tests: run the actual entry-point scripts on tiny
synthetic datasets in a temp cwd (2 epochs, tiny images, CPU)."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["DRS_FORCE_CPU"] = "1"
    # share the suite's persistent compile cache (tests/conftest.py) so the
    # CLI subprocesses don't each pay a multi-minute cold fwd+bwd compile
    env["DRS_CPU_COMPILE_CACHE"] = "1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _mk_images(d, n=6, size=32):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"img_{i}.png"))


@pytest.fixture
def workdir(tmp_path):
    return str(tmp_path)


def _run(script, args, cwd):
    cmd = [sys.executable, os.path.join(REPO, script)] + args
    res = subprocess.run(cmd, cwd=cwd, env=_env(), capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, f"STDOUT:\n{res.stdout}\nSTDERR:\n{res.stderr}"
    return res


def test_train_superres_cli(workdir):
    _mk_images(os.path.join(workdir, "data", "train_original"), n=6, size=32)
    _mk_images(os.path.join(workdir, "data", "val_original"), n=6, size=32)
    _run(
        "train_diffusion_superres.py",
        [
            "--epochs", "2", "--batch_size", "4", "--image_size", "32",
            "--noise_steps", "8", "--model_name", "smoke_superres",
            "--dataset_path", "data", "--magnification_factor", "2",
            "--loss", "MSE", "--Blur_radius", "0.5", "--check_preds_epoch", "1",
        ],
        workdir,
    )
    assert os.path.exists(os.path.join(workdir, "models_run", "smoke_superres", "weights", "snapshot.pt"))
    results = os.listdir(os.path.join(workdir, "models_run", "smoke_superres", "results"))
    assert any(f.startswith("superres_") for f in results)
    assert "superres_results.png" in results


def test_train_generation_cli(workdir):
    # reference semantics: ImageFolder root is ../<dataset_path> relative to
    # the run dir (the script lives in generate_new_imgs/)
    for c in ["ClassA", "ClassB"]:
        _mk_images(os.path.join(workdir, "gen_data", c), n=4, size=16)
    rundir = os.path.join(workdir, "rundir")
    os.makedirs(rundir, exist_ok=True)
    _run(
        "generate_new_imgs/train_diffusion_generation.py",
        [
            "--epochs", "2", "--batch_size", "4", "--image_size", "16",
            "--noise_steps", "8", "--model_name", "smoke_gen",
            "--dataset_path", "gen_data", "--loss", "MSE",
            "--check_preds_epoch", "1", "--ema_smoothing", "true",
        ],
        rundir,
    )
    assert os.path.exists(os.path.join(workdir, "models_run", "smoke_gen", "weights", "snapshot.pt"))


def test_train_sar_cli(workdir):
    rng = np.random.default_rng(0)
    for split in ["train", "valid"]:
        for sub in ["sar", "opt"]:
            os.makedirs(os.path.join(workdir, "sar_data", split, sub), exist_ok=True)
        for i in range(4):
            np.save(
                os.path.join(workdir, "sar_data", split, "sar", f"p{i}.npy"),
                rng.uniform(-1, 1, (2, 16, 16)).astype(np.float32),
            )
            np.save(
                os.path.join(workdir, "sar_data", split, "opt", f"p{i}.npy"),
                rng.uniform(-1, 1, (1, 16, 16)).astype(np.float32),
            )
    # numpy pairing: dataset default data_format is torch; ours reads .npy via numpy
    _run(
        "train_diffusion_SAR_TO_NDVI.py",
        [
            "--epochs", "1", "--batch_size", "4", "--image_size", "16",
            "--noise_steps", "8", "--model_name", "smoke_sar",
            "--dataset_path", "sar_data", "--loss", "MSE", "--check_preds_epoch", "5",
        ],
        workdir,
    )
    assert os.path.exists(os.path.join(workdir, "models_run", "smoke_sar", "weights", "snapshot.pt"))


def test_aggregation_cli_with_trained_snapshot(workdir):
    # first produce a tiny superres snapshot via the training CLI
    _mk_images(os.path.join(workdir, "data", "train_original"), n=4, size=32)
    _mk_images(os.path.join(workdir, "data", "val_original"), n=4, size=32)
    _run(
        "train_diffusion_superres.py",
        [
            "--epochs", "1", "--batch_size", "4", "--image_size", "32",
            "--noise_steps", "6", "--model_name", "smoke_agg",
            "--dataset_path", "data", "--magnification_factor", "2",
            "--loss", "MSE", "--Blur_radius", "0.5", "--check_preds_epoch", "3",
        ],
        workdir,
    )
    _mk_images(os.path.join(workdir, "lr"), n=1, size=32)
    _run(
        "Aggregation_Sampling.py",
        [
            "--model_name", "smoke_agg", "--magnification_factor", "2",
            "--noise_steps", "6", "--patch_size", "16", "--stride", "8",
            "--model_input_size", "32", "--UNet_type", "Residual Attention UNet",
            "--Degradation_type", "DownBlur", "--device", "cpu",
            "--img_lr_path", os.path.join("lr", "img_0.png"),
            "--destination_path", "sr_out.png",
        ],
        workdir,
    )
    out = Image.open(os.path.join(workdir, "sr_out.png"))
    assert out.size == (64, 64)

    # directory mode (framework addition): every folder image SR'd in one
    # process, stems preserved under --destination_dir; outputs are always
    # PNG (a .jpg input must not make the SR output lossy-JPEG-re-encoded)
    _mk_images(os.path.join(workdir, "lr_many"), n=3, size=32)
    Image.open(os.path.join(workdir, "lr_many", "img_2.png")).save(
        os.path.join(workdir, "lr_many", "img_3.jpg")
    )
    # stem collision across extensions: neither output may overwrite the other
    Image.open(os.path.join(workdir, "lr_many", "img_1.png")).save(
        os.path.join(workdir, "lr_many", "img_2.jpg")
    )
    _run(
        "Aggregation_Sampling.py",
        [
            "--model_name", "smoke_agg", "--magnification_factor", "2",
            "--noise_steps", "6", "--patch_size", "16", "--stride", "8",
            "--model_input_size", "32", "--UNet_type", "Residual Attention UNet",
            "--Degradation_type", "DownBlur", "--device", "cpu",
            "--img_lr_dir", "lr_many", "--destination_dir", "sr_many",
        ],
        workdir,
    )
    outs = sorted(os.listdir(os.path.join(workdir, "sr_many")))
    assert outs == [
        "img_0.png", "img_1.png", "img_2.jpg.png", "img_2.png.png", "img_3.png",
    ]
    arrs = [
        np.asarray(Image.open(os.path.join(workdir, "sr_many", f))) for f in outs
    ]
    assert all(a.shape == (64, 64, 3) for a in arrs)
    # per-image key folding: distinct inputs + distinct keys -> distinct SRs
    assert not np.array_equal(arrs[0], arrs[1])


def test_generation_cli_with_video_and_preview_grid(workdir):
    """--generate_video writes the denoising mp4; previews use the
    reference's classes x 5 layout."""
    for c in ["ClassA", "ClassB"]:
        _mk_images(os.path.join(workdir, "gen_data", c), n=4, size=16)
    rundir = os.path.join(workdir, "rundir")
    os.makedirs(rundir, exist_ok=True)
    _run(
        "generate_new_imgs/train_diffusion_generation.py",
        [
            "--epochs", "1", "--batch_size", "4", "--image_size", "16",
            "--noise_steps", "6", "--model_name", "smoke_genvid",
            "--dataset_path", "gen_data", "--loss", "MSE",
            "--check_preds_epoch", "1", "--generate_video", "true",
        ],
        rundir,
    )
    results = os.path.join(workdir, "models_run", "smoke_genvid", "results")
    assert os.path.exists(os.path.join(results, "video_denoising.mp4"))
    assert os.path.exists(os.path.join(results, "generation_0_epoch.png"))
    assert os.path.exists(os.path.join(results, "generation_results.png"))


def test_aggregation_cli_multichip_and_ddim(workdir):
    """--multiple_gpus shards the patch batch over the virtual 8-device mesh;
    --ddim_steps switches to the accelerated sampler; --start_t runs the
    truncated warm-start chain (q-sampled bicubic init) through the CLI."""
    _mk_images(os.path.join(workdir, "data", "train_original"), n=4, size=32)
    _mk_images(os.path.join(workdir, "data", "val_original"), n=4, size=32)
    _run(
        "train_diffusion_superres.py",
        [
            "--epochs", "1", "--batch_size", "4", "--image_size", "32",
            "--noise_steps", "6", "--model_name", "smoke_agg8",
            "--dataset_path", "data", "--magnification_factor", "2",
            "--loss", "MSE", "--Blur_radius", "0.5", "--check_preds_epoch", "3",
        ],
        workdir,
    )
    _mk_images(os.path.join(workdir, "lr"), n=1, size=32)
    env_extra = {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    env = _env(); env.update(env_extra)
    # one trained model, two CLI runs: the plain multichip+DDIM path AND the
    # --start_t truncated warm-start variant (both must stay covered)
    for out_name, extra in (("sr_out8.png", []),
                            ("sr_out8_trunc.png", ["--start_t", "4"])):
        cmd = [sys.executable, os.path.join(REPO, "Aggregation_Sampling.py"),
               "--model_name", "smoke_agg8", "--magnification_factor", "2",
               "--noise_steps", "6", "--patch_size", "16", "--stride", "8",
               "--model_input_size", "32", "--UNet_type", "Residual Attention UNet",
               "--Degradation_type", "DownBlur", "--device", "cpu",
               "--img_lr_path", os.path.join("lr", "img_0.png"),
               "--destination_path", out_name,
               "--multiple_gpus", "true", "--ddim_steps", "4",
               "--batch_size", "1"] + extra
        res = subprocess.run(cmd, cwd=workdir, env=env, capture_output=True, text=True, timeout=1200)
        assert res.returncode == 0, f"STDOUT:\n{res.stdout}\nSTDERR:\n{res.stderr}"
        out = Image.open(os.path.join(workdir, out_name))
        assert out.size == (64, 64)


def test_train_superres_bsrgan_cli(workdir):
    """--Degradation_type BSRGAN: eager degradation build + PNG pair dump."""
    _mk_images(os.path.join(workdir, "data", "train_original"), n=2, size=80)
    _mk_images(os.path.join(workdir, "data", "val_original"), n=2, size=80)
    _run(
        "train_diffusion_superres.py",
        [
            "--epochs", "1", "--batch_size", "2", "--image_size", "16",
            "--noise_steps", "6", "--model_name", "smoke_bsrgan",
            "--dataset_path", "data", "--magnification_factor", "2",
            "--loss", "MSE", "--Degradation_type", "BSRGAN", "--num_crops", "2",
            "--check_preds_epoch", "3", "--num_workers", "2",
        ],
        workdir,
    )
    assert os.path.exists(os.path.join(workdir, "models_run", "smoke_bsrgan", "weights", "snapshot.pt"))
    # the eager dataset dumps its degraded pairs like the reference
    assert len(os.listdir(os.path.join(workdir, "data_Dataset", "train", "lr"))) == 4
    assert len(os.listdir(os.path.join(workdir, "data_Dataset", "train", "hr"))) == 4


def test_train_superres_cli_device_degradation(workdir):
    """--device_degradation: host decodes only, the accelerator derives
    x/cond (data/device_degradation.py); full train -> snapshot flow."""
    _mk_images(os.path.join(workdir, "data", "train_original"), n=6, size=32)
    _mk_images(os.path.join(workdir, "data", "val_original"), n=6, size=32)
    _run(
        "train_diffusion_superres.py",
        [
            "--epochs", "2", "--batch_size", "4", "--image_size", "32",
            "--noise_steps", "8", "--model_name", "smoke_dd",
            "--dataset_path", "data", "--magnification_factor", "2",
            "--loss", "MSE", "--Blur_radius", "0.5", "--check_preds_epoch", "1",
            "--device_degradation", "true",
        ],
        workdir,
    )
    assert os.path.exists(os.path.join(workdir, "models_run", "smoke_dd", "weights", "snapshot.pt"))


def test_train_seed_env_knob(monkeypatch):
    """DRS_TRAIN_SEED (env knob, not a CLI flag — the flag surface mirrors
    the reference, which has no seed flag) reseeds model init; used to
    replicate learning-gate trainings across seeds (NOTES.md round-5)."""
    import jax.numpy as jnp

    from diffusionremotesensing_tpu.cli import _train_seed, create_variables
    from diffusionremotesensing_tpu.models.unet import (
        residual_attention_unet_superres,
    )

    monkeypatch.delenv("DRS_TRAIN_SEED", raising=False)
    assert _train_seed() == 0
    monkeypatch.setenv("DRS_TRAIN_SEED", "7")
    assert _train_seed() == 7

    model = residual_attention_unet_superres(magnification_factor=2)
    v7 = create_variables(model, 16)
    monkeypatch.setenv("DRS_TRAIN_SEED", "0")
    v0 = create_variables(model, 16)
    a = v7["params"]["conv0"]["conv"]["kernel"]
    b = v0["params"]["conv0"]["conv"]["kernel"]
    assert a.shape == b.shape and not jnp.allclose(a, b)
