"""End-to-end learning + quality gate on synthetic structured data.

The reference repository ships no benchmark numbers and its trained weights
are stripped from this mount (BASELINE.md), so task quality cannot be judged
against a reference checkpoint. This script is the self-contained substitute:
it trains the flagship superres recipe (DownBlur x2, MSE, EMA, cosine/1500 —
/root/reference/README.md:71) on procedurally generated "remote-sensing-like"
images (smooth background fields + sharp geometric structures), then
super-resolves held-out LR tiles through the full aggregation-sampling path
and reports PSNR/SSIM vs the ground-truth HR, side by side with a bicubic
upsampling baseline. A trained diffusion SR model must beat bicubic on the
sharp structure it learned; this is the pass/fail learning gate.

Usage (superres gate; SAR->NDVI gate mirrors it with --prepare_sar /
--evaluate_sar and a per-pixel linear-regression baseline):
    python -m benchmarks.learning_check --prepare <dir>      # write dataset
    python -m benchmarks.learning_check --evaluate <dir> \
        --snapshot models_run/<name>/weights/snapshot.pt [--ddim_steps 100]

Training itself runs through the REAL CLI (train_diffusion_superres.py) so
the checked path is the user path; see benchmarks/NOTES.md for the recipe
and measured results.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

HR = 128          # training image size (HR patch)
MAG = 2
BLUR_RADIUS = 0.5  # reference flagship recipe value
TILE_HR = 256     # evaluation tile (the aggregation path: 9 patches at stride 32)


def _draw_image(rng: np.random.Generator, size: int) -> np.ndarray:
    """Smooth low-frequency field + sharp shapes: content where x2 SR is
    learnable (edges must be hallucinated sharper than bicubic renders them)."""
    # low-frequency background: blocky upsampled noise (shapes draw over it)
    small = rng.random((8, 8, 3)).astype(np.float32)
    reps = size // 8
    img = np.kron(small, np.ones((reps, reps, 1), np.float32))
    # sharp rectangles
    for _ in range(rng.integers(6, 12)):
        h = int(rng.integers(size // 16, size // 3))
        w = int(rng.integers(size // 16, size // 3))
        y = int(rng.integers(0, size - h))
        x = int(rng.integers(0, size - w))
        color = rng.random(3).astype(np.float32)
        img[y : y + h, x : x + w] = color
    # sharp lines (1-2 px): the hardest content for naive upsampling
    for _ in range(rng.integers(4, 8)):
        t = int(rng.integers(1, 3))
        c = rng.random(3).astype(np.float32)
        if rng.random() < 0.5:
            y = int(rng.integers(0, size - t))
            img[y : y + t, :] = c
        else:
            x = int(rng.integers(0, size - t))
            img[:, x : x + t] = c
    return (img * 255).astype(np.uint8)


def prepare(root: str, n_train: int = 600, n_val: int = 60, seed: int = 0) -> None:
    from PIL import Image

    rng = np.random.default_rng(seed)
    for split, n in (("train_original", n_train), ("val_original", n_val)):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            Image.fromarray(_draw_image(rng, HR)).save(os.path.join(d, f"img_{i:04d}.png"))
    # held-out evaluation tiles at TILE_HR (disjoint seed stream)
    d = os.path.join(root, "eval_tiles")
    os.makedirs(d, exist_ok=True)
    erng = np.random.default_rng(seed + 10_000)
    for i in range(4):
        Image.fromarray(_draw_image(erng, TILE_HR)).save(os.path.join(d, f"tile_{i}.png"))
    print(f"dataset at {root}: {n_train} train / {n_val} val / 4 eval tiles")


def _degrade_lr(hr_u8: np.ndarray, mag: int = MAG) -> np.ndarray:
    """The training degradation (get_data_superres semantics: PIL bicubic
    downsample by mag + GaussianBlur(BLUR_RADIUS)), applied to an eval tile."""
    from PIL import Image, ImageFilter

    im = Image.fromarray(hr_u8)
    lr = im.resize((im.width // mag, im.height // mag), Image.BICUBIC)
    lr = lr.filter(ImageFilter.GaussianBlur(BLUR_RADIUS))
    return np.asarray(lr, np.float32) / 255.0



def _kernel_kwargs():
    """Kernel-config env knobs shared with bench.py (the same A/B surface):
    DRS_TAP44 overrides the tap44 level; DRS_FUSED_ATT / DRS_DEC_BLOCK
    enable the fused attention / decoder-tail kernels (ops/att_block.py,
    ops/dec_block.py). Used to quality-gate a kernel configuration through
    the real eval path before any adoption decision (benchmarks/NOTES.md)."""
    from diffusionremotesensing_tpu.models.unet import resolve_tap44

    return {
        "tap44": resolve_tap44(os.environ.get("DRS_TAP44")),
        "fused_att": os.environ.get("DRS_FUSED_ATT") == "1",
        "dec_block": os.environ.get("DRS_DEC_BLOCK") == "1",
    }


def _fused_update_env(ddim_steps) -> bool:
    """DRS_FUSED_UPDATE=1 quality-gates the fused Pallas ancestral-update
    kernel (ops/fused_update.py). The kernel exists only on the DDPM
    ancestral branch — under --ddim_steps the flag would silently measure
    the unmodified path and a gate could "pass" without ever executing the
    kernel, so the combination is a hard error, not a no-op."""
    on = os.environ.get("DRS_FUSED_UPDATE") == "1"
    if on and ddim_steps:
        raise RuntimeError(
            "DRS_FUSED_UPDATE=1 has no effect under --ddim_steps (the fused "
            "kernel is the DDPM ancestral update); drop one of the two so "
            "the gate actually measures what it claims to."
        )
    if on:
        # the kernel's hardware PRNG has no interpret-mode lowering — on a
        # forced-CPU run the gate could not execute what it claims to
        # measure, so hard-error like the DDIM combination above instead of
        # crashing in Mosaic.
        from diffusionremotesensing_tpu.models.unet import (
            FUSED_UPDATE_NEEDS_TPU,
            fused_update_device_ok,
        )

        if not fused_update_device_ok():
            raise RuntimeError(FUSED_UPDATE_NEEDS_TPU)
    return on


def _sampler_label(ddim_steps, noise_steps, eta, spacing, clip_x0,
                   start_t=None) -> str:
    trunc = f" start_t={start_t}" if start_t else ""
    if not ddim_steps:
        return f"DDPM T={noise_steps}{trunc}"
    return (f"DDIM-{ddim_steps} eta={eta} {spacing}"
            + (" clip_x0" if clip_x0 else "") + trunc)


def _load_eval_variables(snapshot: str):
    """Shared evaluate* setup: TPU compile cache + snapshot -> flax variables."""
    import jax

    from bench import _machine_scoped_cache

    jax.config.update("jax_compilation_cache_dir", _machine_scoped_cache())

    from diffusionremotesensing_tpu.io import load_snapshot

    state, _ = load_snapshot(snapshot)
    return {"params": state["params"], "batch_stats": state.get("batch_stats", {})}


def evaluate(root: str, snapshot: str, ddim_steps: int | None, noise_steps: int = 1500,
             ddim_eta: float = 0.0, ddim_spacing: str = "linear",
             ddim_clip_x0: bool = True, mag: int = MAG,
             eval_patch: int | None = None, eval_stride: int | None = None,
             start_t: int | None = None):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from diffusionremotesensing_tpu.aggregation import AggregationSampler
    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        residual_attention_unet_superres,
    )
    from diffusionremotesensing_tpu.ops.resize import upsample_bicubic
    from diffusionremotesensing_tpu.utils import psnr, ssim

    variables = _load_eval_variables(snapshot)
    model = residual_attention_unet_superres(
        magnification_factor=mag, dtype=jnp.bfloat16, s2d=True, **_kernel_kwargs()
    )
    # eval_patch overrides the LR patch size (stride = half): the model is
    # fully convolutional, so a patch equal to the whole LR tile runs the
    # tile as ONE forward chain per step (no 50%-overlap redundancy, no
    # blend seams) — the "whole-tile mode" quality gate. Default keeps the
    # reference-parity 64px/32 tiling.
    patch = eval_patch or HR // mag
    stride = eval_stride or max(patch // 2, 1)
    proc = make_process(model, "cosine", noise_steps, HR)
    agg = AggregationSampler(
        proc, patch_size=patch, stride=stride, magnification_factor=mag,
        ddim_steps=ddim_steps, ddim_eta=ddim_eta, ddim_spacing=ddim_spacing,
        ddim_clip_x0=ddim_clip_x0,
        # DRS_FUSED_UPDATE=1: quality-gate the fused Pallas update kernel
        # (ops/fused_update.py) — different noise stream, so PSNR/SSIM
        # equivalence must be demonstrated here before any adoption
        # (hard error under --ddim_steps, where it would be a silent no-op)
        fused_update=_fused_update_env(ddim_steps),
        start_t=start_t,
    )

    import time

    rows = []
    tiles = sorted(os.listdir(os.path.join(root, "eval_tiles")))
    quant = os.environ.get("DRS_QUANT") == "1"
    for i, name in enumerate(tiles):
        hr_u8 = np.asarray(Image.open(os.path.join(root, "eval_tiles", name)))
        hr = hr_u8.astype(np.float32) / 255.0
        lr = _degrade_lr(hr_u8, mag)
        tile_vars = variables
        if quant:
            # DRS_QUANT=1 quality-gates the W8A8 int8 execution path
            # (ops/quant.py) exactly as it ships: per-tile calibration on
            # the tile's own patches, like Aggregation_Sampling --quant int8
            from diffusionremotesensing_tpu.ops.quant import quantize_superres_tile

            tile_vars = quantize_superres_tile(
                model, variables, proc.schedule.alpha_hat, lr, patch, mag,
                jax.random.PRNGKey(200 + i),
            )
        t0 = time.perf_counter()
        sr = np.asarray(agg(tile_vars, lr, key=jax.random.PRNGKey(100 + i)))
        tile_wall = time.perf_counter() - t0
        bic = np.clip(np.asarray(upsample_bicubic(jnp.asarray(lr)[None], mag))[0], 0, 1)
        rows.append(
            {
                "tile": name,
                "sr_psnr_db": psnr(sr, hr, data_range=1.0),
                "sr_ssim": ssim(sr, hr, data_range=1.0),
                "bicubic_psnr_db": psnr(bic, hr, data_range=1.0),
                "bicubic_ssim": ssim(bic, hr, data_range=1.0),
                "tile_wall_s": round(tile_wall, 3),
            }
        )
    summary = {
        "snapshot": snapshot,
        "magnification": mag,
        "patch_size": patch,
        "stride": stride,
        "sampler": _sampler_label(ddim_steps, noise_steps, ddim_eta,
                                  ddim_spacing, ddim_clip_x0, start_t),
        "quant": "int8" if quant else "none",
        "start_t": start_t,
        "tiles": rows,
        "mean_sr_psnr_db": float(np.mean([r["sr_psnr_db"] for r in rows])),
        "mean_bicubic_psnr_db": float(np.mean([r["bicubic_psnr_db"] for r in rows])),
        "mean_sr_ssim": float(np.mean([r["sr_ssim"] for r in rows])),
        "mean_bicubic_ssim": float(np.mean([r["bicubic_ssim"] for r in rows])),
        # first tile pays the compile; the warm tiles are the speed number.
        # With a single eval tile there IS no warm sample — report null
        # rather than silently substituting the compile-bearing cold wall
        # (ADVICE round-4); the cold number gets its own key.
        "tile_wall_s_cold": rows[0]["tile_wall_s"],
        "tile_wall_s_warm_median": (
            float(np.median([r["tile_wall_s"] for r in rows[1:]]))
            if len(rows) > 1 else None
        ),
    }
    summary["beats_bicubic"] = summary["mean_sr_psnr_db"] > summary["mean_bicubic_psnr_db"]
    print(json.dumps(summary, indent=2))
    return summary


# --------------------------------------------------------------- SAR -> NDVI
#
# Same gate for the second task family: a deterministic nonlinear mapping
# from 2-channel SAR to NDVI that a per-pixel LINEAR baseline cannot fit
# (tanh of the channel difference plus a product term) — the conditional
# diffusion model must beat least-squares linear regression to pass.

SAR_SIZE = 64


def _structure(rng: np.random.Generator, size: int) -> np.ndarray:
    """One structured [0,1] field (blocky background + rectangles + lines)."""
    return _draw_image(rng, size).astype(np.float32).mean(axis=2) / 255.0


def _sar_pair(rng: np.random.Generator, size: int):
    a, b = _structure(rng, size), _structure(rng, size)
    ndvi = np.clip(0.5 + 0.5 * np.tanh(3.0 * (a - b)) + 0.3 * (a * b - 0.25), 0.0, 1.0)
    sar = np.stack([a, b])            # (2, H, W) in [0, 1]
    return sar, ndvi[None]            # ndvi (1, H, W)


def prepare_sar(root: str, n_train: int = 600, n_val: int = 60, seed: int = 0) -> None:
    """Write <root>/{train,valid}/{sar,opt}/*.npy in the reference layout
    (values in [-1,1]; SarToNdviDataset rescales to [0,1])."""
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("valid", n_val)):
        for sub in ("sar", "opt"):
            os.makedirs(os.path.join(root, split, sub), exist_ok=True)
        for i in range(n):
            sar, ndvi = _sar_pair(rng, SAR_SIZE)
            np.save(os.path.join(root, split, "sar", f"p{i:04d}.npy"), sar * 2 - 1)
            np.save(os.path.join(root, split, "opt", f"p{i:04d}.npy"), ndvi * 2 - 1)
    erng = np.random.default_rng(seed + 10_000)
    d = os.path.join(root, "eval_pairs")
    os.makedirs(d, exist_ok=True)
    for i in range(8):
        sar, ndvi = _sar_pair(erng, SAR_SIZE)
        np.save(os.path.join(d, f"sar_{i}.npy"), sar)
        np.save(os.path.join(d, f"ndvi_{i}.npy"), ndvi)
    print(f"SAR dataset at {root}: {n_train} train / {n_val} valid / 8 eval pairs")


def evaluate_sar(root: str, snapshot: str, ddim_steps: int | None, noise_steps: int = 1500,
                 ddim_eta: float = 0.0, ddim_spacing: str = "linear",
                 ddim_clip_x0: bool = True):
    import jax
    import jax.numpy as jnp

    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        residual_attention_unet_sar_to_ndvi,
    )
    from diffusionremotesensing_tpu.utils import psnr, ssim

    variables = _load_eval_variables(snapshot)
    model = residual_attention_unet_sar_to_ndvi(
        dtype=jnp.bfloat16, s2d=True, **_kernel_kwargs()
    )
    proc = make_process(model, "cosine", noise_steps, SAR_SIZE)

    d = os.path.join(root, "eval_pairs")
    n = len([f for f in os.listdir(d) if f.startswith("sar_")])
    sar = np.stack([np.load(os.path.join(d, f"sar_{i}.npy")) for i in range(n)])
    gt = np.stack([np.load(os.path.join(d, f"ndvi_{i}.npy")) for i in range(n)])
    sar_hwc = sar.transpose(0, 2, 3, 1).astype(np.float32)   # [0,1], (B,H,W,2)
    gt_hwc = gt.transpose(0, 2, 3, 1).astype(np.float32)

    fused_update = _fused_update_env(ddim_steps)
    sampler = (
        proc.ddim_sampler(ddim_steps, ddim_eta, tau_spacing=ddim_spacing,
                          clip_x0=ddim_clip_x0)
        if ddim_steps
        else proc.sampler(fused_update=fused_update)
    )
    key = jax.random.PRNGKey(5)
    x_T = jax.random.normal(jax.random.fold_in(key, 0), (n, SAR_SIZE, SAR_SIZE, 1))
    pred = sampler(variables, key, x_T, jnp.asarray(sar_hwc))
    pred = np.clip(np.asarray(pred), 0.0, 1.0)

    # per-pixel LINEAR baseline, fit on the eval pixels themselves (generous)
    X = np.stack([sar_hwc[..., 0].ravel(), sar_hwc[..., 1].ravel(),
                  np.ones(gt_hwc.size)], axis=1)
    w, *_ = np.linalg.lstsq(X, gt_hwc.ravel(), rcond=None)
    lin = np.clip((X @ w).reshape(gt_hwc.shape), 0.0, 1.0)

    summary = {
        "snapshot": snapshot,
        "sampler": _sampler_label(ddim_steps, noise_steps, ddim_eta,
                                  ddim_spacing, ddim_clip_x0),
        "sar_psnr_db": psnr(pred, gt_hwc, data_range=1.0),
        "sar_ssim": ssim(pred, gt_hwc, data_range=1.0),
        "linear_baseline_psnr_db": psnr(lin, gt_hwc, data_range=1.0),
        "linear_baseline_ssim": ssim(lin, gt_hwc, data_range=1.0),
    }
    summary["beats_linear"] = summary["sar_psnr_db"] > summary["linear_baseline_psnr_db"]
    print(json.dumps(summary, indent=2))
    return summary




# ------------------------------------------------------------- generation
#
# Quantified gate for the third task family: four classes with FIXED spatial
# patterns (horizontal / vertical stripes, checkerboard, diagonal) and
# random per-image colors. CFG-sampled images are classified by absolute
# normalized correlation of their grayscale with the class patterns
# (|corr| because the two colors may invert contrast); the gate is
# classification accuracy far above the 25% chance level.

GEN_SIZE = 32
GEN_CLASSES = ["checker", "diag", "stripes_h", "stripes_v"]  # sorted (CLI order)


def _class_pattern(name: str, size: int = GEN_SIZE) -> np.ndarray:
    y, x = np.mgrid[0:size, 0:size]
    if name == "stripes_h":
        return ((y // 4) % 2).astype(np.float32)
    if name == "stripes_v":
        return ((x // 4) % 2).astype(np.float32)
    if name == "checker":
        return (((y // 4) + (x // 4)) % 2).astype(np.float32)
    return (((x + y) // 6) % 2).astype(np.float32)  # diag


def _gen_image(rng: np.random.Generator, name: str) -> np.ndarray:
    p = _class_pattern(name)[:, :, None]
    c1, c2 = rng.random(3).astype(np.float32), rng.random(3).astype(np.float32)
    while np.abs(c1 - c2).mean() < 0.25:  # keep the pattern visible
        c2 = rng.random(3).astype(np.float32)
    img = p * c1 + (1 - p) * c2 + 0.03 * rng.standard_normal((GEN_SIZE, GEN_SIZE, 3))
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def prepare_gen(root: str, n_per_class: int = 200, seed: int = 0) -> None:
    """ImageFolder layout (class-per-subfolder) for the generation CLI."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    for name in GEN_CLASSES:
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_class):
            Image.fromarray(_gen_image(rng, name)).save(os.path.join(d, f"g{i:04d}.png"))
    print(f"generation dataset at {root}: {n_per_class} x {len(GEN_CLASSES)} classes")


def classify_by_pattern(imgs: np.ndarray) -> np.ndarray:
    """(B, H, W, 3) [0,1] -> predicted class index by |normalized corr| of the
    grayscale with each class pattern."""
    pats = np.stack([_class_pattern(c) for c in GEN_CLASSES])      # (4, H, W)
    pats = pats - pats.mean(axis=(1, 2), keepdims=True)
    pats /= np.linalg.norm(pats, axis=(1, 2), keepdims=True) + 1e-9
    g = imgs.mean(axis=3)
    g = g - g.mean(axis=(1, 2), keepdims=True)
    g /= np.linalg.norm(g, axis=(1, 2), keepdims=True) + 1e-9
    scores = np.abs(np.einsum("bhw,chw->bc", g, pats))
    return scores.argmax(axis=1)


def _color_diversity(imgs: np.ndarray, labels: np.ndarray, n_classes: int) -> float:
    """Within-class diversity statistic: the std (over samples of one class)
    of each image's mean RGB, averaged over classes and channels. The class
    pattern is fixed but the two colors are drawn per image, so a healthy
    model shows diversity comparable to the dataset; within-class mode
    collapse (all samples converging to one coloring) drives this toward 0
    while leaving classification accuracy untouched — the failure mode the
    round-2 gate could not see."""
    vals = []
    for c in range(n_classes):
        m = imgs[labels == c].mean(axis=(1, 2))   # (n, 3) per-image mean RGB
        vals.append(m.std(axis=0).mean())
    return float(np.mean(vals))


def evaluate_gen(snapshot: str, n_per_class: int = 32, noise_steps: int = 1500,
                 cfg_scale: float = 3.0, ddim_steps: int | None = None,
                 ddim_eta: float = 0.0, ddim_spacing: str = "linear",
                 ddim_clip_x0: bool = True):
    import jax
    import jax.numpy as jnp

    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        residual_attention_unet_generation,
    )

    variables = _load_eval_variables(snapshot)
    model = residual_attention_unet_generation(
        num_classes=len(GEN_CLASSES), dtype=jnp.bfloat16, s2d=True,
        **_kernel_kwargs(),
    )
    proc = make_process(model, "cosine", noise_steps, GEN_SIZE)
    ddim_kw = dict(ddim_steps=ddim_steps, ddim_eta=ddim_eta,
                   ddim_spacing=ddim_spacing, ddim_clip_x0=ddim_clip_x0)
    labels = np.repeat(np.arange(len(GEN_CLASSES)), n_per_class).astype(np.int32)
    out = proc.sample(
        variables, jax.random.PRNGKey(11), len(labels),
        cond=jnp.asarray(labels), cfg_scale=cfg_scale, **ddim_kw,
    )
    imgs = np.clip(np.asarray(out), 0.0, 1.0)
    pred = classify_by_pattern(imgs)
    acc = float((pred == labels).mean())
    per_class = {
        GEN_CLASSES[c]: float((pred[labels == c] == c).mean())
        for c in range(len(GEN_CLASSES))
    }
    # diversity gate: within-class color spread vs the DATASET's own
    # (reference images drawn from the same generator, no files needed).
    # Measured at cfg_scale=1 (pure conditional): guidance deliberately
    # trades diversity for fidelity (measured on the round-2 snapshot:
    # ratio 0.34 at CFG-3 but 0.92 at CFG-1 with identical 99.2% accuracy),
    # so the CFG-3 samples would conflate that tradeoff with the mode
    # collapse this gate exists to catch.
    out_nc = proc.sample(
        variables, jax.random.PRNGKey(13), len(labels),
        cond=jnp.asarray(labels), cfg_scale=1.0, **ddim_kw,
    )
    imgs_nc = np.clip(np.asarray(out_nc), 0.0, 1.0)
    rng = np.random.default_rng(23)
    ref_imgs, ref_labels = [], []
    for c, name in enumerate(GEN_CLASSES):
        for _ in range(n_per_class):
            ref_imgs.append(_gen_image(rng, name).astype(np.float32) / 255.0)
            ref_labels.append(c)
    div_data = _color_diversity(
        np.stack(ref_imgs), np.asarray(ref_labels), len(GEN_CLASSES)
    )
    diversity_ratio = _color_diversity(imgs_nc, labels, len(GEN_CLASSES)) / max(
        div_data, 1e-9
    )
    summary = {
        "snapshot": snapshot,
        "sampler": _sampler_label(ddim_steps, noise_steps, ddim_eta,
                                  ddim_spacing, ddim_clip_x0)
                   + f", CFG {cfg_scale}",
        "accuracy": acc,
        "chance": 1.0 / len(GEN_CLASSES),
        "per_class_accuracy": per_class,
        "color_diversity_cfg_sampled": _color_diversity(imgs, labels, len(GEN_CLASSES)),
        "color_diversity_data": div_data,
        "diversity_ratio_cfg1": diversity_ratio,
        # both gates: classification far above chance (at the reference's
        # CFG-3) AND no within-class color mode collapse (at CFG-1)
        "passes": acc >= 0.9 and diversity_ratio >= 0.5,
    }
    print(json.dumps(summary, indent=2))
    return summary


def main():
    from diffusionremotesensing_tpu.utils import force_cpu_if_requested

    force_cpu_if_requested()
    p = argparse.ArgumentParser()
    p.add_argument("--prepare", type=str, default=None, metavar="DIR")
    p.add_argument("--evaluate", type=str, default=None, metavar="DIR")
    p.add_argument("--prepare_sar", type=str, default=None, metavar="DIR")
    p.add_argument("--prepare_gen", type=str, default=None, metavar="DIR")
    p.add_argument("--evaluate_gen", action="store_true")
    p.add_argument("--evaluate_sar", type=str, default=None, metavar="DIR")
    p.add_argument("--snapshot", type=str, default=None)
    p.add_argument("--ddim_steps", type=int, default=None)
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--ddim_spacing", type=str, default="linear",
                   choices=["linear", "quadratic"])
    p.add_argument("--ddim_clip_x0",
                   type=lambda v: str(v).lower() in ("yes", "true", "t", "1"),
                   nargs="?", const=True, default=True,
                   help="clamp the per-step DDIM x0 prediction (default on, "
                        "matching the production surfaces; pass 'false' to disable)")
    p.add_argument("--noise_steps", type=int, default=1500)
    p.add_argument("--eval_patch", type=int, default=None,
                   help="LR patch size for --evaluate (stride = half; "
                        "default 64/32 reference tiling; equal to the LR "
                        "tile edge = whole-tile mode)")
    p.add_argument("--eval_stride", type=int, default=None,
                   help="LR stride for --evaluate (default eval_patch/2; "
                        "= eval_patch gives non-overlapping tiling)")
    p.add_argument("--magnification", type=int, default=MAG,
                   help="SR factor of the snapshot under --evaluate (the "
                        "gate's eval tiles are degraded by the same factor)")
    p.add_argument("--start_t", type=int, default=None,
                   help="truncated warm-start sampling for --evaluate: "
                        "patches start from their q-sampled bicubic upsample "
                        "at this timestep (Aggregation_Sampling --start_t)")
    args = p.parse_args()
    if args.prepare:
        prepare(args.prepare)
    if args.prepare_sar:
        prepare_sar(args.prepare_sar)
    if args.evaluate:
        assert args.snapshot, "--evaluate needs --snapshot"
        evaluate(args.evaluate, args.snapshot, args.ddim_steps, args.noise_steps,
                 ddim_eta=args.ddim_eta, ddim_spacing=args.ddim_spacing,
                 ddim_clip_x0=args.ddim_clip_x0, mag=args.magnification,
                 eval_patch=args.eval_patch, eval_stride=args.eval_stride,
                 start_t=args.start_t)
    if args.evaluate_sar:
        assert args.snapshot, "--evaluate_sar needs --snapshot"
        evaluate_sar(args.evaluate_sar, args.snapshot, args.ddim_steps, args.noise_steps,
                     ddim_eta=args.ddim_eta, ddim_spacing=args.ddim_spacing,
                     ddim_clip_x0=args.ddim_clip_x0)
    if args.prepare_gen:
        prepare_gen(args.prepare_gen)
    if args.evaluate_gen:
        assert args.snapshot, "--evaluate_gen needs --snapshot"
        evaluate_gen(args.snapshot, noise_steps=args.noise_steps,
                     ddim_steps=args.ddim_steps, ddim_eta=args.ddim_eta,
                     ddim_spacing=args.ddim_spacing,
                     ddim_clip_x0=args.ddim_clip_x0)


if __name__ == "__main__":
    main()
