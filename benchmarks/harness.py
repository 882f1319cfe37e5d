"""Benchmark harness: throughput and quality metrics vs the PyTorch reference.

The reference publishes no quantitative numbers (BASELINE.md), so this
harness measures everything the north star asks for:

* ``denoise_steps_per_sec``   — jitted scan sampler, flagship superres config
  (HR 128px, x2), reported as model-forwards/sec and batch-images/sec.
* ``patches_per_sec``         — end-to-end aggregation sampling on a full LR
  tile (patchify + batched scan + Gaussian-blend reassembly).
* ``torch_baseline``          — the reference model's forward rate at batch 1
  on this host (CPU; the environment has no GPU), the denominator for
  ``vs_baseline``.
* ``quality``                 — PSNR/SSIM of our torch-checkpoint-imported
  forward vs the torch forward on the same inputs (weights are stripped from
  the mounted checkpoints, so this uses a freshly-initialized torch model —
  it measures numerical parity of the stacks, not task quality).

Run: ``python -m benchmarks.harness [--quick]``. Prints a JSON document.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# BATCH matches the adopted s2d aggregation optimum (bench.py BATCH=48,
# benchmarks/NOTES.md round-2 sweep) so the harness and the driver bench
# report the same configuration; override with --batch.
LR_SIZE, MAG, T, BATCH = 64, 2, 200, 48
HR_SIZE = LR_SIZE * MAG


def _tpu_setup(dtype_name: str, use_pallas: bool, s2d: bool = True):
    import jax
    import jax.numpy as jnp

    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )

    from diffusionremotesensing_tpu.models.unet import default_tap44

    dtype = {"f32": None, "bf16": jnp.bfloat16}[dtype_name]
    model = residual_attention_unet_superres(
        magnification_factor=MAG, dtype=dtype, use_pallas=use_pallas, s2d=s2d,
        tap44=default_tap44() if s2d else False,
    )
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    init_model = residual_attention_unet_superres(magnification_factor=MAG)
    if cpu is not None:
        with jax.default_device(cpu):
            variables = init_unet_params(init_model, jax.random.PRNGKey(0), image_size=HR_SIZE)
    else:
        variables = init_unet_params(init_model, jax.random.PRNGKey(0), image_size=HR_SIZE)
    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)

    proc = make_process(model, "cosine", T, HR_SIZE)
    return model, variables, proc, dev


def bench_denoise(dtype_name: str = "bf16", use_pallas: bool = False, reps: int = 3, s2d: bool = True, batch: int = BATCH):
    import jax

    _, variables, proc, dev = _tpu_setup(dtype_name, use_pallas, s2d=s2d)
    sampler = proc.sampler()
    key = jax.random.PRNGKey(1)
    x_T = jax.device_put(jax.random.normal(jax.random.PRNGKey(2), (batch, HR_SIZE, HR_SIZE, 3)), dev)
    cond = jax.device_put(jax.random.uniform(jax.random.PRNGKey(3), (batch, LR_SIZE, LR_SIZE, 3)), dev)
    jax.block_until_ready(sampler(variables, key, x_T, cond))
    # second warmup: the first executions of a fresh executable through the
    # remote tunnel run measurably slower (same effect as bench_train)
    jax.block_until_ready(sampler(variables, jax.random.fold_in(key, 99), x_T, cond))
    dt = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(sampler(variables, jax.random.fold_in(key, i), x_T, cond))
        dt = min(dt, time.perf_counter() - t0)
    return {
        "unet_forwards_per_sec": batch * (T - 1) / dt,
        "images_per_sec": batch / dt,
        "seconds_per_sample_batch": dt,
        "config": f"HR{HR_SIZE} x{MAG} T{T} B{batch} {dtype_name}"
        + (" pallas" if use_pallas else "")
        + (" s2d" if s2d else ""),
    }


def bench_aggregation(dtype_name: str = "bf16", tile_lr: int = 128, batch: int = BATCH):
    """Full-tile SR via aggregation sampling: LR tile -> HR, patches/sec."""
    import jax

    from diffusionremotesensing_tpu.aggregation import AggregationSampler

    _, variables, proc, dev = _tpu_setup(dtype_name, False)
    agg = AggregationSampler(
        proc, patch_size=LR_SIZE, stride=LR_SIZE // 2, magnification_factor=MAG,
        batch_size=batch,
    )
    img = np.random.default_rng(0).random((tile_lr, tile_lr, 3)).astype(np.float32)
    n_patches = len(agg.extract_patches(img)[1])
    # warm start (compile)
    agg(variables, img, key=jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    out = agg(variables, img, key=jax.random.PRNGKey(1))
    dt = time.perf_counter() - t0
    assert out.shape == (tile_lr * MAG, tile_lr * MAG, 3)
    return {
        "patches": n_patches,
        "patches_per_sec": n_patches / dt,
        "tile_seconds": dt,
        "config": f"LR tile {tile_lr} patch {LR_SIZE} stride {LR_SIZE//2} x{MAG} T{T} {dtype_name}",
    }


def bench_train(dtype_name: str = "f32", batch: int = 16, steps: int = 20):
    """Training-step throughput (forward + backward + Adam + EMA, jitted)."""
    import jax

    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )
    from diffusionremotesensing_tpu.train import Trainer

    model = residual_attention_unet_superres(magnification_factor=MAG)
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            variables = init_unet_params(model, jax.random.PRNGKey(0), image_size=HR_SIZE)
    except RuntimeError:
        variables = init_unet_params(model, jax.random.PRNGKey(0), image_size=HR_SIZE)
    variables = jax.device_put(variables, jax.devices()[0])
    trainer = Trainer(
        model, "cosine", noise_steps=T, image_size=HR_SIZE, lr=1e-4,
        loss="MSE", ema_smoothing=True,
    )
    state = trainer.init_state(variables)
    step = trainer._build_train_step()
    rng = np.random.default_rng(0)
    batch_data = {
        "x": rng.random((batch, HR_SIZE, HR_SIZE, 3)).astype(np.float32),
        "cond": rng.random((batch, LR_SIZE, LR_SIZE, 3)).astype(np.float32),
    }
    state, loss = step(state, batch_data, trainer.next_key())  # compile
    import jax as _j

    _j.block_until_ready(loss)
    # the first ~10 post-compile steps run 3-5x slower through the remote
    # tunnel (executable/buffer warm-up); time the steady state, best-of-3
    for _ in range(8):
        state, loss = step(state, batch_data, trainer.next_key())
    _j.block_until_ready(loss)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = step(state, batch_data, trainer.next_key())
        _j.block_until_ready(loss)
        dt = min(dt, (time.perf_counter() - t0) / steps)
    return {
        "train_steps_per_sec": 1.0 / dt,
        "images_per_sec": batch / dt,
        "config": f"HR{HR_SIZE} x{MAG} B{batch} MSE+EMA {dtype_name}",
    }


def bench_northstar_tile():
    """The driver bench's north-star workload (256px LR tile x2, T=1500),
    via bench.bench_tpu itself so HARNESS_r0N.json and BENCH_r0N.json can
    never disagree about the framework's speed (round-2 VERDICT weak #7)."""
    import bench

    t1500_reps, ddim_reps, kind = bench.bench_tpu()
    # aggregation shared with bench.build_report (bench.rep_stats): best-of-3
    # headline, DDIM median — one definition, so the files can't diverge
    tile_s = min(t1500_reps)
    tile_ddim_s = bench.rep_stats(ddim_reps)["median"]
    n_patches = bench._patch_count()
    return {
        "tile_seconds_t1500": tile_s,
        "tile_seconds_ddim100": tile_ddim_s,
        "ddim100_rep_seconds": [round(t, 3) for t in ddim_reps],
        "patches_per_sec": n_patches / tile_s,
        "unet_forwards_per_sec": n_patches * (bench.T - 1) / tile_s,
        "config": (
            f"LR tile {bench.TILE} patch {bench.PATCH} stride {bench.STRIDE} "
            f"x{bench.MAG} T{bench.T} B{bench.BATCH} bf16 s2d ({kind})"
        ),
    }


def bench_torch_baseline(reps: int = 10):
    if not os.path.isdir("/root/reference"):
        return None
    sys.path.insert(0, "/root/reference")
    import torch
    from UNet_model_superres import Residual_Attention_UNet_superres

    tm = Residual_Attention_UNet_superres(device="cpu")
    tm.eval()
    x = torch.randn(1, 3, HR_SIZE, HR_SIZE)
    t = torch.tensor([100])
    lr = torch.rand(1, 3, LR_SIZE, LR_SIZE)
    with torch.no_grad():
        tm(x, t, lr, MAG)
        t0 = time.perf_counter()
        for _ in range(reps):
            tm(x, t, lr, MAG)
        dt = (time.perf_counter() - t0) / reps
    return {"forwards_per_sec": 1.0 / dt, "hardware": "host CPU (no GPU present)"}


def bench_quality():
    """Numerical parity of the imported-checkpoint forward vs torch."""
    if not os.path.isdir("/root/reference"):
        return None
    sys.path.insert(0, "/root/reference")
    import jax
    import jax.numpy as jnp
    import torch
    from UNet_model_superres import Residual_Attention_UNet_superres

    from diffusionremotesensing_tpu.io import import_torch_state_dict
    from diffusionremotesensing_tpu.models.unet import residual_attention_unet_superres
    from diffusionremotesensing_tpu.utils import psnr, ssim

    tm = Residual_Attention_UNet_superres(device="cpu")
    tm.eval()
    variables = import_torch_state_dict(tm.state_dict())
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, HR_SIZE, HR_SIZE)).astype(np.float32)
    lr = rng.standard_normal((2, 3, LR_SIZE, LR_SIZE)).astype(np.float32)
    t = np.array([7, 123], np.int64)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(lr), MAG)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    fm = residual_attention_unet_superres(magnification_factor=MAG)
    got = np.asarray(
        fm.apply(
            variables,
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t),
            jnp.asarray(lr.transpose(0, 2, 3, 1)),
            train=False,
        )
    )
    # the s2d fast-inference path must hold the same parity vs torch
    fm_s2d = residual_attention_unet_superres(magnification_factor=MAG, s2d=True)
    got_s2d = np.asarray(
        fm_s2d.apply(
            variables,
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t),
            jnp.asarray(lr.transpose(0, 2, 3, 1)),
            train=False,
        )
    )
    rng_ = float(ref.max() - ref.min())
    return {
        "forward_psnr_db_vs_torch": psnr(got, ref, data_range=rng_),
        "forward_ssim_vs_torch": ssim(got, ref, data_range=rng_),
        "max_abs_err": float(np.abs(got - ref).max()),
        "s2d_forward_psnr_db_vs_torch": psnr(got_s2d, ref, data_range=rng_),
        "s2d_max_abs_err": float(np.abs(got_s2d - ref).max()),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="skip aggregation bench")
    parser.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--batch", type=int, default=BATCH,
                        help="batch for the denoise/aggregation sections; "
                             "northstar_tile always runs bench.py's adopted "
                             "config and bench_train its own (see each "
                             "section's config string)")
    args = parser.parse_args()

    import jax

    from diffusionremotesensing_tpu.utils import force_cpu_if_requested

    force_cpu_if_requested()

    # machine-scoped cache dir (same rationale as bench.py: a persistent
    # cache written on another host emits spurious XLA:CPU AOT
    # feature-mismatch errors / could fail to load)
    from bench import _machine_scoped_cache

    jax.config.update(
        "jax_compilation_cache_dir", os.environ.get("JAX_CACHE", _machine_scoped_cache())
    )
    # never WRITE the small CPU-init compiles (1-2s) into the cache: warm
    # loads of XLA:CPU AOT entries always emit 'machine features mismatch'
    # errors (+prefer-no-gather/scatter pseudo-features are absent from
    # runtime host detection); the 30s+ TPU tunnel compiles still cache
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    report = {"device": str(jax.devices()[0])}
    report["denoise"] = bench_denoise(args.dtype, batch=args.batch)
    if not args.quick:
        report["aggregation"] = bench_aggregation(args.dtype, batch=args.batch)
        report["northstar_tile"] = bench_northstar_tile()
        report["train"] = bench_train()
    report["torch_baseline"] = bench_torch_baseline()
    report["quality"] = bench_quality()
    if report["torch_baseline"]:
        report["vs_baseline"] = (
            report["denoise"]["unet_forwards_per_sec"]
            / report["torch_baseline"]["forwards_per_sec"]
        )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
