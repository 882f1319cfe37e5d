"""Benchmark: the north-star workload — full-tile 256px x2 super-resolution
via aggregation sampling on TPU, vs the PyTorch reference run serially.

Workload (BASELINE.json / BASELINE.md north star): a 256x256 LR Sentinel-2
style tile, x2 super-resolution through the flagship Residual Attention UNet,
tiled into overlapping 64px patches (stride 32 -> 49 patches, HR 128px each)
and blended with Gaussian weights — exactly the reference
Aggregation_Sampling.py flow (:76-116, :221-222), which denoises the patches
serially at batch 1. Here the patch axis is a batch axis: one jitted
lax.scan denoises a whole chunk per dispatch, chunks pipeline asynchronously.

Headline metric: HR patches/sec/chip at reference-parity T=1500 DDPM.
``vs_baseline`` is the wall-clock ratio against the torch reference
super-resolving the SAME tile serially on this host's CPU (the reference
publishes no timing numbers and no GPU is present; the torch number is
extrapolated from a measured per-forward rate x 49 patches x 1499 steps and
labeled as such). Secondary fields: tile wall-clock at T=1500 and DDIM-100,
raw forwards/sec, and an MFU estimate from a manual FLOP count
(XLA cost_analysis under-reports ~100x through the axon AOT path — see
benchmarks/NOTES.md).

Prints exactly ONE JSON line on stdout.
"""

import json
import os
import sys
import time

TILE = 256          # LR tile edge (north-star size)
MAG = 2
PATCH = 64          # reference Aggregation_Sampling.py:221 default
STRIDE = 32         # reference :222 default (50% overlap)
T = 1500            # reference inference default (superres_and_NDVIgen.py:27)
DDIM_STEPS = 100
BATCH = int(os.environ.get("DRS_BENCH_BATCH", "48"))
                    # measured optimum under s2d execution: B48 hits 10458
                    # fwd/s vs 8735 at B8 / 9363 at B32 / 8966 at B49 (T=1500
                    # sweep, benchmarks/NOTES.md round-2); the 49-patch tile
                    # runs as one 48-chunk + one batch-1 remainder (0.31s).
                    # DRS_BENCH_BATCH overrides for re-sweeps when kernel
                    # adoptions shift the balance (same-window A/B only)
HR_PATCH = PATCH * MAG
FLOPS_PER_FWD = 9.8e9  # manual count, HR128 forward (benchmarks/NOTES.md)
BF16_PEAK = {          # dense bf16 peak FLOP/s per chip
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _machine_scoped_cache() -> str:
    """Canonical implementation lives in the package (utils); kept here as
    the name harness/learning_check/NOTES reference."""
    from diffusionremotesensing_tpu.utils import machine_scoped_cache_dir

    return machine_scoped_cache_dir()


def _patch_count() -> int:
    from diffusionremotesensing_tpu.aggregation import patchify_coords

    return len(patchify_coords(TILE, TILE, PATCH, STRIDE, MAG))


def rep_stats(ts: list) -> dict:
    """Median / min / IQR of per-rep wall times — THE aggregation rule for
    every rep-list artifact (bench build_report, harness northstar_tile,
    ab_blend). One definition so BENCH/HARNESS/A-B artifacts can never
    disagree about what 'median' means (round-2 VERDICT weak #7; round-5
    review)."""
    s = sorted(ts)
    return {
        "median": s[len(s) // 2],
        "min": s[0],
        "iqr": s[(3 * len(s)) // 4] - s[len(s) // 4],
    }


def setup_flagship():
    """Build the bench's flagship sampler environment: the superres model
    (adopted kernel config + env A/B knobs), CPU-initialized variables moved
    to the default device, the cosine/1500 process, and the 256px LR tile.
    Shared with benchmarks/ab_blend.py so A/B runs measure the exact
    configuration the headline bench measures."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )

    # bfloat16 compute is the TPU-native inference path (+51% over f32);
    # parity/eval runs use f32 (see benchmarks/harness.py)
    # s2d=True: space-to-depth execution of the narrow-channel full-res level
    # (ops/s2d.py) — measured +62% sampler throughput on v5e, numerically
    # equivalent to the reference path (tests/test_s2d_model.py)
    # tap44='block': fused whole-ResConvBlock-0 Pallas kernel (BN folded,
    # shared im2col; ops/tap_block.py) — measured −4% step time vs the
    # dense-s2d kernels (benchmarks/NOTES.md round-3)
    from diffusionremotesensing_tpu.models.unet import resolve_tap44

    # DRS_PACKED_HEAD=1 enables the packed composed-head kernel for A/B
    # runs (ops/packed_head.py; measured E2E negative — NOTES.md round-3);
    # DRS_TAP44=<TAP44_LEVELS key> overrides the tap44 level for
    # same-window A/B measurements without editing code
    tap44 = resolve_tap44(os.environ.get("DRS_TAP44"))
    # DRS_FUSED_ATT=1 enables the fused stage-2 attention + packed head_at
    # kernel (ops/att_block.py); DRS_DEC_BLOCK=1 the fused decoder tail
    # (ops/dec_block.py) — both for same-window A/B measurements
    model = residual_attention_unet_superres(
        magnification_factor=MAG, dtype=jnp.bfloat16, s2d=True, tap44=tap44,
        packed_head=os.environ.get("DRS_PACKED_HEAD") == "1",
        fused_att=os.environ.get("DRS_FUSED_ATT") == "1",
        dec_block=os.environ.get("DRS_DEC_BLOCK") == "1",
    )
    # init on the CPU backend (flax init through the remote-TPU tunnel is
    # pathologically slow) with the f32 model so param dtypes stay float32
    init_model = residual_attention_unet_superres(magnification_factor=MAG)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = init_unet_params(init_model, jax.random.PRNGKey(0), image_size=HR_PATCH)
    variables = jax.device_put(variables, jax.devices()[0])

    # Enable the persistent compilation cache only now, AFTER the CPU-side
    # init compiles: XLA:CPU AOT cache loads emit spurious
    # '+prefer-no-scatter/+prefer-no-gather feature mismatch' errors on every
    # warm read (pseudo-features never reported by host detection), and a
    # cache from a different machine could genuinely fail to load. TPU
    # programs — the only expensive compiles here — still get cached, in a
    # machine-scoped dir as defense against cross-host /tmp reuse.
    jax.config.update("jax_compilation_cache_dir", _machine_scoped_cache())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    proc = make_process(model, "cosine", T, HR_PATCH)
    img = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(3), (TILE, TILE, 3)), np.float32
    )

    # DRS_QUANT=1: W8A8 static-calibration int8 execution (ops/quant.py) for
    # same-window A/B runs — calibrates on this tile's corner patches
    if os.environ.get("DRS_QUANT") == "1":
        from diffusionremotesensing_tpu.ops.quant import quantize_superres_tile

        variables = quantize_superres_tile(
            model, variables, proc.schedule.alpha_hat, img, PATCH, MAG,
            jax.random.PRNGKey(21),
        )
    return model, variables, proc, img


def run_tile_reps(sampler, variables, img, reps: int) -> list:
    """Warm up (compile) then time ``reps`` full tile runs; returns the
    per-rep wall seconds. Callers aggregate — the per-rep list is part of
    bench output so one bad tunnel window can't silently move a headline
    (the round-4 driver bench recorded a DDIM best-of-9 56% above the
    round-3 value while T=1500/MFU stayed flat; see NOTES.md round-5)."""
    import jax

    sampler(variables, img, key=jax.random.PRNGKey(7))  # warmup + compile
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        sampler(variables, img, key=jax.random.PRNGKey(11 + i))
        times.append(time.perf_counter() - t0)
    return times


def bench_tpu():
    import jax

    from diffusionremotesensing_tpu.aggregation import AggregationSampler
    from diffusionremotesensing_tpu.models.unet import (
        FUSED_UPDATE_NEEDS_TPU,
        fused_update_device_ok,
    )

    model, variables, proc, img = setup_flagship()

    # DRS_FUSED_UPDATE=1: fused Pallas ancestral-update + on-chip PRNG
    # (ops/fused_update.py) for same-window A/B runs
    fused = os.environ.get("DRS_FUSED_UPDATE") == "1"
    if fused and not fused_update_device_ok():
        # fail the A/B run with the reason rather than a Mosaic compile
        # error mid-measurement
        raise RuntimeError(FUSED_UPDATE_NEEDS_TPU)
    # DRS_BENCH_START_T=<t>: truncated warm-start sampling (--start_t) for
    # same-window A/B walls — quality for a config must be gated through
    # learning_check --start_t before any headline use (NOTES.md round-3)
    start_t = int(os.environ.get("DRS_BENCH_START_T", "0")) or None
    agg = AggregationSampler(
        proc, PATCH, STRIDE, MAG, batch_size=BATCH, fused_update=fused,
        start_t=start_t,
    )
    t1500_reps = run_tile_reps(agg, variables, img, reps=3)

    agg_ddim = AggregationSampler(
        proc, PATCH, STRIDE, MAG, batch_size=BATCH, ddim_steps=DDIM_STEPS,
        start_t=start_t,
    )
    # the ~1 s DDIM tile is short enough that one tunnel pipeline stall moves
    # a best-of-3 by ~25% (NOTES.md round-3); more reps are nearly free here
    ddim_reps = run_tile_reps(agg_ddim, variables, img, reps=9)

    kind = jax.devices()[0].device_kind
    return t1500_reps, ddim_reps, kind


def bench_torch_baseline():
    """Torch reference forward rate at batch 1 on this host's CPU, and the
    extrapolated serial wall-clock for the same 49-patch T=1500 tile."""
    if not os.path.isdir("/root/reference"):
        return None
    sys.path.insert(0, "/root/reference")
    import torch
    from UNet_model_superres import Residual_Attention_UNet_superres

    tm = Residual_Attention_UNet_superres(device="cpu")
    tm.eval()
    x = torch.randn(1, 3, HR_PATCH, HR_PATCH)
    t = torch.tensor([100])
    lr = torch.rand(1, 3, PATCH, PATCH)
    with torch.no_grad():
        tm(x, t, lr, MAG)  # warmup
        n, t0 = 10, time.perf_counter()
        for _ in range(n):
            tm(x, t, lr, MAG)
        rate = n / (time.perf_counter() - t0)
    return rate


def _wait_for_tpu():
    """Bounded wait for the remote-TPU tunnel before the real run.

    The axon tunnel has observed multi-hour outages (backend init hangs or
    returns UNAVAILABLE, benchmarks/NOTES.md); JAX caches a backend-init
    failure for the life of the process, so the probe runs in a SUBPROCESS
    and only the success/failure bit crosses back. Retries for up to
    DRS_TPU_WAIT_S seconds (default 900; 0 disables), then falls through to
    the normal path either way — a still-down tunnel fails there with the
    usual UNAVAILABLE error. Probe chatter goes to stderr; stdout keeps the
    one-JSON-line contract."""
    import subprocess

    wait_s = float(os.environ.get("DRS_TPU_WAIT_S", "900"))
    if wait_s <= 0:  # disabled: no probe at all, not even one 180s attempt
        return
    deadline = time.monotonic() + wait_s
    probe = (
        "import jax; jax.devices(); x = jax.numpy.ones((8, 128));"
        "jax.block_until_ready(x @ x.T)"
    )
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], timeout=180,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            if r.returncode == 0:
                if attempt > 1:
                    print(f"bench: TPU reachable (attempt {attempt})", file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            print(
                f"bench: TPU still unreachable after {attempt} probes; "
                "proceeding anyway", file=sys.stderr,
            )
            return
        print(
            f"bench: TPU unreachable (probe {attempt}); retrying in 60s",
            file=sys.stderr,
        )
        time.sleep(60)


def build_report(n_patches, t1500_reps, ddim_reps, kind, torch_rate) -> dict:
    """Assemble the one-line JSON report from raw per-rep timings.
    Factored from main() so the output contract (keys, aggregation rules)
    is unit-testable without a TPU (tests/test_bench_wait.py)."""
    # headline stays best-of-3 (comparable with BENCH_r01-r04); the DDIM row
    # reports the MEDIAN with per-rep times + IQR so a single degraded tunnel
    # window is visible in the record instead of silently moving the number
    tile_s = min(t1500_reps)
    ddim = rep_stats(ddim_reps)
    tile_ddim_s = ddim["median"]
    ddim_iqr = ddim["iqr"]
    fwd_per_tile = n_patches * (T - 1)
    fwd_rate = fwd_per_tile / tile_s
    peak = BF16_PEAK.get(kind)
    mfu = (fwd_rate * FLOPS_PER_FWD / peak) if peak else None

    torch_tile_s = fwd_per_tile / torch_rate if torch_rate else None
    vs = torch_tile_s / tile_s if torch_tile_s else None

    return {
        "metric": "sr_tile256_x2_aggregation_patches_per_sec_per_chip",
        "value": round(n_patches / tile_s, 3),
        "unit": (
            "HR-128px patches/sec/chip (256px LR tile x2, patch 64/"
            "stride 32, 49 patches, T=1500 DDPM cosine, bf16, best-of-3)"
        ),
        "vs_baseline": round(vs, 1) if vs else None,
        "tile_seconds_t1500": round(tile_s, 3),
        # DDIM-100 with clip_x0 (the AggregationSampler default):
        # 33.95 dB / 0.960 SSIM vs bicubic 23.97 / 0.854 on the
        # 95k-step learning-gate snapshot (benchmarks/NOTES.md) —
        # beats bicubic on BOTH metrics at this speed point.
        # Median of 9 reps; per-rep list + IQR recorded so tunnel
        # variance is visible (NOTES.md round-5 A/B).
        "tile_seconds_ddim100": round(tile_ddim_s, 3),
        "ddim100_rep_seconds": [round(t, 3) for t in ddim_reps],
        "ddim100_iqr_seconds": round(ddim_iqr, 3),
        "t1500_rep_seconds": [round(t, 3) for t in t1500_reps],
        "unet_forwards_per_sec": round(fwd_rate, 1),
        "mfu_pct": round(100 * mfu, 1) if mfu else None,
        "device_kind": kind,
        "torch_baseline": {
            "forwards_per_sec_cpu_batch1": round(torch_rate, 3) if torch_rate else None,
            "tile_seconds_extrapolated": round(torch_tile_s, 1) if torch_tile_s else None,
            "note": (
                "reference publishes no timings and no GPU is present; "
                "serial tile wall-clock extrapolated from measured "
                "per-forward CPU rate x 49 patches x 1499 steps "
                "(Aggregation_Sampling.py:94-95 runs patches serially)"
            ),
        },
    }


def main():
    # makes the bench smokeable in CI / during tunnel outages
    from diffusionremotesensing_tpu.utils import force_cpu_if_requested

    if not force_cpu_if_requested():
        _wait_for_tpu()
    n_patches = _patch_count()
    t1500_reps, ddim_reps, kind = bench_tpu()
    torch_rate = bench_torch_baseline()
    print(json.dumps(build_report(n_patches, t1500_reps, ddim_reps, kind, torch_rate)))


if __name__ == "__main__":
    main()
