"""Serving benchmark: latency/throughput of the micro-batching HTTP server.

The reference has no serving story; serving.InferenceServer is a framework
addition, so this benchmark pins its production numbers on the real chip:

* **p50/p95 single-request latency** through the actual HTTP layer
  (POST /superres, base64 PNG in/out) for the two production sampler
  configs: DDIM-100 (clip_x0, the advertised fast path) and reference-parity
  DDPM T=1500;
* **throughput under concurrency**: 2x max_batch clients fire at once and
  the micro-batcher folds them into max_batch-sized device batches.

Flagship patch shape (LR 64 -> HR 128, x2, bf16, s2d + tap44 defaults) —
the same per-patch program the aggregation tile bench uses, so the numbers
compose: a served patch should cost ~(tile_seconds / 49) * (48/max_batch)
plus HTTP/PNG overhead.

Usage: python -m benchmarks.serving_bench [--max_batch 8] [--quick]
Prints one JSON line (stdout); progress goes to stderr.
"""

from __future__ import annotations

import argparse
import base64
import io as _io
import json
import os
import sys
import threading
import time
import urllib.request


def _post(port: int, path: str, payload: dict, timeout: float = 600):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _png_b64(arr) -> str:
    from PIL import Image
    import numpy as np

    im = Image.fromarray((np.clip(arr, 0, 1) * 255).astype("uint8"))
    buf = _io.BytesIO()
    im.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _percentile(xs, q):
    xs = sorted(xs)
    i = min(len(xs) - 1, max(0, round(q / 100 * (len(xs) - 1))))
    return xs[i]


def bench(max_batch: int, quick: bool, ddim_steps: int = 100) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )
    from diffusionremotesensing_tpu.serving import InferenceServer
    from diffusionremotesensing_tpu.utils import machine_scoped_cache_dir

    LR, MAG, T = 64, 2, 1500
    model = residual_attention_unet_superres(
        magnification_factor=MAG, dtype=jnp.bfloat16, s2d=True
    )
    init_model = residual_attention_unet_superres(magnification_factor=MAG)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = init_unet_params(
            init_model, jax.random.PRNGKey(0), image_size=LR * MAG
        )
    variables = jax.device_put(variables, jax.devices()[0])
    jax.config.update("jax_compilation_cache_dir", machine_scoped_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    lr_img = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(3), (LR, LR, 3)), np.float32
    )
    img_b64 = _png_b64(lr_img)

    out: dict = {"max_batch": max_batch}
    ddim_name = f"ddim{ddim_steps}"
    configs = (
        [(ddim_name, ddim_steps)]
        if quick
        else [(ddim_name, ddim_steps), ("ddpm1500", None)]
    )
    for name, ddim in configs:
        server = InferenceServer(
            model,
            variables,
            noise_schedule="cosine",
            noise_steps=T,
            image_size=LR * MAG,
            task="superres",
            max_batch=max_batch,
            ddim_steps=ddim,
        )
        httpd = server.make_http_server(port=0, warmup=False)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            print(f"serving_bench: warmup {name}", file=sys.stderr)
            server.warmup()  # compile before timing

            # sequential latency through real HTTP (each request still rides
            # a full max_batch device program — the padded-batch design)
            n_lat = 5 if quick else 9
            lats = []
            for _ in range(n_lat):
                t0 = time.perf_counter()
                r = _post(port, "/superres", {"image": img_b64})
                lats.append(time.perf_counter() - t0)
                assert "image" in r, r
            out[f"{name}_latency_p50_s"] = round(_percentile(lats, 50), 3)
            out[f"{name}_latency_p95_s"] = round(_percentile(lats, 95), 3)

            # concurrent throughput: 2 full batches of clients at once
            n_conc = 2 * max_batch
            results = [None] * n_conc

            def worker(i):
                t0 = time.perf_counter()
                _post(port, "/superres", {"image": img_b64})
                results[i] = time.perf_counter() - t0

            threads = [
                threading.Thread(target=worker, args=(i,)) for i in range(n_conc)
            ]
            t0 = time.perf_counter()
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            wall = time.perf_counter() - t0
            out[f"{name}_concurrent_req_per_s"] = round(n_conc / wall, 2)
            out[f"{name}_concurrent_p95_s"] = round(
                _percentile([r for r in results if r], 95), 3
            )
        finally:
            httpd.shutdown()
            server.batcher.shutdown()
    out["device_kind"] = jax.devices()[0].device_kind
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--quick", action="store_true", help="DDIM only, fewer reps")
    ap.add_argument("--ddim_steps", type=int, default=100,
                    help="step count for the DDIM config (smoke: 3)")
    args = ap.parse_args()
    from diffusionremotesensing_tpu.utils import force_cpu_if_requested

    force_cpu_if_requested()
    print(json.dumps(bench(args.max_batch, args.quick, args.ddim_steps)))


if __name__ == "__main__":
    main()
