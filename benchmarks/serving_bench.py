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


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def soak(max_batch: int, seconds: float, n_threads: int,
         ddim_steps: int = 100) -> dict:
    """Sustained mixed-endpoint soak on the real chip: ``n_threads`` clients
    loop POST /superres (plus periodic /healthz and one /superres_tile per
    thread) for ``seconds``. Reports sustained QPS, latency percentiles,
    error count, output distinctness (key-reuse check at scale), and RSS
    growth over the soak (leak check). The NOTES.md sustained-QPS row comes
    from this mode (VERDICT round-3 item 6)."""
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

    server = InferenceServer(
        model, variables, noise_schedule="cosine", noise_steps=T,
        image_size=LR * MAG, task="superres", max_batch=max_batch,
        ddim_steps=ddim_steps,
    )
    httpd = server.make_http_server(port=0, warmup=False)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    lr_img = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(3), (LR, LR, 3)), np.float32
    )
    img_b64 = _png_b64(lr_img)
    tile_b64 = _png_b64(
        np.asarray(jax.random.uniform(jax.random.PRNGKey(4), (2 * LR, 2 * LR, 3)),
                   np.float32)
    )

    lock = threading.Lock()
    lats: list = []
    outs: set = set()
    errors: list = []
    tile_walls: list = []
    stop = threading.Event()

    def worker(wid: int):
        did_tile = False
        i = 0
        while not stop.is_set():
            try:
                if i % 16 == 7:
                    with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=30
                    ) as r:
                        assert json.loads(r.read())["status"] == "ok"
                elif not did_tile and i == 3 and wid < 2:
                    # a couple of tile requests ride along (they serialize on
                    # the tile lock; keep them rare so QPS reads the
                    # micro-batched endpoint)
                    t0 = time.perf_counter()
                    r = _post(port, "/superres_tile", {"image": tile_b64})
                    with lock:
                        tile_walls.append(time.perf_counter() - t0)
                        outs.add(r["image"])
                    did_tile = True
                else:
                    t0 = time.perf_counter()
                    r = _post(port, "/superres", {"image": img_b64})
                    with lock:
                        lats.append(time.perf_counter() - t0)
                        outs.add(r["image"])
            except Exception as e:
                with lock:
                    errors.append(repr(e))
            i += 1

    print("serving_bench soak: warmup", file=sys.stderr)
    server.warmup()
    _post(port, "/superres_tile", {"image": tile_b64})  # compile tile path
    rss0 = _rss_mb()
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join(timeout=600)
    wall = time.perf_counter() - t_start
    rss1 = _rss_mb()
    httpd.shutdown()
    server.batcher.shutdown()

    n_ok = len(lats) + len(tile_walls)
    return {
        "mode": "soak",
        "max_batch": max_batch,
        "n_threads": n_threads,
        "soak_seconds": round(wall, 1),
        "ddim_steps": ddim_steps,
        "requests_ok": n_ok,
        "requests_failed": len(errors),
        "sustained_req_per_s": round(len(lats) / wall, 2),
        "latency_p50_s": round(_percentile(lats, 50), 3) if lats else None,
        "latency_p95_s": round(_percentile(lats, 95), 3) if lats else None,
        "tile_requests": len(tile_walls),
        "tile_p95_s": round(_percentile(tile_walls, 95), 3) if tile_walls else None,
        "all_outputs_distinct": len(outs) == n_ok,
        "rss_growth_mb": round(rss1 - rss0, 1),
        "errors_sample": errors[:3],
        "device_kind": __import__("jax").devices()[0].device_kind,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--quick", action="store_true", help="DDIM only, fewer reps")
    ap.add_argument("--ddim_steps", type=int, default=100,
                    help="step count for the DDIM config (smoke: 3)")
    ap.add_argument("--soak", type=float, default=None, metavar="SECONDS",
                    help="sustained mixed-endpoint soak for this many seconds "
                         "(reports sustained QPS / p95 / leak+key-reuse checks)")
    ap.add_argument("--soak_threads", type=int, default=16)
    args = ap.parse_args()
    from diffusionremotesensing_tpu.utils import force_cpu_if_requested

    force_cpu_if_requested()
    if args.soak:
        print(json.dumps(soak(args.max_batch, args.soak, args.soak_threads,
                              args.ddim_steps)))
    else:
        print(json.dumps(bench(args.max_batch, args.quick, args.ddim_steps)))


if __name__ == "__main__":
    main()
