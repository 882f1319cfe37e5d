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
         ddim_steps: int = 100, tile_threads: int = 4) -> dict:
    """Sustained mixed-endpoint soak on the real chip: ``tile_threads``
    clients POST /superres_tile continuously (128px LR tiles through the
    tile lock + compiled aggregation path) while ``n_threads - tile_threads``
    clients loop the micro-batched POST /superres (plus periodic /healthz)
    for ``seconds``. Reports sustained QPS and latency percentiles PER
    ENDPOINT CLASS, a per-quarter starvation check (both classes must keep
    completing in every quarter of the window), error count, output
    distinctness (key-reuse check at scale), and RSS growth over the soak
    (leak check). Rates count only completions inside the requested window
    (the post-stop drain is reported separately, not folded into QPS —
    ADVICE round-4). The NOTES.md sustained-QPS rows come from this mode
    (VERDICT round-3 item 6; tile-first-class mix per VERDICT round-4
    item 2).

    Caveat on the quarter-granularity starvation check: a class whose
    per-request latency approaches seconds/4 can show an empty quarter on a
    healthy server — read `no_starvation` together with the per-quarter
    counts and latencies. A class with zero assigned threads is excluded
    (reported as vacuously non-starved)."""
    if not 0 <= tile_threads < n_threads:
        raise ValueError(
            f"tile_threads ({tile_threads}) must be < soak threads "
            f"({n_threads}) and >= 0 — with no /superres workers the "
            "'mixed-endpoint' soak would silently measure nothing"
        )
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

    import hashlib

    lock = threading.Lock()
    # per-completion (latency, t_done) pairs; t_done is relative to t_start
    lats: list = []
    tile_lats: list = []
    outs: set = set()          # sha256 of outputs — distinctness without
    errors: list = []          # retaining ~40 KB of base64 per request
    stop = threading.Event()
    t_start = 0.0              # set just before threads start

    def _record(sink: list, t0: float, r: dict):
        done = time.perf_counter()
        with lock:
            sink.append((done - t0, done - t_start))
            outs.add(hashlib.sha256(r["image"].encode()).hexdigest())

    def worker(wid: int):
        is_tile = wid < tile_threads
        i = 0
        while not stop.is_set():
            try:
                if is_tile:
                    # dedicated tile client: continuous 128px-LR tiles
                    # through the tile lock + compiled aggregation path
                    t0 = time.perf_counter()
                    r = _post(port, "/superres_tile", {"image": tile_b64})
                    _record(tile_lats, t0, r)
                elif i % 16 == 7:
                    with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=30
                    ) as r:
                        assert json.loads(r.read())["status"] == "ok"
                else:
                    t0 = time.perf_counter()
                    r = _post(port, "/superres", {"image": img_b64})
                    _record(lats, t0, r)
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
    drain_s = time.perf_counter() - t_start - seconds
    rss1 = _rss_mb()
    httpd.shutdown()
    server.batcher.shutdown()

    def _split(pairs):
        """(all latencies, in-window count, per-quarter in-window counts).
        Rates use only completions inside the requested window (the drain
        tail would inflate them — ADVICE round-4); latency percentiles use
        every completion (a latency is valid whenever it finishes)."""
        all_l = [l for (l, _) in pairs]
        quarters = [0, 0, 0, 0]
        for _, td in pairs:
            if td <= seconds:
                quarters[min(3, int(4 * td / seconds))] += 1
        return all_l, sum(quarters), quarters

    sr, sr_inw, sr_q = _split(lats)
    tl, tl_inw, tl_q = _split(tile_lats)
    n_ok = len(lats) + len(tile_lats)
    return {
        "mode": "soak",
        "max_batch": max_batch,
        "n_threads": n_threads,
        "tile_threads": tile_threads,
        "soak_seconds": seconds,
        "drain_seconds": round(drain_s, 1),
        "ddim_steps": ddim_steps,
        "requests_ok": n_ok,
        "requests_failed": len(errors),
        # rates over the REQUESTED window only (post-stop drain excluded)
        "sustained_req_per_s": round(sr_inw / seconds, 2),
        "latency_p50_s": round(_percentile(sr, 50), 3) if sr else None,
        "latency_p95_s": round(_percentile(sr, 95), 3) if sr else None,
        "superres_per_quarter": sr_q,
        "tile_requests": len(tl),
        "tile_req_per_s": round(tl_inw / seconds, 2),
        "tile_p50_s": round(_percentile(tl, 50), 3) if tl else None,
        "tile_p95_s": round(_percentile(tl, 95), 3) if tl else None,
        "tile_per_quarter": tl_q,
        # both endpoint classes completed work in every quarter of the
        # window -> neither starved behind the other's lock (classes with
        # no assigned threads are vacuously non-starved; see docstring for
        # the latency-vs-quarter granularity caveat)
        "no_starvation": (
            all(q > 0 for q in sr_q)
            and (tile_threads == 0 or all(q > 0 for q in tl_q))
        ),
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
    ap.add_argument("--tile_threads", type=int, default=4,
                    help="of --soak_threads, how many post /superres_tile "
                         "continuously (the rest drive /superres)")
    args = ap.parse_args()
    from diffusionremotesensing_tpu.utils import force_cpu_if_requested

    force_cpu_if_requested()
    if args.soak:
        print(json.dumps(soak(args.max_batch, args.soak, args.soak_threads,
                              args.ddim_steps, args.tile_threads)))
    else:
        print(json.dumps(bench(args.max_batch, args.quick, args.ddim_steps)))


if __name__ == "__main__":
    main()
