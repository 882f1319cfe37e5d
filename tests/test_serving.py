"""Serving layer: micro-batching semantics and the HTTP surface."""

import base64
import io
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest
from PIL import Image

from diffusionremotesensing_tpu.models.unet import (
    init_unet_params,
    residual_attention_unet_generation,
    residual_attention_unet_superres,
)
from diffusionremotesensing_tpu.serving import InferenceServer, MicroBatcher


def test_microbatcher_batches_and_orders():
    calls = []

    def run_batch(items):
        calls.append(len(items))
        return [i * 2 for i in items]

    mb = MicroBatcher(run_batch, max_batch=4, max_wait_ms=50)
    handles = [mb.submit(i) for i in range(6)]
    results = [h.get(timeout=5) for h in handles]
    assert results == [0, 2, 4, 6, 8, 10]
    assert sum(calls) == 6
    assert max(calls) <= 4
    mb.shutdown()


def test_microbatcher_propagates_errors():
    def run_batch(items):
        raise RuntimeError("boom")

    mb = MicroBatcher(run_batch, max_batch=2, max_wait_ms=10)
    r = mb.submit(1).get(timeout=5)
    assert isinstance(r, RuntimeError)
    mb.shutdown()


def _superres_server(size=16, mag=2, max_batch=4):
    model = residual_attention_unet_superres(magnification_factor=mag)
    variables = init_unet_params(model, jax.random.PRNGKey(0), image_size=size)
    return InferenceServer(
        model, variables, noise_schedule="linear", noise_steps=6,
        image_size=size, task="superres", max_batch=max_batch, max_wait_ms=20,
    )


def test_infer_batch_superres_shapes():
    srv = _superres_server()
    lr = [np.random.default_rng(i).random((8, 8, 3)).astype(np.float32) for i in range(3)]
    outs = srv.infer_batch(lr)
    assert len(outs) == 3
    for o in outs:
        assert o.shape == (16, 16, 3)
        assert o.min() >= 0 and o.max() <= 1
    srv.batcher.shutdown()


def test_generation_server_with_labels():
    model = residual_attention_unet_generation(num_classes=3)
    variables = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    srv = InferenceServer(
        model, variables, noise_schedule="cosine", noise_steps=5,
        image_size=16, task="generation", max_batch=4, ddim_steps=3,
    )
    outs = srv.infer_batch([np.int32(0), np.int32(2)])
    assert outs[0].shape == (16, 16, 3)
    srv.batcher.shutdown()
    # clip_x0 opt-out (CLAUDE.md: measured-best sub-option defaults keep an
    # explicit opt-out): the unclamped trajectory must be selectable
    srv2 = InferenceServer(
        model, variables, noise_schedule="cosine", noise_steps=5,
        image_size=16, task="generation", max_batch=4, ddim_steps=3,
        ddim_clip_x0=False,
    )
    outs2 = srv2.infer_batch([np.int32(0), np.int32(2)])
    assert outs2[0].shape == (16, 16, 3)
    srv2.batcher.shutdown()


def test_http_surface():
    srv = _superres_server()
    httpd = srv.make_http_server(port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # healthz
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert json.loads(r.read())["status"] == "ok"
        # superres round-trip
        img = Image.fromarray(
            (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(np.uint8)
        )
        buf = io.BytesIO()
        img.save(buf, "PNG")
        body = json.dumps({"image": base64.b64encode(buf.getvalue()).decode()}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/superres", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        png = base64.b64decode(out["image"])
        arr = np.asarray(Image.open(io.BytesIO(png)))
        assert arr.shape == (16, 16, 3)
        # wrong path -> 404
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()
        srv.batcher.shutdown()


def test_mesh_sharded_server_matches_unsharded():
    """mesh= spans the 8-virtual-device CPU mesh: params replicate, each
    micro-batch shards along its batch axis. Same seed -> identical x_T and
    noise stream, and the scan body has no cross-sample term, so the sharded
    server must reproduce the single-device outputs (fp tolerance only —
    partitioning reassociates reductions)."""
    from diffusionremotesensing_tpu.parallel.sharding import make_mesh

    model = residual_attention_unet_superres(magnification_factor=2)
    variables = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    kw = dict(noise_schedule="linear", noise_steps=6, image_size=16,
              task="superres", max_batch=8, max_wait_ms=20, seed=3)
    srv_1 = InferenceServer(model, variables, **kw)
    srv_m = InferenceServer(model, variables, mesh=make_mesh(), **kw)
    lr = [np.random.default_rng(i).random((8, 8, 3)).astype(np.float32)
          for i in range(3)]
    # drive _run_batch directly: deterministic batch composition (the
    # threaded MicroBatcher may split the 3 requests differently per server)
    a = srv_1._run_batch(lr)
    b = srv_m._run_batch(lr)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=2e-5)
    srv_1.batcher.shutdown()
    srv_m.batcher.shutdown()


def test_mesh_sharded_generation_and_divisibility():
    from diffusionremotesensing_tpu.parallel.sharding import make_mesh

    mesh = make_mesh()
    model = residual_attention_unet_generation(num_classes=3)
    variables = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    kw = dict(noise_schedule="cosine", noise_steps=5, image_size=16,
              task="generation", ddim_steps=3, seed=1)
    srv_1 = InferenceServer(model, variables, max_batch=8, **kw)
    srv_m = InferenceServer(model, variables, max_batch=8, mesh=mesh, **kw)
    a = srv_1._run_batch([np.int32(0), np.int32(2)])
    b = srv_m._run_batch([np.int32(0), np.int32(2)])
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=2e-5)
    srv_1.batcher.shutdown()
    srv_m.batcher.shutdown()
    # max_batch must split evenly over the mesh
    import pytest

    with pytest.raises(ValueError, match="divisible"):
        InferenceServer(model, variables, max_batch=3, mesh=mesh, **kw)


def test_validation_rejects_bad_inputs():
    srv = _superres_server()
    # wrong spatial size
    try:
        srv.infer_batch([np.zeros((9, 9, 3), np.float32)])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "shape" in str(e)
    srv.batcher.shutdown()
    # out-of-range label
    model = residual_attention_unet_generation(num_classes=3)
    variables = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    gsrv = InferenceServer(
        model, variables, noise_schedule="linear", noise_steps=4,
        image_size=16, task="generation", max_batch=2,
    )
    try:
        gsrv.infer_batch([np.int32(7)])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "out of range" in str(e)
    gsrv.batcher.shutdown()


def test_shutdown_fails_pending_and_new_requests():
    import queue as _q

    def slow(items):
        import time as _t

        _t.sleep(0.2)
        return items

    mb = MicroBatcher(slow, max_batch=1, max_wait_ms=1)
    h1 = mb.submit(1)
    mb.shutdown()
    r1 = h1.get(timeout=5)
    assert r1 == 1 or isinstance(r1, RuntimeError)  # in-flight may finish
    # new submissions after shutdown fail fast instead of hanging
    r2 = mb.submit(2).get(timeout=5)
    assert isinstance(r2, RuntimeError)


def test_infer_tile_forwards_ddim_config():
    """The lazy AggregationSampler behind /superres_tile must inherit the
    server's DDIM configuration — a server launched with --ddim_clip_x0
    false must not silently clip on the tile endpoint."""
    model = residual_attention_unet_superres(magnification_factor=2)
    variables = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    kw = dict(noise_schedule="linear", noise_steps=6, image_size=16,
              task="superres", max_batch=4, max_wait_ms=20, ddim_steps=3)
    tile = np.random.default_rng(3).random((16, 16, 3)).astype(np.float32)
    for clip in (True, False):
        srv = InferenceServer(model, variables, ddim_clip_x0=clip, **kw)
        srv.infer_tile(tile)  # builds the lazy sampler
        assert srv._agg.ddim_steps == 3
        assert srv._agg.ddim_clip_x0 is clip
        srv.batcher.shutdown()


def test_infer_tile_aggregation_endpoint():
    """/superres_tile: whole-scene tiled SR through aggregation sampling
    (the Aggregation_Sampling.py flow behind the serving surface)."""
    srv = _superres_server()  # model input LR 8 -> HR 16, so patch_size=8
    tile = np.random.default_rng(3).random((16, 16, 3)).astype(np.float32)
    out = srv.infer_tile(tile)
    assert out.shape == (32, 32, 3)
    assert out.min() >= 0 and out.max() <= 1

    # validation: too-small tiles and wrong channel counts are rejected
    for bad in (np.zeros((4, 4, 3), np.float32), np.zeros((16, 16, 1), np.float32)):
        try:
            srv.infer_tile(bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass

    # HTTP surface
    httpd = srv.make_http_server(port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        img = Image.fromarray((tile * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, "PNG")
        body = json.dumps({"image": base64.b64encode(buf.getvalue()).decode()}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/superres_tile", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        arr = np.asarray(Image.open(io.BytesIO(base64.b64decode(out["image"]))))
        assert arr.shape == (32, 32, 3)
    finally:
        httpd.shutdown()
        srv.batcher.shutdown()


def test_generate_malformed_label_is_400():
    """Malformed label TYPES are request errors (400), not server faults
    (500): the validation layer must cover type coercion too."""
    model = residual_attention_unet_generation(num_classes=3)
    variables = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    srv = InferenceServer(
        model, variables, noise_schedule="linear", noise_steps=4,
        image_size=16, task="generation", max_batch=2,
    )
    httpd = srv.make_http_server(port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        # 10**19 coerces via int() but overflows np.int32 (OverflowError —
        # a third exception type beyond TypeError/ValueError)
        for bad in ["cat", None, [1, 2], 10**19]:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({"label": bad}).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                urllib.request.urlopen(req, timeout=10)
                raise AssertionError("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400, (bad, e.code)
                assert "label" in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()
        srv.batcher.shutdown()


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


@pytest.mark.slow
def test_soak_mixed_endpoints_under_concurrency():
    """Sustained-concurrency soak (VERDICT round-3 item 6): many client
    threads x many requests across mixed endpoints (/superres micro-batched,
    /superres_tile behind the tile lock, /healthz) with IDENTICAL inputs.

    Asserts: every request succeeds; all sampled outputs are pairwise
    DISTINCT (the shared key stream never reuses a key even when the
    micro-batcher folds concurrent requests into one device batch — and
    identical conds inside one batch get distinct x_T rows); no deadlock
    between the key lock (_lock) and the tile lock (_tile_lock) — bounded
    joins; and host memory is stable across two waves (no per-request leak)."""
    import time

    srv = _superres_server(max_batch=4)  # LR 8 -> HR 16
    httpd = srv.make_http_server(port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    rng = np.random.default_rng(0)
    lr = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
    tile = (rng.random((16, 16, 3)) * 255).astype(np.uint8)

    def b64(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "PNG")
        return base64.b64encode(buf.getvalue()).decode()

    lr_b64, tile_b64 = b64(lr), b64(tile)
    outputs: list = []
    errors: list = []
    out_lock = threading.Lock()

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())

    def worker(wid):
        try:
            for j in range(4):
                r = post("/superres", {"image": lr_b64})
                with out_lock:
                    outputs.append(("sr", r["image"]))
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30
            ) as r:
                assert json.loads(r.read())["status"] == "ok"
            r = post("/superres_tile", {"image": tile_b64})
            with out_lock:
                outputs.append(("tile", r["image"]))
        except Exception as e:  # pragma: no cover - failure path
            with out_lock:
                errors.append((wid, repr(e)))

    def wave(n_threads=8):
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not any(t.is_alive() for t in threads), "deadlocked worker"
        return time.perf_counter() - t0

    wave()  # warmup wave (compiles; memory high-water moves here)
    rss_before = _rss_mb()
    wall = wave()
    rss_after = _rss_mb()

    assert not errors, errors[:3]
    n_req = 8 * 5 * 2  # 2 waves x 8 workers x (4 sr + 1 tile)
    assert len(outputs) == n_req
    # no key reuse anywhere: every sampled PNG (same input!) is distinct
    assert len({png for _, png in outputs}) == n_req
    # steady-state memory is stable (no per-request leak); generous CI slack
    assert rss_after - rss_before < 80, (rss_before, rss_after)
    assert wall < 300
    httpd.shutdown()
    srv.batcher.shutdown()
