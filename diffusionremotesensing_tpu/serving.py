"""Production serving: a micro-batching inference server for the three tasks.

The reference has no serving story (inference is ad-hoc scripts); this module
provides one designed around TPU execution characteristics:

* requests are queued and **micro-batched** up to ``max_batch`` (padded to a
  fixed shape with wrap-around so the jitted sampler never recompiles), then
  denoised in ONE lax.scan — latency amortizes exactly like aggregation
  sampling's patch axis;
* the model/sampler compile once at startup (warmup request);
* one server can span a whole device mesh (``mesh=``): params replicate,
  each micro-batch (and the tile endpoint's patch axis) shards data-parallel
  across the chips — collective-free, so throughput scales with mesh size;
* transport is stdlib HTTP (zero extra dependencies): POST /superres,
  /sar_to_ndvi, /generate with a JSON body, base64-encoded PNG in/out,
  GET /healthz for liveness.

Example:
    server = InferenceServer(model, variables, noise_schedule="cosine",
                             noise_steps=200, image_size=128, task="superres")
    server.serve(port=8000)          # blocking
    # or programmatic:
    out = server.infer_batch([lr_img1, lr_img2])
"""

from __future__ import annotations

import base64
import io as _io
import json
import queue
import threading
import time
from typing import List, Optional

import numpy as np


class MicroBatcher:
    """Collects requests into micro-batches: waits up to ``max_wait_ms`` for
    the batch to fill, pads with wrap-around to the fixed ``max_batch`` so the
    compiled sampler is reused for every request size."""

    def __init__(self, run_batch, max_batch: int = 8, max_wait_ms: float = 10.0):
        self._run_batch = run_batch
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def submit(self, item) -> "queue.Queue":
        done: "queue.Queue" = queue.Queue(maxsize=1)
        if self._stop.is_set():
            done.put(RuntimeError("server is shut down"))
            return done
        self._q.put((item, done))
        return done

    def infer(self, item, timeout: Optional[float] = None):
        result = self.submit(item).get(timeout=timeout)
        if isinstance(result, Exception):
            raise result
        return result

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            items = [b[0] for b in batch]
            try:
                outs = self._run_batch(items)
                for (_, done), out in zip(batch, outs):
                    done.put(out)
            except Exception as e:  # propagate to all waiters
                for _, done in batch:
                    done.put(e)

    def shutdown(self):
        self._stop.set()
        self._worker.join(timeout=2)
        # fail any requests still queued so their waiters don't block forever
        while True:
            try:
                _, done = self._q.get_nowait()
            except queue.Empty:
                break
            done.put(RuntimeError("server is shut down"))


class InferenceServer:
    """Task-specific diffusion inference with micro-batching.

    task: 'superres' | 'sar' (condition = image) | 'generation' (condition =
    int label; CFG scale 3 like the reference).

    Value ranges: image conditions arrive as PNG, which decodes to [0, 1] —
    exactly the range the models are TRAINED on, including SAR: the dataset
    maps raw [-1, 1] SAR to [0, 1] before the model (datasets.SarToNdviDataset,
    reference utils.py:87-89), and the reference inference helper does the
    same rescale (superres_and_NDVIgen.py:114-115). Clients holding raw
    [-1, 1] SAR arrays encode them to PNG ((x+1)/2 * 255), which lands them
    in the trained range automatically.
    """

    def __init__(
        self,
        model,
        variables,
        noise_schedule: str,
        noise_steps: int,
        image_size: int,
        task: str = "superres",
        max_batch: int = 8,
        max_wait_ms: float = 10.0,
        ddim_steps: Optional[int] = None,
        ddim_clip_x0: bool = True,
        seed: int = 0,
        mesh=None,
        start_t: Optional[int] = None,
    ):
        import jax

        from diffusionremotesensing_tpu.diffusion import make_process

        self.task = task
        self.image_size = image_size
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            # one server spans the whole mesh: params replicated, each
            # micro-batch sharded along its batch axis so the fixed-shape
            # sampler partitions data-parallel across the chips (collective-
            # free — the scan body has no cross-sample term)
            from diffusionremotesensing_tpu.parallel.sharding import (
                replicated_sharding,
            )

            n = int(mesh.devices.size)
            if max_batch % n:
                raise ValueError(
                    f"max_batch ({max_batch}) must be divisible by the mesh "
                    f"size ({n}) so every device gets an equal micro-batch "
                    f"shard"
                )
            variables = jax.device_put(variables, replicated_sharding(mesh))
        self.variables = variables
        self.max_batch = max_batch
        self.process = make_process(model, noise_schedule, noise_steps, image_size)
        if start_t is not None and task != "superres":
            # the warm start is the bicubic upsample of the LR condition —
            # only super-resolution has that cheap reconstruction
            raise ValueError("start_t (truncated warm-start sampling) is "
                             "only available for task='superres'")
        self._start_t = start_t
        if ddim_steps is not None:
            # clip_x0 default True: the measured-best few-step config
            # (+2.1 dB at DDIM-100 on the learning-gate model,
            # benchmarks/NOTES.md); ddim_clip_x0=False selects the
            # unclamped trajectory like every other DDIM surface
            self._sampler = self.process.ddim_sampler(
                ddim_steps, cfg_scale=3.0 if task == "generation" else None,
                clip_x0=ddim_clip_x0, start_t=start_t,
            )
        elif task == "generation":
            self._sampler = self.process.sampler(cfg_scale=3.0)
        else:
            self._sampler = self.process.sampler(start_t=start_t)
        self._key = jax.random.PRNGKey(seed)
        self._lock = threading.Lock()
        self._ddim_steps = ddim_steps
        self._ddim_clip_x0 = ddim_clip_x0
        self._agg = None                 # lazy AggregationSampler (tiled SR)
        self._tile_lock = threading.Lock()
        self.batcher = MicroBatcher(self._run_batch, max_batch, max_wait_ms)
        # the fixed shape every request must match (one compiled program;
        # validated per request so one bad input cannot poison a micro-batch
        # or trigger a multi-minute recompile)
        if task == "superres":
            s = image_size // (model.magnification_factor or 1)
            self.expected_cond_shape = (s, s, model.cond_channels)
        elif task == "sar":
            self.expected_cond_shape = (image_size, image_size, model.cond_channels)
        else:
            self.expected_cond_shape = ()
        self.num_classes = getattr(model, "num_classes", None)

    def validate(self, cond) -> Optional[str]:
        """Return an error message for an invalid request, else None."""
        if self.task == "generation":
            label = int(cond)
            if self.num_classes is not None and not (0 <= label < self.num_classes):
                return f"label {label} out of range [0, {self.num_classes})"
            return None
        shape = tuple(np.asarray(cond).shape)
        if shape != self.expected_cond_shape:
            return f"input shape {shape} != expected {self.expected_cond_shape}"
        return None

    def _next_key(self):
        import jax

        with self._lock:
            self._key, k = jax.random.split(self._key)
            return k

    def _run_batch(self, conds: List[np.ndarray]) -> List[np.ndarray]:
        import jax
        import jax.numpy as jnp

        n = len(conds)
        pad = self.max_batch - n
        idx = list(range(n)) + [i % n for i in range(pad)]
        cond = np.stack([np.asarray(conds[i], np.float32) for i in idx])
        if self.task == "generation":
            cond = jnp.asarray(cond.astype(np.int32).reshape(self.max_batch))
        else:
            cond = jnp.asarray(cond)
        key = self._next_key()
        if self._start_t is not None:
            from diffusionremotesensing_tpu.diffusion import warm_start_state
            from diffusionremotesensing_tpu.ops.resize import upsample_bicubic

            init = upsample_bicubic(cond, self.model.magnification_factor or 1)
            x_T = warm_start_state(self.process.schedule, init, self._start_t, key)
        else:
            x_T = jax.random.normal(
                key, (self.max_batch, self.image_size, self.image_size, self.model.image_channels)
            )
        if self.mesh is not None:
            from diffusionremotesensing_tpu.parallel.sharding import batch_sharding

            bs = batch_sharding(self.mesh)
            cond = jax.device_put(cond, bs)
            x_T = jax.device_put(x_T, bs)
        out = np.asarray(self._sampler(self.variables, jax.random.fold_in(key, 1), x_T, cond))
        out = np.clip(out, 0.0, 1.0)
        return [out[i] for i in range(n)]

    def infer_batch(self, conds: List[np.ndarray], timeout: Optional[float] = 600) -> List[np.ndarray]:
        """Synchronous helper: submit all, collect all (they may share one
        device batch)."""
        for c in conds:
            err = self.validate(c)
            if err is not None:
                raise ValueError(err)
        handles = [self.batcher.submit(c) for c in conds]
        outs = []
        for h in handles:
            r = h.get(timeout=timeout)
            if isinstance(r, Exception):
                raise r
            outs.append(r)
        return outs

    def infer_tile(self, lr_img: np.ndarray) -> np.ndarray:
        """Tiled super-resolution of an arbitrary-size LR image through
        aggregation sampling (superres task only) — the production path for
        whole scenes, serving the same flow as Aggregation_Sampling.py.

        Unlike the fixed-shape micro-batched endpoints, the tile's patch set
        is already a large device batch; requests serialize on a tile lock.
        Each new tile SIZE compiles its remainder chunk once (cached by jit),
        so a service should stick to a fixed tile size for latency SLOs."""
        if self.task != "superres":
            raise ValueError("infer_tile is only available for task='superres'")
        p = self.expected_cond_shape[0]
        img = np.asarray(lr_img, np.float32)
        if img.ndim != 3 or img.shape[2] != self.model.cond_channels or min(img.shape[:2]) < p:
            raise ValueError(
                f"tile must be (H>={p}, W>={p}, {self.model.cond_channels}), got {tuple(img.shape)}"
            )
        with self._tile_lock:
            if self._agg is None:
                from diffusionremotesensing_tpu.aggregation import AggregationSampler

                self._agg = AggregationSampler(
                    self.process,
                    patch_size=p,
                    stride=p // 2,
                    magnification_factor=self.model.magnification_factor or 1,
                    ddim_steps=self._ddim_steps,
                    ddim_clip_x0=self._ddim_clip_x0,  # keep /superres_tile on
                    # the same DDIM trajectory as the micro-batch endpoints
                    mesh=self.mesh,   # shard the patch axis across the mesh
                    start_t=self._start_t,
                )
            return np.asarray(self._agg(self.variables, img, key=self._next_key()))

    def warmup(self):
        """Compile the sampler before accepting traffic."""
        if self.task == "generation":
            dummy = [np.int32(0)]
        elif self.task == "superres":
            s = self.image_size // (self.model.magnification_factor or 1)
            dummy = [np.zeros((s, s, self.model.cond_channels), np.float32)]
        else:
            dummy = [np.zeros((self.image_size, self.image_size, self.model.cond_channels), np.float32)]
        self.infer_batch(dummy)

    # ----------------------------------------------------------- HTTP layer

    def serve(self, host: str = "0.0.0.0", port: int = 8000, warmup: bool = True):
        """Blocking stdlib HTTP server (threaded; requests micro-batch)."""
        server = self.make_http_server(host, port, warmup=warmup)
        print(f"serving {self.task} on {host}:{port}")
        server.serve_forever()

    def make_http_server(self, host: str = "127.0.0.1", port: int = 0, warmup: bool = False):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        if warmup:
            self.warmup()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, {"status": "ok", "task": outer.task})
                else:
                    self._reply(404, {"error": "unknown path"})

            _PATH_TASK = {"/superres": "superres", "/sar_to_ndvi": "sar", "/generate": "generation"}

            def do_POST(self):
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length) or b"{}")
                    if self.path == "/superres_tile":
                        if outer.task != "superres":
                            self._reply(404, {"error": "tile endpoint requires task=superres"})
                            return
                        if "image" not in req:
                            self._reply(400, {"error": "missing required field 'image'"})
                            return
                        try:
                            out = outer.infer_tile(_decode_image(req["image"]))
                        except ValueError as e:
                            self._reply(400, {"error": str(e)})
                            return
                        self._reply(200, {"image": _encode_image(out)})
                        return
                    if self._PATH_TASK.get(self.path) != outer.task:
                        self._reply(404, {"error": f"path {self.path} not served by task {outer.task}"})
                        return
                    field = "label" if outer.task == "generation" else "image"
                    if field not in req:
                        self._reply(400, {"error": f"missing required field {field!r}"})
                        return
                    if outer.task == "generation":
                        # malformed label TYPES are client errors (400), same
                        # as every other request-validation failure — not 500s
                        try:
                            # int() rejects lists/None/non-numeric strings;
                            # np.int32 alone would ACCEPT a list (makes an
                            # array) and raises OverflowError past int32 range
                            cond = np.int32(int(req["label"]))
                        except (TypeError, ValueError, OverflowError):
                            self._reply(400, {"error": "field 'label' must be an integer"})
                            return
                    else:
                        cond = _decode_image(req["image"])
                    err = outer.validate(cond)
                    if err is not None:
                        self._reply(400, {"error": err})
                        return
                    out = outer.batcher.infer(cond, timeout=600)
                    self._reply(200, {"image": _encode_image(out)})
                except Exception as e:  # surface the error to the client
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        return ThreadingHTTPServer((host, port), Handler)


def _decode_image(b64: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(_io.BytesIO(base64.b64decode(b64)))
    arr = np.asarray(img, np.float32) / 255.0
    return arr[:, :, None] if arr.ndim == 2 else arr


def _encode_image(arr: np.ndarray) -> str:
    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8).squeeze()).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()
