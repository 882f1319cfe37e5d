"""serve.py CLI launcher (cli.build_server): registry snapshot + model_name
size parsing + HTTP round-trip on an ephemeral port. The server internals
are covered by tests/test_serving.py; this pins the CLI assembly layer."""

import argparse
import base64
import io
import json
import os
import threading
import urllib.request

import jax
import numpy as np
from PIL import Image

from diffusionremotesensing_tpu.cli import build_server
from diffusionremotesensing_tpu.io import save_snapshot
from diffusionremotesensing_tpu.models.unet import (
    init_unet_params,
    residual_attention_unet_superres,
)

MODEL_NAME = "Residual_Attention_UNet_superres_magnification2_LRimgsize8_test"


def _args(**over):
    # serve.py's argparse defaults, CPU-test sized
    base = dict(
        task="superres", model_name=MODEL_NAME, snapshot_name="snapshot.pt",
        snapshot_path=None, noise_schedule="cosine", noise_steps=4,
        model_input_size=None, magnification_factor=None, inp_out_channels=3,
        num_classes=10, device="cpu", max_batch=2, max_wait_ms=5.0,
        ddim_steps=None, ddim_clip_x0=True, compute_dtype="float32",
        s2d=True, tap44="auto", fused_att=False, dec_block=False, seed=None,
    )
    base.update(over)
    return argparse.Namespace(**base)


def _make_registry_snapshot(root):
    model = residual_attention_unet_superres(magnification_factor=2)
    v = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    path = os.path.join(root, "models_run", MODEL_NAME, "weights", "snapshot.pt")
    save_snapshot(path, {"params": v["params"],
                         "batch_stats": v.get("batch_stats", {})}, 1)


def test_build_server_parses_model_name_and_serves(tmp_path, monkeypatch):
    _make_registry_snapshot(str(tmp_path))
    monkeypatch.chdir(tmp_path)
    srv = build_server(_args())
    # sizes derived from the name: LRimgsize8 x magnification2 -> HR 16
    assert srv.image_size == 16
    assert srv.expected_cond_shape == (8, 8, 3)

    httpd = srv.make_http_server(port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        img = Image.fromarray(
            (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(np.uint8)
        )
        buf = io.BytesIO()
        img.save(buf, "PNG")
        body = json.dumps(
            {"image": base64.b64encode(buf.getvalue()).decode()}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/superres", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        sr = Image.open(io.BytesIO(base64.b64decode(out["image"])))
        assert sr.size == (16, 16)
    finally:
        httpd.shutdown()
        srv.batcher.shutdown()


def test_build_server_seed_defaults_to_fresh_entropy(tmp_path, monkeypatch):
    """seed=None (the serve.py default) must draw fresh entropy per process —
    restarted servers / load-balanced replicas must not replay one noise
    sequence — while an explicit --seed stays reproducible."""
    _make_registry_snapshot(str(tmp_path))
    monkeypatch.chdir(tmp_path)
    srv_a, srv_b = build_server(_args()), build_server(_args())
    srv_fixed = build_server(_args(seed=7))
    try:
        assert not np.array_equal(np.asarray(srv_a._key), np.asarray(srv_b._key))
        assert np.array_equal(
            np.asarray(srv_fixed._key), np.asarray(jax.random.PRNGKey(7))
        )
    finally:
        for s in (srv_a, srv_b, srv_fixed):
            s.batcher.shutdown()


def test_build_server_explicit_overrides_and_missing_parse(tmp_path, monkeypatch):
    _make_registry_snapshot(str(tmp_path))
    monkeypatch.chdir(tmp_path)
    # explicit sizes beat name parsing
    srv = build_server(_args(model_input_size=16, magnification_factor=2))
    assert srv.image_size == 16
    srv.batcher.shutdown()
    # unparseable name without overrides -> clear SystemExit, not IndexError
    snap = os.path.join("models_run", MODEL_NAME, "weights", "snapshot.pt")
    import pytest

    with pytest.raises(SystemExit, match="magnification"):
        build_server(_args(model_name="plain_name", snapshot_path=snap))
