"""Profiling/metrics subsystem."""

import json
import os
import time

from diffusionremotesensing_tpu.profiling import MetricsLogger, StepTimer, trace


def test_metrics_logger_writes_jsonl(tmp_path):
    p = str(tmp_path / "metrics" / "run.jsonl")
    m = MetricsLogger(p)
    m.log(epoch=0, train_loss=1.5)
    m.log(epoch=1, train_loss=0.7, steps_per_sec=3.2)
    m.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["epoch"] == 0 and lines[0]["train_loss"] == 1.5
    assert "ts" in lines[1] and lines[1]["steps_per_sec"] == 3.2


def test_metrics_logger_none_path_noop():
    m = MetricsLogger(None)
    m.log(loss=1.0)  # must not raise
    m.close()


def test_step_timer_excludes_warmup():
    t = StepTimer(warmup=1)
    t.tick()  # warmup (compile) step
    time.sleep(0.02)
    t.tick()
    t.tick()
    assert t.steps_per_sec > 0


def test_trace_none_is_noop():
    with trace(None):
        pass


def test_trainer_metrics_path(tmp_path):
    import jax

    from diffusionremotesensing_tpu.data.loader import DataLoader
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_generation,
    )
    from diffusionremotesensing_tpu.train import Trainer

    model = residual_attention_unet_generation(num_classes=2)
    v = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    mp = str(tmp_path / "m.jsonl")
    tr = Trainer(model, "linear", noise_steps=10, image_size=16, loss="MSE", metrics_path=mp)
    import numpy as np

    ds = [{"x": np.zeros((16, 16, 3), np.float32), "cond": np.int32(0)} for _ in range(4)]
    tr.train(tr.init_state(v), epochs=1, train_loader=DataLoader(ds, 4), verbose=False)
    rows = [json.loads(l) for l in open(mp)]
    assert rows and "train_loss" in rows[0] and "steps_per_sec" in rows[0]
