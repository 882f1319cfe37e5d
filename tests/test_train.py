"""Training engine: EMA semantics, snapshot round-trip, end-to-end slice."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionremotesensing_tpu import io as dio
from diffusionremotesensing_tpu.data.loader import DataLoader
from diffusionremotesensing_tpu.ema import ema_update
from diffusionremotesensing_tpu.models.unet import (
    init_unet_params,
    residual_attention_unet_generation,
)
from diffusionremotesensing_tpu.train import Trainer


class SyntheticGenDataset:
    """Tiny in-memory class-conditional dataset (label = brightness level)."""

    def __init__(self, n=16, size=16, num_classes=2, seed=0):
        rng = np.random.default_rng(seed)
        self.items = []
        for i in range(n):
            label = i % num_classes
            base = 0.25 + 0.5 * label
            img = np.clip(base + 0.05 * rng.standard_normal((size, size, 3)), 0, 1)
            self.items.append({"x": img.astype(np.float32), "cond": np.int32(label)})

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_ema_warmup_copies_then_decays():
    p0 = {"w": jnp.zeros((3,))}
    online = {"w": jnp.ones((3,))}
    # during warmup (step < 2000): copy
    out = ema_update(p0, online, jnp.asarray(10))
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0)
    # after warmup: 0.995 * old + 0.005 * new
    out = ema_update(p0, online, jnp.asarray(2000))
    np.testing.assert_allclose(np.asarray(out["w"]), 0.005, rtol=1e-6)


def _make_trainer(tmp_path, ema=False, **kw):
    model = residual_attention_unet_generation(num_classes=2)
    trainer = Trainer(
        model,
        noise_schedule="linear",
        noise_steps=20,
        image_size=16,
        snapshot_path=os.path.join(tmp_path, "snapshot.msgpack"),
        lr=1e-3,
        loss="MSE",
        ema_smoothing=ema,
        label_dropout=0.1,
        **kw,
    )
    variables = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    return trainer, trainer.init_state(variables)


def test_end_to_end_training_reduces_loss(tmp_path):
    trainer, state = _make_trainer(str(tmp_path))
    ds = SyntheticGenDataset()
    loader = DataLoader(ds, batch_size=8, shuffle=True)
    step = trainer._build_train_step()
    losses = []
    for epoch in range(6):
        loader.set_epoch(epoch)
        ep = []
        for batch in loader:
            batch = trainer._prep_batch(batch)
            state, loss = step(state, batch, trainer.next_key())
            ep.append(float(loss))
        losses.append(np.mean(ep))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert int(state.step) == 12


def test_train_loop_snapshot_and_resume(tmp_path):
    trainer, state = _make_trainer(str(tmp_path))
    ds = SyntheticGenDataset(n=8)
    loader = DataLoader(ds, batch_size=8)
    state = trainer.train(state, epochs=2, train_loader=loader, check_preds_epoch=1, verbose=False)
    assert os.path.exists(trainer.snapshot_path)

    # a fresh trainer auto-resumes epochs_run from the snapshot
    trainer2, state2 = _make_trainer(str(tmp_path))
    state2 = trainer2.maybe_resume(state2)
    assert trainer2.epochs_run == 1  # last check_preds save was at epoch 1
    # resumed params equal the saved ones
    saved, _ = dio.load_snapshot(trainer.snapshot_path)
    a = jax.tree_util.tree_leaves(saved["params"])
    b = jax.tree_util.tree_leaves(state2.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_ema_snapshot_saves_ema_params(tmp_path):
    trainer, state = _make_trainer(str(tmp_path), ema=True)
    ds = SyntheticGenDataset(n=8)
    loader = DataLoader(ds, batch_size=8)
    state = trainer.train(state, epochs=1, train_loader=loader, check_preds_epoch=1, verbose=False)
    saved, _ = dio.load_snapshot(trainer.snapshot_path)
    # during warmup EMA == online params, so the snapshot equals them
    a = jax.tree_util.tree_leaves(saved["params"])
    b = jax.tree_util.tree_leaves(jax.device_get(state.ema_params))
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_validation_early_stopping(tmp_path):
    trainer, state = _make_trainer(str(tmp_path))
    ds = SyntheticGenDataset(n=8)
    loader = DataLoader(ds, batch_size=8)
    # patience=1 with an un-improving (random-walk) tiny run stops quickly
    state = trainer.train(
        state, epochs=50, train_loader=loader, val_loader=loader,
        check_preds_epoch=100, patience=1, verbose=False,
    )
    # must have stopped long before 50 epochs (early stopping fired)
    assert os.path.exists(trainer.snapshot_path)


@pytest.mark.slow
def test_padded_batch_loss_and_grads_match_unpadded(tmp_path):
    """A final batch wrap-padded by a WHOLE replication (4 real rows -> 8)
    must yield the identical loss and parameter gradients as the unpadded
    4-row batch: duplication preserves train-mode BN batch statistics, and
    pad_mask excludes the pad rows from the loss (losses._reduce)."""
    trainer, state = _make_trainer(str(tmp_path))
    model, schedule = trainer.model, trainer.schedule
    from diffusionremotesensing_tpu.diffusion import q_sample

    rng = np.random.default_rng(3)
    x0 = rng.random((4, 16, 16, 3)).astype(np.float32)
    cond = np.arange(4, dtype=np.int32) % 2
    t = jnp.asarray([3, 7, 11, 15])
    x_t, noise = q_sample(schedule, jnp.asarray(x0), t, jax.random.PRNGKey(5))

    def loss_of(params, x_t, t, cond, noise, pad_mask):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            x_t, t, cond, None, train=True, mutable=["batch_stats"],
        )
        return trainer.loss_fn(out, noise, weights=pad_mask)

    ref, g_ref = jax.value_and_grad(loss_of)(
        state.params, x_t, t, cond, noise, None
    )
    dup = lambda a: jnp.concatenate([a, a], axis=0)
    mask = jnp.concatenate([jnp.ones(4), jnp.zeros(4)])
    got, g_got = jax.value_and_grad(loss_of)(
        state.params, dup(x_t), dup(t), dup(cond), dup(noise), mask
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_loader_pad_mask_flows_through_train_step(tmp_path):
    """End-to-end: a DataLoader final partial batch with pad_to_multiple
    attaches pad_mask and the jitted train step consumes it (no crash, finite
    loss, and the loss differs from the unmasked over-weighted value)."""
    trainer, state = _make_trainer(str(tmp_path))
    ds = SyntheticGenDataset(n=11)  # 11 % 8 = 3-row final batch, padded to 8
    loader = DataLoader(ds, batch_size=8, shuffle=False, pad_to_multiple=8)
    batches = list(loader)
    assert "pad_mask" not in batches[0] and "pad_mask" in batches[1]
    step = trainer._build_train_step()
    key = trainer.next_key()
    # the step donates its state: copy it so the second call has live buffers
    state_copy = jax.tree_util.tree_map(jnp.array, state)
    _, loss_masked = step(state, trainer._prep_batch(batches[1]), key)
    assert np.isfinite(float(loss_masked))
    # same batch with the mask stripped -> over-weighted repeats -> different loss
    nomask = {k: v for k, v in batches[1].items() if k != "pad_mask"}
    _, loss_unmasked = step(state_copy, trainer._prep_batch(nomask), key)
    assert float(loss_masked) != float(loss_unmasked)


def test_trainer_sample_shape(tmp_path):
    trainer, state = _make_trainer(str(tmp_path))
    out = trainer.sample(state, n=2, cond=jnp.array([0, 1]), cfg_scale=3.0)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_snapshot_roundtrip(tmp_path):
    path = os.path.join(str(tmp_path), "snap.msgpack")
    state = {"params": {"a": jnp.arange(4.0)}, "batch_stats": {"b": jnp.ones((2,))}}
    dio.save_snapshot(path, state, 7)
    loaded, epochs = dio.load_snapshot(path)
    assert epochs == 7
    np.testing.assert_allclose(np.asarray(loaded["params"]["a"]), np.arange(4.0))


def test_bf16_compute_training_learns(tmp_path):
    """Mixed-precision training (bf16 compute, f32 params) must reduce loss."""
    import jax.numpy as jnp

    from diffusionremotesensing_tpu.models.unet import (
        residual_attention_unet_generation as make_gen,
    )

    model = make_gen(num_classes=2, dtype=jnp.bfloat16)
    init_model = make_gen(num_classes=2)
    variables = init_unet_params(init_model, jax.random.PRNGKey(0), image_size=16)
    trainer = Trainer(model, "linear", noise_steps=20, image_size=16, lr=1e-3, loss="MSE")
    state = trainer.init_state(variables)
    step = trainer._build_train_step()
    ds = SyntheticGenDataset()
    loader = DataLoader(ds, batch_size=8)
    losses = []
    for epoch in range(6):
        loader.set_epoch(epoch)
        for batch in loader:
            state, loss = step(state, trainer._prep_batch(batch), trainer.next_key())
            losses.append(float(loss))
    # params must remain float32
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.dtype == jnp.float32
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_orbax_snapshot_roundtrip(tmp_path):
    """The orbax backend writes an async directory checkpoint that
    load_snapshot auto-detects and restores to the same tree; the latest
    committed step wins and earlier steps are garbage-collected only after
    the newer one commits (max_to_keep=1 durability semantics)."""
    path = os.path.join(str(tmp_path), "snap_orbax")
    snap = dio.OrbaxSnapshotter(path)
    snap.save({"params": {"a": jnp.arange(4.0)}, "batch_stats": {"b": jnp.ones((2,))}}, 7)
    snap.save({"params": {"a": jnp.arange(4.0) + 1}, "batch_stats": {"b": jnp.ones((2,))}}, 9)
    snap.wait_until_finished()
    snap.close()
    loaded, epochs = dio.load_snapshot(path)
    assert epochs == 9
    np.testing.assert_allclose(np.asarray(loaded["params"]["a"]), np.arange(4.0) + 1)


def test_orbax_backend_train_and_resume(tmp_path):
    """Trainer(checkpoint_backend='orbax') saves through the async writer and
    a fresh (default-backend) trainer auto-resumes from the directory."""
    trainer, state = _make_trainer(str(tmp_path), checkpoint_backend="orbax")
    trainer.snapshot_path = os.path.join(str(tmp_path), "snapshot_orbax")
    ds = SyntheticGenDataset(n=8)
    loader = DataLoader(ds, batch_size=8)
    state = trainer.train(state, epochs=2, train_loader=loader, check_preds_epoch=1, verbose=False)
    assert os.path.isdir(trainer.snapshot_path)

    trainer2, state2 = _make_trainer(str(tmp_path))
    trainer2.snapshot_path = trainer.snapshot_path
    state2 = trainer2.maybe_resume(state2)
    assert trainer2.epochs_run == 1
    a = jax.tree_util.tree_leaves(jax.device_get(state.params))
    b = jax.tree_util.tree_leaves(state2.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_sigterm_snapshots_and_stops(tmp_path):
    """Preemption safety: SIGTERM mid-training -> the loop snapshots, exits
    cleanly (rc 0), and a rerun auto-resumes from the saved epoch."""
    import signal
    import subprocess
    import sys
    import time as _time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snap = os.path.join(str(tmp_path), "snapshot.msgpack")
    marker = os.path.join(str(tmp_path), "started")
    script = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np
from diffusionremotesensing_tpu.data.loader import DataLoader
from tests.test_train import SyntheticGenDataset, _make_trainer

trainer, state = _make_trainer({str(tmp_path)!r})
ds = SyntheticGenDataset(n=8)
loader = DataLoader(ds, batch_size=8)

class Signalling:
    def __init__(self, inner):
        self.inner = inner
    def set_epoch(self, e):
        # after the first epoch compiles+runs, tell the parent we're live
        if e == 1:
            open({marker!r}, "w").write("x")
    def __iter__(self):
        return iter(self.inner)
    def __len__(self):
        return len(self.inner)

state = trainer.train(state, epochs=100000, train_loader=Signalling(loader),
                      check_preds_epoch=100000, verbose=False)
print("TRAIN_RETURNED_CLEANLY", int(state.step))
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    # stdout must go to a FILE, not subprocess.PIPE: nobody drains the pipe
    # until after the marker appears, and XLA's per-cache-load C++ warnings
    # (e.g. cpu_aot_loader machine-feature spew, ~3 KB each) can fill the
    # 64 KB pipe buffer before epoch 1, deadlocking the worker in write().
    out_path = os.path.join(str(tmp_path), "worker_out.txt")
    with open(out_path, "w") as out_f:
        proc = subprocess.Popen(
            [sys.executable, "-c", script], cwd=repo, env=env,
            stdout=out_f, stderr=subprocess.STDOUT, text=True,
        )
        deadline = _time.time() + 300
        read_out = lambda: open(out_path).read()  # noqa: E731
        while not os.path.exists(marker):
            assert proc.poll() is None, read_out()[-3000:]
            assert _time.time() < deadline, "worker never reached epoch 1"
            _time.sleep(0.5)
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=120)
    out = read_out()
    assert proc.returncode == 0, out[-3000:]
    assert "TRAIN_RETURNED_CLEANLY" in out, out[-3000:]
    # the signal handler announces itself unconditionally; the epoch-level
    # messages are verbose-gated (the worker runs verbose=False)
    assert "will snapshot and stop" in out, out[-3000:]
    assert "Training snapshot saved" in out, out[-3000:]
    assert os.path.exists(snap)

    # the snapshot is a valid resume point
    trainer2, state2 = _make_trainer(str(tmp_path))
    state2 = trainer2.maybe_resume(state2)
    assert trainer2.epochs_run >= 1


def test_orbax_resave_same_epoch_persists(tmp_path):
    """A resumed run re-saves the epoch it restarted from; without
    force=True, CheckpointManager.save silently skips an existing step and
    the rerun's weights are never persisted (verified on orbax 0.11.x)."""
    path = os.path.join(str(tmp_path), "snap_orbax")
    snap = dio.OrbaxSnapshotter(path)
    snap.save({"params": {"a": jnp.zeros(3)}, "batch_stats": {}}, 5)
    snap.wait_until_finished()
    snap.close()
    snap2 = dio.OrbaxSnapshotter(path)
    snap2.save({"params": {"a": jnp.ones(3)}, "batch_stats": {}}, 5)
    snap2.wait_until_finished()
    snap2.close()
    loaded, epochs = dio.load_snapshot(path)
    assert epochs == 5
    np.testing.assert_allclose(np.asarray(loaded["params"]["a"]), np.ones(3))
