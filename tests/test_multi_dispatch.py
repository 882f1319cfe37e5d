"""steps_per_dispatch > 1 (train.Trainer._build_multi_step): K train steps
per device dispatch as one lax.scan must reproduce the K=1 path — same
batches, same per-batch key stream, same EMA/BN-stat/optimizer updates —
because the scan body is the very same step fn (train._train_step_fn).

Tolerance design (measured, see the drift experiment in the round-3 notes):
the scan body compiles as a DIFFERENT XLA program than the standalone jitted
step, so gradient reductions reassociate at ulp level. Under Adam that is
chaotically amplified — early updates are ~sign(g)*lr, so an element with
g ~ 0 can flip sign and diverge by 2*lr per step (measured 3.9e-3 full-tree
max after 2 epochs x 3 steps, while epoch-1 mean losses stayed BITWISE
equal and epoch-2 losses agreed to 4e-6). Therefore:
  * full trajectory equality (params/EMA/BN stats/losses) is pinned TIGHTLY
    under SGD, where the update is linear in the gradient and program-level
    reassociation stays at float-noise scale;
  * the production Adam path is pinned on the per-epoch LOSS trajectory
    (the semantic fingerprint of batch/key/order plumbing: any wrong key,
    skipped batch, or reorder moves a loss by >=1e-2) at a chaos-proof but
    bug-tight atol.

Covers: trajectory equality, tail handling (epoch length not divisible by
K), short un-padded final batches (shape-change flush), the on-device
batch_transform moving inside the scan, label-dropout host-RNG alignment,
and mesh-sharded execution ((K, B, ...) stacks sharded on the batch axis).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from diffusionremotesensing_tpu.data.loader import DataLoader
from diffusionremotesensing_tpu.models.unet import (
    residual_attention_unet_generation,
    residual_attention_unet_superres,
)
from diffusionremotesensing_tpu.train import Trainer


class _GenDataset:
    def __init__(self, n=12, size=16, num_classes=2, seed=0):
        rng = np.random.default_rng(seed)
        self.items = [
            {
                "x": np.clip(
                    0.25 + 0.5 * (i % num_classes)
                    + 0.05 * rng.standard_normal((size, size, 3)),
                    0,
                    1,
                ).astype(np.float32),
                "cond": np.int32(i % num_classes),
            }
            for i in range(n)
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _gen_trainer(tmp_path, mesh=None, sgd=False, **kw):
    model = residual_attention_unet_generation(num_classes=2)
    trainer = Trainer(
        model,
        noise_schedule="linear",
        noise_steps=20,
        image_size=16,
        snapshot_path=os.path.join(str(tmp_path), "snapshot.msgpack"),
        lr=1e-3,
        loss="MSE",
        label_dropout=0.1,
        ema_smoothing=True,
        mesh=mesh,
        **kw,
    )
    if sgd:
        # swap the optimizer BEFORE any step/state is built: linear updates
        # keep program-level float noise un-amplified (see module docstring)
        trainer.optimizer = optax.sgd(1e-3)
    return trainer


def _run_trajectory(tmp_path, spd, mesh=None, sgd=False, n=12, batch_size=4,
                    epochs=2):
    trainer = _gen_trainer(tmp_path, mesh=mesh, sgd=sgd, steps_per_dispatch=spd)
    loader = DataLoader(_GenDataset(n=n), batch_size=batch_size, seed=7)
    state = trainer.init_state(
        trainer.model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 16, 16, 3)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32),
            train=False,
        )
    )
    recorded = []
    trainer.metrics.log = lambda **kw: recorded.append(kw)  # capture losses
    final = trainer.train(
        state, epochs, loader, check_preds_epoch=10_000, verbose=False
    )
    return recorded, {
        "params": final.params,
        "ema": final.ema_params,
        "stats": final.batch_stats,
        "step": final.step,
    }


def _assert_tree_close(a, b, atol=2e-6):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=1e-5)


@pytest.mark.parametrize("spd", [3, 4])
def test_multi_dispatch_matches_single_step(tmp_path, spd):
    # n=12, B=4 -> 3 steps/epoch: spd=3 is exact, spd=4 exercises the tail
    rec1, fin1 = _run_trajectory(tmp_path / "a", 1, sgd=True)
    recK, finK = _run_trajectory(tmp_path / "b", spd, sgd=True)
    assert [r["step"] for r in rec1] == [r["step"] for r in recK]
    for r1, rK in zip(rec1, recK):
        np.testing.assert_allclose(r1["train_loss"], rK["train_loss"], atol=2e-6)
    _assert_tree_close(fin1, finK)


def test_multi_dispatch_adam_loss_trajectory(tmp_path):
    # the production optimizer: param trees diverge chaotically (module
    # docstring) but the per-epoch loss trajectory — which fingerprints the
    # batch/key/order plumbing — must agree far below any real-bug scale
    rec1, _ = _run_trajectory(tmp_path / "a", 1)
    recK, _ = _run_trajectory(tmp_path / "b", 3)
    assert [r["step"] for r in rec1] == [r["step"] for r in recK]
    for r1, rK in zip(rec1, recK):
        np.testing.assert_allclose(r1["train_loss"], rK["train_loss"], atol=1e-4)


def test_multi_dispatch_short_final_batch(tmp_path):
    # n=10, B=4 -> final batch is SHORT (2 rows, no pad_to_multiple): the
    # shape change must flush the pending stack cleanly and still match
    rec1, fin1 = _run_trajectory(tmp_path / "a", 1, sgd=True, n=10)
    recK, finK = _run_trajectory(tmp_path / "b", 4, sgd=True, n=10)
    for r1, rK in zip(rec1, recK):
        np.testing.assert_allclose(r1["train_loss"], rK["train_loss"], atol=2e-6)
    _assert_tree_close(fin1, finK)


def test_multi_dispatch_with_batch_transform(tmp_path):
    # on-device degradation path: loader yields hr_u8, the transform runs
    # inside the scan for spd>1 and in _prep_batch for spd=1 — same result
    from diffusionremotesensing_tpu.data.device_degradation import (
        make_downblur_transform,
    )

    class _U8Dataset:
        def __init__(self, n=8, size=32, seed=0):
            rng = np.random.default_rng(seed)
            self.items = [
                {"hr_u8": rng.integers(0, 256, (size, size, 3), dtype=np.uint8)}
                for _ in range(n)
            ]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    def run(tmp, spd):
        model = residual_attention_unet_superres(magnification_factor=2)
        trainer = Trainer(
            model,
            noise_schedule="linear",
            noise_steps=20,
            image_size=32,
            snapshot_path=os.path.join(str(tmp), "snapshot.msgpack"),
            lr=1e-3,
            loss="MSE",
            batch_transform=make_downblur_transform(32, 2, 0.5),
            steps_per_dispatch=spd,
        )
        trainer.optimizer = optax.sgd(1e-3)
        loader = DataLoader(_U8Dataset(), batch_size=4, seed=3)
        state = trainer.init_state(
            trainer.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 32, 32, 3)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 16, 16, 3)),
                train=False,
            )
        )
        rec = []
        trainer.metrics.log = lambda **kw: rec.append(kw)
        final = trainer.train(state, 2, loader, check_preds_epoch=10_000, verbose=False)
        return rec, {"params": final.params, "stats": final.batch_stats}

    rec1, fin1 = run(tmp_path / "a", 1)
    recK, finK = run(tmp_path / "b", 2)
    for r1, rK in zip(rec1, recK):
        np.testing.assert_allclose(r1["train_loss"], rK["train_loss"], atol=2e-6)
    _assert_tree_close(fin1, finK)


def test_multi_dispatch_mesh_sharded_matches(tmp_path):
    # (K, B, ...) stacks sharded on the BATCH axis over the 8-device CPU
    # mesh must equal the unsharded single-step trajectory
    from diffusionremotesensing_tpu.parallel.sharding import make_mesh

    mesh = make_mesh()
    rec1, fin1 = _run_trajectory(tmp_path / "a", 1, sgd=True, n=16, batch_size=8)
    recK, finK = _run_trajectory(
        tmp_path / "b", 2, mesh=mesh, sgd=True, n=16, batch_size=8
    )
    for r1, rK in zip(rec1, recK):
        np.testing.assert_allclose(r1["train_loss"], rK["train_loss"], atol=5e-6)
    _assert_tree_close(fin1, finK, atol=5e-6)


def test_steps_per_dispatch_validation(tmp_path):
    with pytest.raises(ValueError):
        _gen_trainer(tmp_path, steps_per_dispatch=0)
