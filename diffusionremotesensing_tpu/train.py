"""The training engine: one jitted step, one host loop, all three tasks.

Replaces the reference's three copy-pasted ``Diffusion.train`` methods
(train_diffusion_superres.py:319-511 and twins). Preserved semantics:

* Adam (torch defaults: b1=0.9, b2=0.999, eps=1e-8), constant LR.
* per batch: t ~ U[1, T) -> q-sample -> predict eps -> loss -> step -> EMA.
* EMA beta 0.995, 2000-step warmup-copy (only when ``ema_smoothing``); the
  EMA weights are what get snapshotted and what run validation/previews.
* class-conditional label dropout: with prob 0.1 the *whole batch* is trained
  unconditionally (train_diffusion_generation.py:392-394) — drawn on host,
  passed as a (B,) mask so there is no retrace.
* snapshot cadence: every ``check_preds_epoch`` epochs iff no val loader,
  else on val-loss improvement; early stopping on ``patience`` epochs
  without improvement; ``epochs_run`` resume.
* optimizer state is deliberately NOT checkpointed (the reference comments it
  out, train_diffusion_superres.py:274-275): resume restarts Adam moments.

TPU-first: the whole step (noising + forward + backward + Adam + EMA) is one
jitted function with donated state; under a mesh the batch is sharded along
``data`` and XLA emits the grad all-reduce over ICI (see parallel/sharding.py).
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from diffusionremotesensing_tpu import io as dio
from diffusionremotesensing_tpu.diffusion import make_process, q_sample, sample_timesteps
from diffusionremotesensing_tpu.ema import EMA_BETA, EMA_WARMUP_STEPS, ema_update
from diffusionremotesensing_tpu.losses import make_loss_fn
from diffusionremotesensing_tpu.parallel.sharding import (
    is_main_process,
    replicated_sharding,
    shard_batch,
)


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    ema_params: Any  # == params pytree, or None when ema is off
    opt_state: Any
    step: jnp.ndarray  # scalar int32, counts optimizer steps


def _merge_nested(base, upd):
    """Recursively overlay ``upd`` onto the (possibly frozen) ``base`` stats
    tree — used to splice the s2d train path's self-computed level-0 BN
    running stats into the flax-mutated batch_stats collection."""
    out = dict(base)
    for k, v in upd.items():
        if k in out and hasattr(out[k], "items") and hasattr(v, "items"):
            out[k] = _merge_nested(out[k], v)
        else:
            out[k] = v
    return FrozenDict(out) if isinstance(base, FrozenDict) else out


class Trainer:
    """Bundles a model + schedule + optimizer into train/val/sample steps.

    ``model`` is a flax Module with signature
    ``apply(vars, x, t, cond, cond_mask, train=...)`` (the unified UNet).
    ``batch`` dicts carry 'x' (the clean target image NHWC) and optionally
    'cond' (image NHWC or int labels) and 'cond_mask' ((B,) float).
    """

    def __init__(
        self,
        model,
        noise_schedule: str,
        noise_steps: int,
        image_size: int,
        snapshot_path: Optional[str] = None,
        lr: float = 3e-4,
        loss: str = "MSE",
        ema_smoothing: bool = False,
        label_dropout: float = 0.0,
        mesh=None,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        seed: int = 0,
        metrics_path: Optional[str] = None,
        vgg_variables=None,
        allow_random_vgg: bool = False,
        batch_transform=None,
        checkpoint_backend: str = "msgpack",
        steps_per_dispatch: int = 1,
    ):
        self.model = model
        self.image_size = image_size
        self.snapshot_path = snapshot_path
        self.ema_smoothing = ema_smoothing
        self.label_dropout = label_dropout
        self.loss_name = loss
        self.mesh = mesh
        # Optional jitted device-side batch transform (on-device degradation:
        # loader yields raw decoded uint8, the accelerator derives x/cond —
        # see data/device_degradation.py). Applied after mesh placement so the
        # transform runs sharded.
        self.batch_transform = batch_transform
        if checkpoint_backend not in ("msgpack", "orbax"):
            raise ValueError(f"unknown checkpoint_backend {checkpoint_backend!r}")
        self.checkpoint_backend = checkpoint_backend
        self._orbax = None  # lazy OrbaxSnapshotter (async writes off-thread)
        self.epochs_run = 0
        self._rng = np.random.default_rng(seed)
        self._host_key = jax.random.PRNGKey(seed)
        self._key_buf = []

        self.process = make_process(
            model, noise_schedule, noise_steps, image_size,
            beta_start=beta_start, beta_end=beta_end,
        )
        self.schedule = self.process.schedule
        if loss == "MSE+Perceptual_noise" and vgg_variables is None:
            # The reference's perceptual term uses torchvision's *pretrained*
            # VGG19 (train_diffusion_superres.py:25-63); without those weights
            # the semantics cannot be reproduced, so silently training against
            # random features is a hard error unless explicitly opted into.
            if not allow_random_vgg:
                raise ValueError(
                    "MSE+Perceptual_noise requires pretrained VGG19 weights "
                    "(pass vgg_variables=losses.load_vgg19_params(<torch vgg19."
                    "features state_dict>), e.g. via --vgg19_weights <path>). "
                    "To knowingly train against a fixed randomly-initialized "
                    "VGG19 instead (a random-projection perceptual loss, NOT "
                    "the reference semantics), pass allow_random_vgg=True "
                    "(--allow_random_vgg on the CLI)."
                )
            print(
                "WARNING: MSE+Perceptual_noise with --allow_random_vgg — using "
                "a fixed randomly-initialized VGG19 (random-projection "
                "perceptual loss), NOT the reference's pretrained features."
            )
        self.loss_fn = make_loss_fn(loss, vgg_variables=vgg_variables)
        self.optimizer = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
        # steps_per_dispatch > 1 runs K train steps per device dispatch as one
        # jitted lax.scan over K stacked batches: the update sequence (and so
        # the trained model) matches the K=1 path — same batches, same
        # per-batch keys, same per-step EMA/BN-stat updates — with Kx fewer
        # host->device round trips. Measured through the remote-TPU tunnel
        # (B16, bf16, device-degradation transform; benchmarks/NOTES.md
        # round-3): a WIN only in the dispatch-bound small-image regime —
        # 64px K=8: 89 -> 142 steps/s (+60%, the reference generation-family
        # shape) — and a LOSS where the stacked transfer is bandwidth-bound
        # (128px: 59 -> 48; 256px: 16 -> 12), because the async K=1 stream
        # already overlaps per-batch transfers with compute. Default 1;
        # pinned equal to the single-step path in tests/test_multi_dispatch.py
        # and under the real 2-process mesh in tests/mp_worker.py.
        if steps_per_dispatch < 1:
            raise ValueError(f"steps_per_dispatch must be >= 1, got {steps_per_dispatch}")
        self.steps_per_dispatch = int(steps_per_dispatch)
        self._train_step = None
        self._multi_step = None
        self._val_step = None
        from diffusionremotesensing_tpu.profiling import MetricsLogger

        self.metrics = MetricsLogger(metrics_path)

    # ------------------------------------------------------------------ state

    def init_state(self, variables) -> TrainState:
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            ema_params=jax.tree_util.tree_map(jnp.copy, params) if self.ema_smoothing else None,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def replicate_state(self, state: TrainState) -> TrainState:
        """Place the train state replicated across the mesh."""
        if self.mesh is None:
            return state
        rs = replicated_sharding(self.mesh)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, rs), state)

    def maybe_resume(self, state: TrainState) -> TrainState:
        """Auto-resume from snapshot if it exists (reference ctor behavior)."""
        if self.snapshot_path and os.path.exists(self.snapshot_path):
            model_state, epochs_run = dio.load_snapshot(self.snapshot_path)
            self.epochs_run = epochs_run
            params = model_state["params"]
            bs = model_state.get("batch_stats", state.batch_stats)
            state = state.replace(
                params=params,
                batch_stats=bs,
                ema_params=jax.tree_util.tree_map(jnp.copy, params)
                if self.ema_smoothing
                else None,
            )
            print(f"Resuming training from snapshot at Epoch {epochs_run}")
        return state

    def save_snapshot(self, state: TrainState, epoch: int) -> None:
        """EMA weights replace raw weights when EMA is on (reference :411).

        The orbax branch is COLLECTIVE: under a multi-process mesh every rank
        must enter CheckpointManager.save (orbax synchronizes hosts and only
        the primary writes) — rank-0-gating it would deadlock rank 0 in the
        sync barrier. Only the msgpack write is rank-0-gated."""
        if not self.snapshot_path:
            return
        orbax = self.checkpoint_backend == "orbax"
        if not orbax and not is_main_process():
            return  # msgpack: non-main ranks skip the device_get entirely
        params = state.ema_params if self.ema_smoothing else state.params
        model_state = {"params": jax.device_get(params), "batch_stats": jax.device_get(state.batch_stats)}
        if orbax:
            if self._orbax is None:
                self._orbax = dio.OrbaxSnapshotter(self.snapshot_path)
            self._orbax.save(model_state, epoch)
        else:
            dio.save_snapshot(self.snapshot_path, model_state, epoch)
        if is_main_process():
            print(f"Epoch {epoch} | Training snapshot saved at {self.snapshot_path}")

    def finalize_snapshots(self) -> None:
        """Block until any in-flight async (orbax) snapshot write is durable.
        Called at the end of ``train``; safe to call anytime."""
        if self._orbax is not None:
            self._orbax.wait_until_finished()

    # ------------------------------------------------------------------ steps

    def _train_step_fn(self) -> Callable:
        """The raw (unjitted) train step — shared by the single-dispatch jit
        (`_build_train_step`) and the steps_per_dispatch>1 lax.scan wrapper
        (`_build_multi_step`), so both paths compute identical math."""
        model, schedule, loss_fn, optimizer = self.model, self.schedule, self.loss_fn, self.optimizer
        T = self.process.noise_steps
        ema_on = self.ema_smoothing

        def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], key):
            x0 = batch["x"]
            cond = batch.get("cond")
            cond_mask = batch.get("cond_mask")
            pad_mask = batch.get("pad_mask")  # excludes wrap-padded rows (loader.py)
            k_t, k_noise = jax.random.split(key)
            t = sample_timesteps(k_t, x0.shape[0], T)
            x_t, noise = q_sample(schedule, x0, t, k_noise)

            def loss_of(params):
                mutable = ["batch_stats"]
                if getattr(model, "s2d_train", False):
                    # the s2d train path computes level-0 BN stats itself and
                    # sows the momentum-updated values (unet._forward_s2d)
                    mutable.append("s2d_stats")
                out, updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x_t,
                    t,
                    cond,
                    cond_mask,
                    train=True,
                    mutable=mutable,
                )
                new_stats = updates["batch_stats"]
                if "s2d_stats" in updates:
                    sown = updates["s2d_stats"]["updates"][0]
                    new_stats = _merge_nested(new_stats, sown)
                return loss_fn(out, noise, weights=pad_mask), new_stats

            (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
            updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_ema = (
                ema_update(state.ema_params, new_params, state.step, EMA_BETA, EMA_WARMUP_STEPS)
                if ema_on
                else None
            )
            new_state = state.replace(
                params=new_params,
                batch_stats=new_stats,
                ema_params=new_ema,
                opt_state=new_opt,
                step=state.step + 1,
            )
            return new_state, loss

        return train_step

    def _build_train_step(self) -> Callable:
        # Sharding is carried by the inputs themselves: the batch is placed
        # with NamedSharding(data) by _prep_batch and the state is replicated
        # by replicate_state(); jit propagates both and inserts the gradient
        # all-reduce over ICI.
        return jax.jit(self._train_step_fn(), donate_argnums=0)

    def _build_multi_step(self) -> Callable:
        """K train steps as ONE dispatch: lax.scan of the shared step fn over
        K stacked batches (dict of (K, B, ...) arrays) and (K,) keys. The
        device-side batch transform (on-device degradation) moves inside the
        scan body — per sub-batch, exactly where the K=1 path applies it."""
        step = self._train_step_fn()
        transform = self.batch_transform

        def multi_step(state: TrainState, batches: Dict[str, jnp.ndarray], keys):
            def body(st, xs):
                b, k = xs
                if transform is not None and "hr_u8" in b:
                    b = transform(b)
                return step(st, b, k)

            return jax.lax.scan(body, state, (batches, keys))

        return jax.jit(multi_step, donate_argnums=0)

    def _build_val_step(self) -> Callable:
        model, schedule, loss_fn = self.model, self.schedule, self.loss_fn
        T = self.process.noise_steps
        ema_on = self.ema_smoothing

        def val_step(state: TrainState, batch, key):
            x0 = batch["x"]
            k_t, k_noise = jax.random.split(key)
            t = sample_timesteps(k_t, x0.shape[0], T)
            x_t, noise = q_sample(schedule, x0, t, k_noise)
            params = state.ema_params if ema_on else state.params
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x_t,
                t,
                batch.get("cond"),
                batch.get("cond_mask"),
                train=False,
            )
            return loss_fn(out, noise, weights=batch.get("pad_mask"))

        return jax.jit(val_step)

    def next_key(self):
        """Per-batch PRNG key, refilled 256 at a time ON THE CPU BACKEND.

        A chained jax.random.split on the default device costs a full device
        round-trip per batch through the remote-TPU tunnel (measured 71 ms —
        several times the 14 ms step itself) and inserts a device-side
        dependency chain between consecutive steps. Splitting a buffer of
        keys on the host CPU keeps the training dispatch stream pure:
        the 8-byte key rides along with the batch transfer."""
        if not self._key_buf:
            try:
                # local_devices, not devices: in a multi-process job the
                # global cpu device 0 is only addressable by process 0
                cpu = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                cpu = None
            if cpu is not None:
                with jax.default_device(cpu):
                    keys = jax.random.split(self._host_key, 257)
            else:
                keys = jax.random.split(self._host_key, 257)
            keys = np.asarray(jax.device_get(keys))
            self._host_key = keys[0]
            self._key_buf = list(keys[1:])
        return self._key_buf.pop()

    def _prep_batch(
        self, batch: Dict[str, np.ndarray], train: bool = True, device: bool = True
    ) -> Dict[str, jnp.ndarray]:
        """Host batch -> device (sharded when on a mesh), with per-batch label
        dropout for CFG training. Training batches only — a conscious
        deviation: the reference's generation VAL loop also applies 10%
        label dropout (train_diffusion_generation.py:466-467), but that code
        is dead (generation always trains with val_loader=None, :625), so
        dropping only on train batches is behaviorally identical and the
        statistically saner semantics (see PARITY.md)."""
        out = dict(batch)
        if train and self.label_dropout > 0 and "cond" in out:
            n = out["x"].shape[0]
            drop = self._rng.random() < self.label_dropout
            out["cond_mask"] = np.full((n,), 0.0 if drop else 1.0, np.float32)
        if not device:
            # host-side prep only (steps_per_dispatch>1 accumulation): mesh
            # placement happens on the stacked batch, the transform inside
            # the multi-step scan
            return out
        if self.mesh is not None:
            out = shard_batch(out, self.mesh)
        if self.batch_transform is not None and "hr_u8" in out:
            out = self.batch_transform(out)
        return out

    def _stack_for_dispatch(self, prepped: list) -> Dict[str, np.ndarray]:
        """Stack K host-prepped batches into (K, B, ...) arrays, mesh-placed
        with the batch axis at dim 1 (the scan axis is dim 0)."""
        stacked = {
            k: np.stack([np.asarray(p[k]) for p in prepped]) for k in prepped[0]
        }
        if self.mesh is not None:
            stacked = shard_batch(stacked, self.mesh, batch_axis=1)
        return stacked

    # ------------------------------------------------------------------ loop

    def train(
        self,
        state: TrainState,
        epochs: int,
        train_loader,
        val_loader=None,
        check_preds_epoch: int = 20,
        patience: int = 10,
        verbose: bool = True,
        on_preview: Optional[Callable[[TrainState, int], None]] = None,
    ) -> TrainState:
        """Epoch loop mirroring the reference's Diffusion.train control flow.

        Preemption-safe: on SIGTERM/SIGINT the loop finishes the current
        unit of work, snapshots, and returns cleanly (TPU pods are routinely
        preempted with a grace period). Granularity: per-BATCH when
        single-process; per-EPOCH under a multi-process mesh — every train
        step and orbax save is a collective all ranks must enter, and ranks
        receive the signal at different batch indices, so breaking
        mid-epoch would deadlock the stragglers (shard lengths are equal by
        construction, making the epoch boundary a safe sync point)."""
        if self._train_step is None:
            self._train_step = self._build_train_step()
        if self._val_step is None and val_loader is not None:
            self._val_step = self._build_val_step()
        state = self.replicate_state(state)

        import signal

        self._stop_requested = False
        multiproc = jax.process_count() > 1

        def _on_signal(signum, frame):
            self._stop_requested = True
            if is_main_process():
                # os.write, not print: the handler can interrupt an
                # in-progress print holding the stdout buffer lock, and a
                # reentrant print() raises, killing the run unsnapshotted
                os.write(2, (
                    f"signal {signum}: will snapshot and stop at the next "
                    f"{'epoch' if multiproc else 'batch'} boundary\n"
                ).encode())

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # not the main thread (e.g. serving/test harness)
                pass

        best_loss = float("inf")
        epochs_without_improving = 0
        interrupted = False

        def _stop_agreed() -> bool:
            """Stop decision every rank agrees on. Multi-process: ranks may
            receive the signal at different times (or only one may receive
            it), so the process-LOCAL flags are combined with an any()
            allgather that every rank enters at the same program point —
            checking the local flag alone could send rank 0 into the
            collective snapshot while rank 1 enters the next epoch's train
            step, deadlocking both."""
            if not multiproc:
                return self._stop_requested
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(
                np.asarray(int(self._stop_requested), np.int32)
            )
            return bool(np.any(flags))

        try:
            for epoch in range(self.epochs_run, epochs):
                if hasattr(train_loader, "set_epoch"):
                    train_loader.set_epoch(epoch)

                t0 = time.time()
                losses, nb = [], 0
                epoch_cut_short = False
                spd = self.steps_per_dispatch
                pend: list = []
                pend_keys: list = []
                pend_sig: dict = {}

                def _flush():
                    # K pending batches -> ONE device dispatch (scan of the
                    # shared step). A short tail (epoch end / field-set
                    # change) scans at its own length — one extra compile
                    # per distinct tail length, not per epoch.
                    nonlocal state, nb
                    if not pend:
                        return
                    if self._multi_step is None:
                        self._multi_step = self._build_multi_step()
                    state, ls = self._multi_step(
                        state, self._stack_for_dispatch(pend), np.stack(pend_keys)
                    )
                    losses.append(ls)  # (k,) device array; stays on-device
                    nb += len(pend)
                    pend.clear()
                    pend_keys.clear()

                for batch in train_loader:
                    if self._stop_requested and not multiproc:
                        interrupted = True
                        epoch_cut_short = True
                        break
                    if spd > 1:
                        prepped = self._prep_batch(batch, device=False)
                        sig = {k: np.shape(v) for k, v in prepped.items()}
                        if pend and sig != pend_sig:
                            _flush()  # field set or shapes changed (pad_mask
                            # appearing, or a short un-padded final batch)
                        pend_sig = sig
                        pend.append(prepped)
                        pend_keys.append(np.asarray(self.next_key()))
                        if len(pend) == spd:
                            _flush()
                        continue
                    batch = self._prep_batch(batch)
                    state, loss = self._train_step(state, batch, self.next_key())
                    # keep losses on-device: a float() here would block dispatch
                    # of the next step and serialize host<->device every batch
                    losses.append(loss)
                    nb += 1
                _flush()
                running = (
                    float(jnp.mean(jnp.concatenate([jnp.atleast_1d(l) for l in losses])))
                    if losses else 0.0
                )
                sps = nb / max(time.time() - t0, 1e-9)
                if verbose and is_main_process():
                    tag = " [partial epoch]" if epoch_cut_short else ""
                    print(f"Epoch {epoch}: Running Train ({self.loss_name}) {running:.6f}  [{sps:.2f} steps/s]{tag}")
                # a signal mid-epoch leaves a mean over fewer batches: tag the
                # entry so metrics consumers don't read it as a full epoch
                extra = {"partial": True} if epoch_cut_short else {}
                self.metrics.log(epoch=epoch, train_loss=running, steps_per_sec=sps, step=int(state.step), **extra)

                if _stop_agreed():
                    interrupted = True
                    self.save_snapshot(state, epoch)
                    if verbose and is_main_process():
                        print(f"Epoch {epoch}: interrupted — snapshot saved, stopping")
                    break

                if epoch % check_preds_epoch == 0:
                    # ALL processes enter this branch: under multi-host meshes the
                    # preview's jitted sampling is a global-mesh computation that
                    # every process must enqueue (rank-0-only would deadlock the
                    # collectives); file writes are rank-0-gated inside
                    # save_snapshot and the preview callbacks.
                    if val_loader is None:
                        self.save_snapshot(state, epoch)
                    if on_preview is not None:
                        on_preview(state, epoch)

                if val_loader is not None:
                    val_losses = []
                    for batch in val_loader:
                        batch = self._prep_batch(batch, train=False)
                        val_losses.append(self._val_step(state, batch, self.next_key()))
                    running_val = float(jnp.mean(jnp.stack(val_losses))) if val_losses else 0.0
                    if verbose and is_main_process():
                        print(f"Epoch {epoch}: Running Val loss ({self.loss_name}) {running_val:.6f}")
                    self.metrics.log(epoch=epoch, val_loss=running_val)

                    if running_val < best_loss:
                        best_loss = running_val
                        epochs_without_improving = 0
                        self.save_snapshot(state, epoch)
                    else:
                        epochs_without_improving += 1

                    if epochs_without_improving >= patience:
                        print("Early stopping! Training stopped")
                        break
                if verbose and is_main_process():
                    print("Epochs without improving: ", epochs_without_improving)

        finally:
            self.finalize_snapshots()
            for sig, h in old_handlers.items():
                signal.signal(sig, h)
            self._stop_requested = False
        if interrupted and verbose and is_main_process():
            print("Training stopped by signal; snapshot is durable — rerun to resume")
        return state

    # ------------------------------------------------------------------ infer

    def sample(self, state: TrainState, n: int, cond=None, cfg_scale=None, capture_frames=False, key=None):
        """Sample with the EMA weights when EMA is on (reference preview/val).

        Runs as a global-mesh computation when the trainer has a mesh: every
        process must call this at the same program point (Trainer.train's
        preview branch does), with x_T/cond/key placed replicated by
        DiffusionProcess.sample — pinned under a real 2-process runtime in
        tests/test_multiprocess.py (rank-identical preview outputs)."""
        params = state.ema_params if self.ema_smoothing else state.params
        variables = {"params": params, "batch_stats": state.batch_stats}
        return self.process.sample(
            variables,
            key if key is not None else self.next_key(),
            n,
            cond=cond,
            cfg_scale=cfg_scale,
            capture_frames=capture_frames,
            mesh=self.mesh,
        )
