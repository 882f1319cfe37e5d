"""Worker process for the real multi-process (multi-host analog) test.

Launched by tests/test_multiprocess.py as N separate Python processes, each
with 2 virtual CPU devices, joined into one JAX job through
``parallel.sharding.initialize_distributed`` (gloo collectives over
localhost) — the closest single-machine analog of the reference's
torchrun+NCCL DDP launch (/root/reference/train_diffusion_superres.py:584-676,
638-640). Exercises, under a REAL multi-process runtime rather than a
single-process virtual mesh:

* ``initialize_distributed`` (jax.distributed.initialize passthrough)
* ``shard_batch``'s multi-process path (make_array_from_process_local_data)
* per-process dataset sharding (DataLoader num_shards/shard_index, the
  DistributedSampler analog) inside a full ``Trainer.train`` epoch loop
* collective train/val steps every process must enter (the reference's
  rank-synchronous DDP semantics)
* ``is_main_process`` rank-0 gating of snapshot writes

Writes a JSON result file per process; the pytest wrapper asserts
cross-process agreement and equality with a single-process run on the same
global batch.
"""

import json
import os
import sys


def synthetic_item(i, hr=16, mag=2):
    import numpy as np

    r = np.random.default_rng(1000 + i)
    return {
        "x": r.random((hr, hr, 3)).astype(np.float32),
        "cond": r.random((hr // mag, hr // mag, 3)).astype(np.float32),
    }


class SyntheticSuperresDS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return synthetic_item(i)


def global_batch(n=8, hr=16, mag=2):
    """The fixed global batch for the exact-numerics check (identical on
    every process; each process feeds only its contiguous local slice)."""
    import numpy as np

    rng = np.random.default_rng(0)
    return {
        "x": rng.random((n, hr, hr, 3)).astype(np.float32),
        "cond": rng.random((n, hr // mag, hr // mag, 3)).astype(np.float32),
    }


def build_trainer(mesh, snapshot_path=None, metrics_path=None):
    import jax

    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )
    from diffusionremotesensing_tpu.train import Trainer

    model = residual_attention_unet_superres(magnification_factor=2)
    variables = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    trainer = Trainer(
        model,
        noise_schedule="cosine",
        noise_steps=10,
        image_size=16,
        snapshot_path=snapshot_path,
        lr=1e-3,
        loss="MSE",
        ema_smoothing=True,
        mesh=mesh,
        metrics_path=metrics_path,
    )
    return trainer, variables


def main():
    pid, nproc, port, outdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    # The container's sitecustomize pins JAX_PLATFORMS=axon; config updates
    # before first backend use are the supported override (as in conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from diffusionremotesensing_tpu.parallel.sharding import (
        initialize_distributed,
        is_main_process,
        make_mesh,
        shard_batch,
    )

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid, jax.process_index()
    assert is_main_process() == (pid == 0)

    import numpy as np

    mesh = make_mesh()  # all global devices (2 per process)
    n_global_dev = mesh.devices.size

    # --- 1) exact numerics: one train step on a KNOWN global batch ---------
    snap = os.path.join(outdir, f"snapshot_proc{pid}.msgpack")
    metrics = os.path.join(outdir, f"metrics_proc{pid}.jsonl")
    trainer, variables = build_trainer(mesh, snapshot_path=snap, metrics_path=metrics)
    state = trainer.replicate_state(trainer.init_state(variables))
    step = trainer._build_train_step()

    g = global_batch()
    half = g["x"].shape[0] // nproc
    local = {k: v[pid * half : (pid + 1) * half] for k, v in g.items()}
    batch = shard_batch(local, mesh)
    state, loss = step(state, batch, jax.random.PRNGKey(7))
    first_loss = float(loss)

    # --- 2) full Trainer.train: sharded loaders, collective val, rank-0 IO -
    from diffusionremotesensing_tpu.data.loader import DataLoader

    # per-process batch_size (DDP semantics: global batch = batch_size x nproc),
    # pad_to_multiple = global device count, exactly as cli.py wires it
    train_loader = DataLoader(
        SyntheticSuperresDS(16),
        batch_size=4,
        shuffle=True,
        pad_to_multiple=n_global_dev,
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
    )
    val_loader = DataLoader(
        SyntheticSuperresDS(8),
        batch_size=4,
        shuffle=False,
        pad_to_multiple=n_global_dev,
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
    )
    previews = []
    preview_sums = []

    def on_preview(s, e):
        # REAL preview sampling under the multi-process mesh: a global-mesh
        # scan every rank must enter (the reference's rank-0-only preview
        # maps to rank-0-only FILE WRITES; the computation is collective).
        # The digest must be identical across ranks (lockstep keys +
        # replicated x_T via DiffusionProcess.sample(mesh=...)).
        lr = np.random.default_rng(5).random((2, 8, 8, 3)).astype(np.float32)
        out = trainer.sample(s, n=2, cond=lr)
        previews.append(e)
        preview_sums.append(float(np.asarray(out, np.float64).sum()))

    state = trainer.train(
        state,
        epochs=2,
        train_loader=train_loader,
        val_loader=val_loader,
        check_preds_epoch=1,
        patience=10,
        verbose=False,
        on_preview=on_preview,
    )

    # collective orbax save: EVERY rank must enter CheckpointManager.save
    # (rank-0-gating it deadlocks — the round-2 review finding); the path is
    # shared and only the primary host writes.
    orbax_path = os.path.join(outdir, "snapshot_orbax")
    trainer.checkpoint_backend = "orbax"
    trainer.snapshot_path = orbax_path
    trainer.save_snapshot(state, 3)
    trainer.finalize_snapshots()
    orbax_saved = os.path.isdir(orbax_path)

    # asymmetric preemption: ONLY rank 0 has a pending stop request; the
    # epoch-boundary allgather in Trainer.train must stop BOTH ranks after
    # exactly one epoch (local-flag-only checks would deadlock rank 1 in the
    # next epoch's collectives while rank 0 exits)
    trainer.checkpoint_backend = "msgpack"
    trainer.snapshot_path = os.path.join(outdir, f"snapshot_stop_proc{pid}.msgpack")
    final_step_main = int(state.step)  # before the extra stop-train epochs

    class StopInjector:
        """Raises the trainer's stop flag on ONE rank during epoch 0 —
        mimicking a SIGTERM delivered to only that rank mid-epoch (train()
        clears the flag at entry, so pre-setting it wouldn't survive)."""

        def __init__(self, inner):
            self.inner = inner

        def set_epoch(self, e):
            if e == 0 and pid == 0:
                trainer._stop_requested = True
            self.inner.set_epoch(e)

        def __iter__(self):
            return iter(self.inner)

        def __len__(self):
            return len(self.inner)

    state = trainer.train(
        state, epochs=3, train_loader=StopInjector(train_loader),
        check_preds_epoch=10**6, verbose=False,
    )
    stop_epoch_steps = int(state.step) - final_step_main

    # --- multi-dispatch under the REAL multi-process mesh: (K, B, ...)
    # stacks are per-process slices joined into global arrays via
    # make_array_from_process_local_data on batch axis 1 (sharding.shard_batch
    # batch_axis=1) — must execute and produce rank-identical losses
    trainer.steps_per_dispatch = 2
    trainer._multi_step = None
    spd_losses = []
    orig_log = trainer.metrics.log
    trainer.metrics.log = lambda **kw: spd_losses.append(float(kw["train_loss"]))
    state = trainer.train(
        state, epochs=1, train_loader=train_loader,
        check_preds_epoch=10**6, verbose=False,
    )
    trainer.metrics.log = orig_log

    # loader shard disjointness under the real process indices
    train_loader.set_epoch(0)
    my_idx = sorted(int(i) for i in train_loader._shard_indices())

    with open(os.path.join(outdir, f"result_proc{pid}.json"), "w") as f:
        json.dump(
            {
                "pid": pid,
                "process_count": jax.process_count(),
                "device_count": jax.device_count(),
                "local_device_count": jax.local_device_count(),
                "first_loss": first_loss,
                "final_step": final_step_main,
                "previews": previews,
                "preview_sums": preview_sums,
                "snapshot_written": os.path.exists(snap),
                "orbax_saved": orbax_saved,
                "stop_epoch_steps": stop_epoch_steps,
                "spd_losses": spd_losses,
                "shard_indices_epoch0": my_idx,
            },
            f,
        )
    print(f"proc{pid}: OK first_loss={first_loss:.8f}", flush=True)


if __name__ == "__main__":
    main()
