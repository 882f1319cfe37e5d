"""Launchers behind the reference-parity CLI entry points.

The repo-root scripts (train_diffusion_superres.py, train_diffusion_SAR_TO_NDVI.py,
generate_new_imgs/train_diffusion_generation.py, Aggregation_Sampling.py) keep
the reference's exact flag names/defaults (SURVEY.md §2 CLI row) and call into
these functions. Differences from the reference are TPU-native by design:

* ``--multiple_gpus`` builds a 1-axis device mesh over all local chips
  (sharded jit over ICI) instead of torchrun+DDP/NCCL — a single process.
* ``--device`` accepts 'tpu'/'cpu'/'cuda' ('cuda' maps to the default
  accelerator so reference command lines keep working).
* snapshots are msgpack but the loader transparently accepts the reference's
  torch ``snapshot.pt`` files for checkpoint parity.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def str2bool(v: str) -> bool:
    """Reference CLI boolean convention."""
    return str(v).lower() in ("yes", "true", "t", "1")


def _configure_platform() -> None:
    """Honor DRS_FORCE_CPU=1 even when a site customization pins the remote
    TPU platform (used by CI/smoke tests), and enable the persistent
    compilation cache for accelerator runs: a cold train-step compile
    through a remote-TPU tunnel costs 5-10 minutes, paid on EVERY CLI
    invocation without the cache. min_compile_time=5 s keeps the small
    CPU-backend init compiles out (warm XLA:CPU AOT loads emit spurious
    machine-feature-mismatch errors — bench.py/NOTES.md); the cache dir is
    machine-scoped for the same reason."""
    import jax

    from diffusionremotesensing_tpu.utils import force_cpu_if_requested

    if force_cpu_if_requested():
        if os.environ.get("DRS_CPU_COMPILE_CACHE"):
            # Opt-in (the test suite sets it): persistent cache for CPU
            # smoke runs — the CLI subprocess tests otherwise each pay a
            # multi-minute cold fwd+bwd compile. Not default because warm
            # XLA:CPU AOT loads log spurious feature-mismatch errors
            # (+prefer-no-scatter/+prefer-no-gather are pseudo-features
            # host detection never reports — see bench.py); measured
            # harmless, but too alarming to show every CPU CLI user.
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("DRS_CPU_COMPILE_CACHE_DIR", "/tmp/jax_cache"),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        return
    from diffusionremotesensing_tpu.utils import machine_scoped_cache_dir

    jax.config.update("jax_compilation_cache_dir", machine_scoped_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)



def _decode_cache(args):
    """ONE DecodedCache shared by the train and val datasets so
    --decode_cache_mb bounds TOTAL cache RAM, not per-dataset."""
    mb = getattr(args, "decode_cache_mb", 0.0)
    if not mb:
        return None
    from diffusionremotesensing_tpu.data.datasets import DecodedCache

    return DecodedCache(mb)


def _check_unet_type(name: str) -> None:
    """Reference launchers accept only the Residual Attention UNet (the two
    MultiHead variants are commented-out WIP in the reference,
    UNet_model_superres.py:384-657)."""
    known = "residual attention unet"
    if (name or known).lower() != known:
        raise ValueError(
            "The UNet type must be Residual Attention UNet (MultiHead variants "
            "are work-in-progress in the reference and not implemented)"
        )
    print("Using Residual Attention UNet")


def _select_device(name: Optional[str]):
    import jax

    if name in (None, "", "cuda", "tpu"):
        return jax.devices()[0]
    try:
        return jax.devices(name)[0]
    except RuntimeError:
        return jax.devices()[0]


def _train_seed(default: int = 0) -> int:
    """DRS_TRAIN_SEED overrides the training seed (model init + the
    Trainer's noise/shuffle streams). An env knob, not a CLI flag — the
    flag surface mirrors the reference (which has no seed flag); used to
    replicate learning-gate trainings across seeds (NOTES.md round-5)."""
    return int(os.environ.get("DRS_TRAIN_SEED", default))


def create_variables(model, image_size: int, seed: Optional[int] = None, device=None):
    """Initialize model variables on the CPU backend (fast eager compile)
    and transfer to the target device. ``seed`` defaults to DRS_TRAIN_SEED
    (0 when unset)."""
    import jax

    from diffusionremotesensing_tpu.models.unet import init_unet_params

    if seed is None:
        seed = _train_seed()

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            variables = init_unet_params(model, jax.random.PRNGKey(seed), image_size)
    else:
        variables = init_unet_params(model, jax.random.PRNGKey(seed), image_size)
    if device is not None:
        variables = jax.device_put(variables, device)
    return variables



def _model_dtype(args):
    """--compute_dtype flag -> flax computation dtype (params stay f32)."""
    if getattr(args, "compute_dtype", "float32") == "bfloat16":
        import jax.numpy as jnp

        return jnp.bfloat16
    return None



def _gate_kernel_flags(args, device) -> None:
    """Device-awareness for the boolean Mosaic kernel flags, mirroring
    resolve_tap44's: on a TPU-default host with --device cpu the model would
    compile the Pallas programs for the CPU device (unet.pallas_device_ok) —
    drop to the numerically-identical XLA path with a note rather than
    crash. fused_update additionally needs a REAL TPU (its hardware PRNG has
    no interpret-mode lowering)."""
    from diffusionremotesensing_tpu.models.unet import (
        fused_update_device_ok,
        pallas_device_ok,
    )

    kernels_ok = pallas_device_ok(device)
    for flag in ("fused_att", "dec_block", "fused_update"):
        want = bool(getattr(args, flag, False))
        ok = kernels_ok if flag != "fused_update" else fused_update_device_ok(device)
        if want and not ok:
            print(
                f"--{flag} requires a TPU-compatible device (computation is "
                f"committed to {device.platform}); using the equivalent XLA path."
            )
            setattr(args, flag, False)


def _process_shard():
    """Per-process dataset sharding (DistributedSampler parity, reference
    train_diffusion_superres.py:631-635): when training spans multiple JAX
    processes, each host must load a disjoint shard of the dataset — building
    identical global batches on every process would silently train on
    duplicated data. Single-process runs get the identity shard (1, 0)."""
    import jax

    return jax.process_count(), jax.process_index()

def _make_mesh_if(multiple: bool):
    if not multiple:
        return None
    from diffusionremotesensing_tpu.parallel.sharding import make_mesh

    return make_mesh()


def _load_vgg_variables(args):
    """--vgg19_weights: a torch-saved ``vgg19.features`` state_dict (the
    torchvision pretrained weights, fetched on a machine with egress)."""
    path = getattr(args, "vgg19_weights", None)
    if not path:
        return None
    import torch

    from diffusionremotesensing_tpu.losses import load_vgg19_params

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return load_vgg19_params(state)


def _build_trainer(model, args, image_size, label_dropout=0.0, mesh=None,
                   batch_transform=None):
    from diffusionremotesensing_tpu.train import Trainer

    snapshot_path = os.path.join(args.snapshot_folder_path, args.snapshot_name)
    return Trainer(
        model,
        noise_schedule=args.noise_schedule,
        noise_steps=args.noise_steps,
        image_size=image_size,
        snapshot_path=snapshot_path,
        lr=args.lr,
        loss=args.loss,
        ema_smoothing=args.ema_smoothing,
        label_dropout=label_dropout,
        mesh=mesh,
        vgg_variables=_load_vgg_variables(args),
        allow_random_vgg=getattr(args, "allow_random_vgg", False),
        batch_transform=batch_transform,
        checkpoint_backend=getattr(args, "checkpoint_backend", "msgpack"),
        steps_per_dispatch=getattr(args, "steps_per_dispatch", 1),
        seed=_train_seed(),
    )



def _export_denoising_video(frames, results_dir: str) -> None:
    """Write the captured denoising trajectory of the first sample as
    video_denoising.mp4 (reference video export, fps 100); main process only."""
    from diffusionremotesensing_tpu.parallel.sharding import is_main_process
    from diffusionremotesensing_tpu.utils import video_maker

    if not is_main_process():
        return
    video_maker(
        [np.asarray(f[0]) for f in np.asarray(frames)],
        os.path.join(results_dir, "video_denoising.mp4"),
        fps=100,
    )


def _results_dir(model_name: str, snapshot_folder_path: Optional[str] = None) -> str:
    """models_run/<name>/results next to the weights folder — the generation
    script runs from generate_new_imgs/ and uses ../models_run (reference
    train_diffusion_generation.py:433), the others use ./models_run."""
    if snapshot_folder_path:
        d = os.path.join(os.path.dirname(snapshot_folder_path), "results")
    else:
        d = os.path.join(os.curdir, "models_run", model_name, "results")
    os.makedirs(d, exist_ok=True)
    return d


# --------------------------------------------------------------- superres


def launch_superres(args) -> None:
    """train_diffusion_superres launch (reference :513-693)."""
    _configure_platform()
    _check_unet_type(getattr(args, 'UNet_type', None))
    import jax

    from diffusionremotesensing_tpu.data.datasets import (
        SuperresBSRGANDataset,
        SuperresDownBlurDataset,
    )
    from diffusionremotesensing_tpu.data.loader import DataLoader
    from diffusionremotesensing_tpu.models.unet import residual_attention_unet_superres
    from diffusionremotesensing_tpu.parallel.sharding import is_main_process
    from diffusionremotesensing_tpu.utils import save_preview_grid

    blur_radius = args.Blur_radius
    if str(blur_radius).lower() != "random":
        blur_radius = float(blur_radius)
        print("Using a blur radius of ", blur_radius)
    else:
        print("Using random blur radius from a triangular distribution")
    print(f"Using {args.Degradation_type} degradation")
    print("Using EMA smoothing" if args.ema_smoothing else "Not using EMA smoothing")

    os.makedirs(args.snapshot_folder_path, exist_ok=True)
    results_dir = _results_dir(args.model_name, args.snapshot_folder_path)
    mesh = _make_mesh_if(args.multiple_gpus)

    deg = args.Degradation_type.lower()
    train_path = f"{args.dataset_path}/train_original"
    valid_path = f"{args.dataset_path}/val_original"
    batch_transform = None
    if deg in ("downblur", "downblurnoise"):
        if args.image_size % args.magnification_factor != 0:
            raise ValueError("The image size must be a multiple of the magnification factor")
        noise = deg == "downblurnoise"
        if getattr(args, "device_degradation", False):
            # host decodes only; bilinear/bicubic/blur run batched on the
            # accelerator (data/device_degradation.py — the host pipeline is
            # the training bottleneck on few-core hosts). Noise modes draw
            # host RNG per item and stay on the reference path.
            if noise:
                raise ValueError(
                    "--device_degradation supports Degradation_type DownBlur "
                    "(DownBlurNoise draws per-item host RNG)"
                )
            from diffusionremotesensing_tpu.data.datasets import DecodeOnlyDataset
            from diffusionremotesensing_tpu.data.device_degradation import (
                make_downblur_transform,
            )

            if str(blur_radius).lower() == "random":
                # same frozen draw as SuperresDownBlurDataset(seed=0)
                from diffusionremotesensing_tpu.data.degradations import _Rng

                blur_radius = _Rng(0).py.triangular(0.5, 1.5, 1)
            cache = _decode_cache(args)
            train_ds = DecodeOnlyDataset(train_path, args.image_size, cache=cache)
            val_ds = DecodeOnlyDataset(valid_path, args.image_size, cache=cache)
            batch_transform = make_downblur_transform(
                args.image_size, args.magnification_factor, float(blur_radius)
            )
        else:
            cache = _decode_cache(args)
            train_ds = SuperresDownBlurDataset(
                train_path, args.magnification_factor, blur_radius, noise, "PIL",
                args.image_size, cache=cache,
            )
            val_ds = SuperresDownBlurDataset(
                valid_path, args.magnification_factor, blur_radius, noise, "PIL",
                args.image_size, cache=cache,
            )
    elif deg == "bsrgan":
        train_ds = SuperresBSRGANDataset(
            train_path, args.magnification_factor, args.image_size,
            num_crops=args.num_crops, degradation_type="BSR_plus",
            destination_folder=os.path.join(args.dataset_path + "_Dataset", "train"),
            num_workers=getattr(args, "num_workers", 0),
        )
        val_ds = SuperresBSRGANDataset(
            valid_path, args.magnification_factor, args.image_size,
            num_crops=args.num_crops, degradation_type="BSR_plus",
            destination_folder=os.path.join(args.dataset_path + "_Dataset", "val"),
            num_workers=getattr(args, "num_workers", 0),
        )
    else:
        raise ValueError("The degradation type must be either BSRGAN or DownBlur or DownBlurNoise")

    # In BSRGAN mode, image_size is the LQ patch size (the degradation's
    # lq_patchsize, utils.py:211) so HR patches are image_size * mag — the
    # engine must sample at HR. (The reference passes image_size straight to
    # its Diffusion and its preview path would error on the size mismatch;
    # conscious fix, documented in PARITY.md.)
    hr_size = args.image_size * args.magnification_factor if deg == "bsrgan" else args.image_size

    n_dev = mesh.devices.size if mesh is not None else 1
    nw = getattr(args, "num_workers", 0)
    n_shards, shard_idx = _process_shard()
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True, pad_to_multiple=n_dev if n_dev > 1 else None, num_workers=nw, num_shards=n_shards, shard_index=shard_idx)
    val_loader = DataLoader(val_ds, args.batch_size, shuffle=True, pad_to_multiple=n_dev if n_dev > 1 else None, num_workers=nw, num_shards=n_shards, shard_index=shard_idx)

    s2d_train = getattr(args, "s2d_train", False)
    model = residual_attention_unet_superres(
        image_channels=args.inp_out_channels,
        out_dim=args.inp_out_channels,
        magnification_factor=args.magnification_factor,
        dtype=_model_dtype(args),
        s2d=s2d_train,  # val/preview sampling uses the matching fast path
        s2d_train=s2d_train,
    )
    variables = create_variables(model, hr_size)
    trainer = _build_trainer(model, args, hr_size, mesh=mesh, batch_transform=batch_transform)
    state = trainer.maybe_resume(trainer.init_state(variables))

    from diffusionremotesensing_tpu.models.unet import param_count

    print("Num params: ", param_count(state.params))

    def _xy_items(ds, n):
        """First n (x, cond) pairs; in device-degradation mode the dataset
        yields raw uint8 and the transform derives them on the accelerator."""
        items = [ds[i] for i in range(min(n, len(ds)))]
        if batch_transform is not None and "hr_u8" in items[0]:
            out = batch_transform({"hr_u8": np.stack([it["hr_u8"] for it in items])})
            return [
                {"x": np.asarray(out["x"][i]), "cond": np.asarray(out["cond"][i])}
                for i in range(len(items))
            ]
        return items

    def on_preview(st, epoch):
        # sampling runs on every process (global-mesh computation); only the
        # file write is rank-0
        items = _xy_items(val_ds, 5)
        conds = np.stack([it["cond"] for it in items])
        sr = np.asarray(trainer.sample(st, n=len(items), cond=conds))
        if not is_main_process():
            return
        rows = [(it["cond"], it["x"], s) for it, s in zip(items, sr)]
        save_preview_grid(
            rows,
            ["Low resolution image", "High resolution image", "Super resolution image"],
            os.path.join(results_dir, f"superres_{epoch}_epoch.png"),
        )

    from diffusionremotesensing_tpu.profiling import trace

    with trace(getattr(args, "profile_dir", None)):
        state = trainer.train(
            state,
            epochs=args.epochs,
            train_loader=train_loader,
            val_loader=val_loader,
            check_preds_epoch=args.check_preds_epoch,
            patience=args.patience,
            on_preview=on_preview,
        )

    # final sampling figure from the train set (reference :679-693)
    items = _xy_items(train_ds, 5)
    conds = np.stack([it["cond"] for it in items])
    if args.generate_video:
        sr, frames = trainer.sample(state, n=len(items), cond=conds, capture_frames=True)
        _export_denoising_video(frames, results_dir)
        sr = np.asarray(sr)
    else:
        sr = np.asarray(trainer.sample(state, n=len(items), cond=conds))
    if not is_main_process():
        return
    save_preview_grid(
        [(it["cond"], it["x"], s) for it, s in zip(items, sr)],
        ["Low resolution image", "High resolution image", "Super resolution image"],
        os.path.join(results_dir, "superres_results.png"),
    )


# -------------------------------------------------------------- SAR->NDVI


def launch_sar_to_ndvi(args) -> None:
    """train_diffusion_SAR_TO_NDVI launch (reference :505-636)."""
    _configure_platform()
    _check_unet_type(getattr(args, 'UNet_type', None))
    from diffusionremotesensing_tpu.data.datasets import SarToNdviDataset
    from diffusionremotesensing_tpu.data.loader import DataLoader
    from diffusionremotesensing_tpu.models.unet import (
        param_count,
        residual_attention_unet_sar_to_ndvi,
    )
    from diffusionremotesensing_tpu.parallel.sharding import is_main_process
    from diffusionremotesensing_tpu.utils import save_preview_grid

    os.makedirs(args.snapshot_folder_path, exist_ok=True)
    results_dir = _results_dir(args.model_name, args.snapshot_folder_path)
    mesh = _make_mesh_if(args.multiple_gpus)

    train_ds = SarToNdviDataset(os.path.join(args.dataset_path, "train"))
    val_ds = SarToNdviDataset(os.path.join(args.dataset_path, "valid"))
    n_dev = mesh.devices.size if mesh is not None else 1
    nw = getattr(args, "num_workers", 0)
    n_shards, shard_idx = _process_shard()
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True, pad_to_multiple=n_dev if n_dev > 1 else None, num_workers=nw, num_shards=n_shards, shard_index=shard_idx)
    val_loader = DataLoader(val_ds, args.batch_size, shuffle=True, pad_to_multiple=n_dev if n_dev > 1 else None, num_workers=nw, num_shards=n_shards, shard_index=shard_idx)

    model = residual_attention_unet_sar_to_ndvi(
        sar_channels=args.SAR_channels, ndvi_channels=args.NDVI_channels,
        dtype=_model_dtype(args),
    )
    variables = create_variables(model, args.image_size)
    trainer = _build_trainer(model, args, args.image_size, mesh=mesh)
    state = trainer.maybe_resume(trainer.init_state(variables))
    print("Num params: ", param_count(state.params))

    def on_preview(st, epoch):
        items = [val_ds[i] for i in range(min(5, len(val_ds)))]
        conds = np.stack([it["cond"] for it in items])
        pred = np.asarray(trainer.sample(st, n=len(items), cond=conds))
        if not is_main_process():
            return
        rows = [(it["cond"][..., :1], it["x"], p) for it, p in zip(items, pred)]
        save_preview_grid(
            rows,
            ["SAR image", "NDVI ground truth", "NDVI predicted"],
            os.path.join(results_dir, f"SAR_TO_NDVI_{epoch}_epoch.png"),
        )

    from diffusionremotesensing_tpu.profiling import trace

    with trace(getattr(args, "profile_dir", None)):
        state = trainer.train(
            state,
            epochs=args.epochs,
            train_loader=train_loader,
            val_loader=val_loader,
            check_preds_epoch=args.check_preds_epoch,
            patience=args.patience,
            on_preview=on_preview,
        )

    # final sampling figure from the train set (reference :620-636)
    items = [train_ds[i] for i in range(min(5, len(train_ds)))]
    conds = np.stack([it["cond"] for it in items])
    if args.generate_video:
        pred, frames = trainer.sample(state, n=len(items), cond=conds, capture_frames=True)
        pred = np.asarray(pred)
        _export_denoising_video(frames, results_dir)
    else:
        pred = np.asarray(trainer.sample(state, n=len(items), cond=conds))
    if is_main_process():
        save_preview_grid(
            [(it["cond"][..., :1], it["x"], p) for it, p in zip(items, pred)],
            ["SAR image", "NDVI image", "NDVI pred image"],
            os.path.join(results_dir, "SAR_TO_NDVI_results.png"),
        )


# -------------------------------------------------------------- generation


def launch_generation(args) -> None:
    """train_diffusion_generation launch (reference :505-638): ImageFolder
    (or CIFAR10) class-conditional training with CFG label dropout; no val
    loader (the reference passes val_loader=None, :625)."""
    _configure_platform()
    _check_unet_type(getattr(args, 'UNet_type', None))
    from diffusionremotesensing_tpu.data.datasets import ImageFolderDataset
    from diffusionremotesensing_tpu.data.loader import DataLoader
    from diffusionremotesensing_tpu.models.unet import (
        param_count,
        residual_attention_unet_generation,
    )
    from diffusionremotesensing_tpu.parallel.sharding import is_main_process
    from diffusionremotesensing_tpu.utils import save_preview_grid

    os.makedirs(args.snapshot_folder_path, exist_ok=True)
    results_dir = _results_dir(args.model_name, args.snapshot_folder_path)
    mesh = _make_mesh_if(args.multiple_gpus)

    # reference semantics (train_diffusion_generation.py:566-586): the magic
    # name 'cifar10' selects CIFAR10 at 32px; anything else is a
    # class-per-subfolder ImageFolder rooted at ../<dataset_path> (the script
    # lives in generate_new_imgs/ and data sits beside the repo root)
    if args.dataset_path.lower() == "cifar10":
        from diffusionremotesensing_tpu.data.cifar10 import Cifar10Dataset

        train_ds = Cifar10Dataset("./Cifar10", train=True)
        args.image_size = 32
    else:
        train_ds = ImageFolderDataset(os.path.join("..", args.dataset_path), args.image_size)
    num_classes = train_ds.num_classes
    n_dev = mesh.devices.size if mesh is not None else 1
    n_shards, shard_idx = _process_shard()
    train_loader = DataLoader(
        train_ds, args.batch_size, shuffle=True,
        pad_to_multiple=n_dev if n_dev > 1 else None,
        num_workers=getattr(args, "num_workers", 0),
        num_shards=n_shards, shard_index=shard_idx,
    )

    model = residual_attention_unet_generation(
        image_channels=args.inp_out_channels,
        out_dim=args.inp_out_channels,
        num_classes=num_classes,
        dtype=_model_dtype(args),
    )
    variables = create_variables(model, args.image_size)
    trainer = _build_trainer(model, args, args.image_size, label_dropout=0.1, mesh=mesh)
    state = trainer.maybe_resume(trainer.init_state(variables))
    print("Num params: ", param_count(state.params))

    def on_preview(st, epoch):
        # reference layout: num_classes rows x 5 samples per class
        # (train_diffusion_generation.py:442-452), one batched call here
        labels = np.repeat(np.arange(num_classes, dtype=np.int32), 5)
        imgs = np.asarray(trainer.sample(st, n=num_classes * 5, cond=labels, cfg_scale=3.0))
        if not is_main_process():
            return
        rows = [imgs[i * 5 : (i + 1) * 5] for i in range(num_classes)]
        save_preview_grid(
            rows,
            [f"Class sample {j}" for j in range(5)],
            os.path.join(results_dir, f"generation_{epoch}_epoch.png"),
        )

    from diffusionremotesensing_tpu.profiling import trace

    with trace(getattr(args, "profile_dir", None)):
        state = trainer.train(
            state,
            epochs=args.epochs,
            train_loader=train_loader,
            val_loader=None,
            check_preds_epoch=args.check_preds_epoch,
            patience=args.patience,
            on_preview=on_preview,
        )

    # final per-class grid (reference :630-638)
    labels = np.arange(num_classes, dtype=np.int32)
    if args.generate_video:
        imgs, frames = trainer.sample(
            state, n=num_classes, cond=labels, cfg_scale=3.0, capture_frames=True
        )
        imgs = np.asarray(imgs)
        _export_denoising_video(frames, results_dir)
    else:
        imgs = np.asarray(trainer.sample(state, n=num_classes, cond=labels, cfg_scale=3.0))
    if not is_main_process():
        return
    save_preview_grid(
        [[img] for img in imgs],
        ["generated"],
        os.path.join(results_dir, "generation_results.png"),
    )


# -------------------------------------------------------------- aggregation


def launch_aggregation(args) -> None:
    """Aggregation_Sampling launch (reference :140-205): load LR image,
    squarify if needed, tile + batched-sharded SR, save."""
    _configure_platform()
    import jax
    from PIL import Image

    from diffusionremotesensing_tpu.aggregation import AggregationSampler, squarify_sizes
    from diffusionremotesensing_tpu.io import load_snapshot
    from diffusionremotesensing_tpu.models.unet import (
        residual_attention_unet_superres,
        resolve_tap44,
    )
    from diffusionremotesensing_tpu.utils import save_image

    device = _select_device(args.device)
    s2d = getattr(args, "s2d", True)
    tap44_arg = getattr(args, "tap44", "auto")
    _gate_kernel_flags(args, device)
    model = residual_attention_unet_superres(
        image_channels=args.inp_out_channels,
        out_dim=args.inp_out_channels,
        magnification_factor=args.magnification_factor,
        s2d=s2d,
        tap44=resolve_tap44(tap44_arg, device) if s2d else False,
        fused_att=bool(getattr(args, "fused_att", False)) and s2d,
        dec_block=bool(getattr(args, "dec_block", False)) and s2d,
    )
    print(f"You are using {args.UNet_type} model")

    snapshot_path = os.path.join(args.snapshot_folder_path, args.snapshot_name)
    model_state, _ = load_snapshot(snapshot_path)
    variables = jax.device_put(
        {"params": model_state["params"], "batch_stats": model_state.get("batch_stats", {})},
        device,
    )

    def _load_lr(path: str) -> np.ndarray:
        img_lr = Image.open(path)
        if img_lr.size[0] != img_lr.size[1]:
            s = squarify_sizes(*img_lr.size)
            print(
                f"The image must be square but it is {img_lr.size[0], img_lr.size[1]}! "
                f"It will be resized to {s}x{s}"
            )
            img_lr = img_lr.resize((s, s), Image.BICUBIC)
        return np.asarray(img_lr.convert("RGB"), np.float32) / 255.0

    img_dir = getattr(args, "img_lr_dir", None)
    if img_dir:
        # directory mode (framework addition, no reference counterpart): one
        # process / one compiled sampler over every image in the folder —
        # amortizes interpreter+snapshot+compile startup across a fleet of
        # scenes instead of paying it per Aggregation_Sampling invocation
        exts = (".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp")
        paths = sorted(
            os.path.join(img_dir, f)
            for f in os.listdir(img_dir)
            if f.lower().endswith(exts)
        )
        if not paths:
            raise FileNotFoundError(f"no images with {exts} under {img_dir}")
        dest_dir = getattr(args, "destination_dir", None) or args.destination_path
        if not dest_dir:
            raise ValueError("--img_lr_dir needs --destination_dir (or --destination_path) for the outputs")
        os.makedirs(dest_dir, exist_ok=True)
        # outputs are always PNG: keeping a .jpg input's extension would
        # re-encode the super-resolved result with lossy JPEG. Stems that
        # collide across extensions (scene1.jpg + scene1.png) keep their full
        # basename so neither output silently overwrites the other.
        stems = [os.path.splitext(os.path.basename(p))[0] for p in paths]
        dest_names = [
            os.path.join(
                dest_dir,
                (s if stems.count(s) == 1 else os.path.basename(p)) + ".png",
            )
            for p, s in zip(paths, stems)
        ]
    else:
        paths = [args.img_lr_path]
        dest_dir = None

    hr_patch = args.patch_size * args.magnification_factor
    from diffusionremotesensing_tpu.diffusion import make_process

    proc = make_process(model, args.noise_schedule, args.noise_steps, hr_patch)
    base_variables = variables
    mesh = _make_mesh_if(getattr(args, "multiple_gpus", False))
    sampler = AggregationSampler(
        proc,
        patch_size=args.patch_size,
        stride=args.stride,
        magnification_factor=args.magnification_factor,
        batch_size=getattr(args, "batch_size", 16),
        mesh=mesh,
        ddim_steps=getattr(args, "ddim_steps", None),
        ddim_eta=getattr(args, "ddim_eta", 0.0),
        ddim_spacing=getattr(args, "ddim_spacing", "linear"),
        ddim_clip_x0=getattr(args, "ddim_clip_x0", True),
        fused_update=getattr(args, "fused_update", False),
        start_t=getattr(args, "start_t", None),
    )
    for i, path in enumerate(paths):
        arr = _load_lr(path)
        variables = base_variables
        if getattr(args, "quant", "none") == "int8":
            from diffusionremotesensing_tpu.ops.quant import quantize_superres_tile

            variables = quantize_superres_tile(
                model, base_variables, proc.schedule.alpha_hat, arr,
                args.patch_size, args.magnification_factor, jax.random.PRNGKey(21),
            )
            n = len(jax.tree_util.tree_leaves(variables["quant"]))
            print(f"int8 quantized execution: {n} conv-site scales calibrated "
                  f"on this tile (sites engage per execution branch)")
        # per-image key stream in directory mode (fold_in by position); the
        # single-image path keeps the sampler's default key = the behavior
        # every golden/parity test pins
        key = jax.random.fold_in(jax.random.PRNGKey(0), i) if img_dir else None
        out = sampler(variables, arr, key=key)
        if dest_dir is not None:
            save_image(out, dest_names[i])
            print(f"[{i + 1}/{len(paths)}] {path} -> {dest_names[i]}")
        else:
            save_image(out, args.destination_path)


# ------------------------------------------------------------------ serving


def build_server(args):
    """Construct a serving.InferenceServer from serve.py's flag namespace.

    No reference counterpart — the reference has no serving story (its
    inference is ad-hoc scripts) — so the flag surface is this repo's own,
    reusing its conventions: the models_run registry + model_name size
    parsing (superres_and_NDVIgen.py:20-29) and the aggregation CLI's
    kernel/DDIM knobs. Split from launch_serving so tests can drive the
    HTTP surface on an ephemeral port."""
    _configure_platform()
    import jax

    from diffusionremotesensing_tpu.io import load_snapshot
    from diffusionremotesensing_tpu.models.unet import (
        residual_attention_unet_generation,
        residual_attention_unet_sar_to_ndvi,
        residual_attention_unet_superres,
        resolve_tap44,
    )
    from diffusionremotesensing_tpu.serving import InferenceServer
    from superres_and_NDVIgen import (  # repo-root module (imports from cwd=/root/repo)
        parse_imgsize,
        parse_lr_imgsize,
        parse_magnification,
    )

    device = _select_device(args.device)
    _gate_kernel_flags(args, device)
    s2d = getattr(args, "s2d", True)
    kw = dict(
        dtype=_model_dtype(args),
        s2d=s2d,
        tap44=resolve_tap44(getattr(args, "tap44", "auto"), device) if s2d else False,
        fused_att=bool(getattr(args, "fused_att", False)) and s2d,
        dec_block=bool(getattr(args, "dec_block", False)) and s2d,
    )
    name = args.model_name or ""

    def _parse(fn, what, flag):
        try:
            return fn(name)
        except (IndexError, ValueError):
            raise SystemExit(
                f"cannot derive {what} from model_name {name!r}; pass {flag} "
                f"or use the registry naming convention "
                f"(superres_and_NDVIgen.parse_* substrings)"
            )

    if args.task == "superres":
        mag = args.magnification_factor or _parse(
            parse_magnification, "the magnification", "--magnification_factor"
        )
        image_size = args.model_input_size or mag * _parse(
            parse_lr_imgsize, "the LR input size", "--model_input_size"
        )
        model = residual_attention_unet_superres(
            image_channels=args.inp_out_channels,
            out_dim=args.inp_out_channels,
            magnification_factor=mag,
            **kw,
        )
    elif args.task == "sar_to_ndvi":
        image_size = args.model_input_size or _parse(
            parse_imgsize, "the image size", "--model_input_size"
        )
        model = residual_attention_unet_sar_to_ndvi(**kw)
    else:  # generation
        image_size = args.model_input_size or _parse(
            parse_imgsize, "the image size", "--model_input_size"
        )
        model = residual_attention_unet_generation(
            image_channels=args.inp_out_channels,
            out_dim=args.inp_out_channels,
            num_classes=args.num_classes,
            **kw,
        )

    snapshot_path = getattr(args, "snapshot_path", None) or os.path.join(
        "models_run", name, "weights", args.snapshot_name
    )
    state, _ = load_snapshot(snapshot_path)
    variables = jax.device_put(
        {"params": state["params"], "batch_stats": state.get("batch_stats", {})},
        device,
    )
    if getattr(args, "quant", "none") == "int8":
        variables = _quantize_serving_variables(args, model, variables, image_size)
    task = {"superres": "superres", "sar_to_ndvi": "sar", "generation": "generation"}
    seed = getattr(args, "seed", None)
    if seed is None:
        # fresh entropy per process: restarted servers and load-balanced
        # replicas must not replay one deterministic noise sequence
        seed = int.from_bytes(os.urandom(4), "little")
    mesh = None
    if getattr(args, "data_parallel", False):
        from diffusionremotesensing_tpu.parallel.sharding import make_mesh

        # mesh over every device of the committed platform (a --device cpu
        # debug run must not mesh the TPU chips it just opted out of)
        mesh = make_mesh(jax.devices(device.platform))
    return InferenceServer(
        model,
        variables,
        noise_schedule=args.noise_schedule,
        noise_steps=args.noise_steps,
        image_size=image_size,
        task=task[args.task],
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        ddim_steps=getattr(args, "ddim_steps", None),
        ddim_clip_x0=getattr(args, "ddim_clip_x0", True),
        seed=seed,
        mesh=mesh,
        start_t=getattr(args, "start_t", None),
    )


def _quantize_serving_variables(args, model, variables, image_size: int):
    """--quant int8 for serve.py: calibrate W8A8 activation scales before
    traffic (ops/quant.py). Best with --quant_calib_image (a representative
    input); falls back to a smooth synthetic proxy (blocky low-frequency
    field — the probe only sets activation ranges, not content)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusionremotesensing_tpu.ops.quant import quantize_for_sampling
    from diffusionremotesensing_tpu.schedules import make_schedule

    sched = make_schedule(args.noise_schedule, args.noise_steps)
    key = jax.random.PRNGKey(33)
    cond_mask = None
    if args.task == "generation":
        n = max(2, min(4, getattr(args, "num_classes", 2)))
        cond = jnp.arange(n, dtype=jnp.int32) % (model.num_classes or 1)
        # half conditioned / half unconditional: the serving sampler's
        # batched CFG runs a mask=0 half (zeroed label embedding) every
        # step, so calibration must see BOTH guidance regimes or the
        # unconditional half clips on uncalibrated scales
        cond_mask = (jnp.arange(n) < (n + 1) // 2).astype(jnp.float32)
        x0 = jnp.full((n, image_size, image_size, model.image_channels), 0.5,
                      jnp.float32)
    else:
        cs = image_size // (model.magnification_factor or 1) \
            if args.task == "superres" else image_size
        calib = getattr(args, "quant_calib_image", None)
        if calib:
            from PIL import Image

            img = Image.open(calib).convert("RGB").resize((cs, cs), Image.BICUBIC)
            cond = jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]
            if cond.shape[-1] != model.cond_channels:
                cond = cond[..., : model.cond_channels]
        else:
            small = jax.random.uniform(key, (1, 8, 8, model.cond_channels))
            cond = jax.image.resize(small, (1, cs, cs, model.cond_channels),
                                    "bicubic")
        if args.task == "superres":
            x0 = jax.image.resize(
                cond, (1, image_size, image_size, cond.shape[-1]), "bicubic"
            )[..., : model.image_channels]
        else:
            x0 = jnp.full((1, image_size, image_size, model.image_channels),
                          0.5, jnp.float32)
    vq = quantize_for_sampling(
        model, variables, sched.alpha_hat, x0, cond,
        jax.random.fold_in(key, 1), cond_mask=cond_mask, train=False,
    )
    n_sites = len(jax.tree_util.tree_leaves(vq["quant"]))
    print(f"int8 quantized serving: {n_sites} conv-site scales attached "
          f"(a site engages when its execution branch runs)")
    return vq


def launch_serving(args) -> None:
    """serve.py launch: build the server and block on the HTTP loop."""
    server = build_server(args)
    server.serve(host=args.host, port=args.port)
