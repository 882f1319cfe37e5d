"""Checkpoint-driven inference helpers: super-resolution and SAR->NDVI.

Mirrors /root/reference/superres_and_NDVIgen.py — including the model_name
string convention ('magnificationN' / 'LRimgsizeN' / 'imgsizeN' substrings
parsed out of the name, :30-31,100), the fixed cosine/1500-step inference
schedule (:27-28,93-94), and the SAR input-range validation (:106-109).

Images here are HWC float [0, 1] numpy/jax arrays (channel-last; the
reference uses CHW torch tensors).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def parse_magnification(model_name: str) -> int:
    return int([p[13:] for p in model_name.split("_") if p.startswith("magnification")][0])


def parse_lr_imgsize(model_name: str) -> int:
    return int([p[9:] for p in model_name.split("_") if p.startswith("LRimgsize")][0])


def parse_imgsize(model_name: str) -> int:
    return int([p[7:] for p in model_name.split("_") if p.startswith("imgsize")][0])


def _load_variables(model_name: str, device=None):
    import jax

    from diffusionremotesensing_tpu.io import load_snapshot

    snapshot_path = os.path.join("models_run", model_name, "weights", "snapshot.pt")
    if not os.path.exists(snapshot_path):
        alt = snapshot_path.replace("snapshot.pt", "snapshot.msgpack")
        if os.path.exists(alt):
            snapshot_path = alt
    state, _ = load_snapshot(snapshot_path)
    variables = {"params": state["params"], "batch_stats": state.get("batch_stats", {})}
    if device is not None:
        variables = jax.device_put(variables, device)
    return variables


def super_resolver(lr_img: np.ndarray, device=None, model_name: str = "", key=None,
                   s2d: bool = True, ddim_steps: Optional[int] = None,
                   ddim_clip_x0: bool = True, start_t: Optional[int] = None):
    """Super-resolve a single LR image (H, W, C) with the named checkpoint.

    model_name must contain 'magnificationN' and 'LRimgsizeN' parts, e.g.
    'Residual_Attention_UNet_superres_magnification2_LRimgsize128_up42_...'.
    Returns the (H*mag, W*mag, C) image clamped to [0, 1].

    ``ddim_steps``/``ddim_clip_x0``: optional framework addition (no
    reference counterpart) selecting the DDIM fast sampler; default None
    keeps the reference's 1499-step ancestral path exactly.

    ``start_t``: truncated warm-start sampling (framework addition) — the
    chain starts from the q-sampled bicubic upsample of ``lr_img`` at this
    timestep instead of pure noise at T-1; unset keeps the reference chain.
    """
    import jax

    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        default_tap44,
        residual_attention_unet_superres,
    )

    magnification_factor = parse_magnification(model_name)
    image_size = parse_lr_imgsize(model_name) * magnification_factor
    lr_img = np.asarray(lr_img, np.float32)
    input_channels = lr_img.shape[-1]
    print(
        f"HR Image size: {image_size}, LR Image size: {image_size // magnification_factor} "
        f"Magnification factor: {magnification_factor}, Channels: {input_channels}"
    )

    model = residual_attention_unet_superres(
        image_channels=input_channels, out_dim=input_channels,
        magnification_factor=magnification_factor,
        # s2d inference execution: same math to fp tolerance
        # (tests/test_s2d_model.py), ~1.6x faster; pass s2d=False for the
        # bit-reference path. tap44: fused-block Pallas kernel on TPU.
        s2d=s2d,
        tap44=default_tap44(device) if s2d else False,
    )
    variables = _load_variables(model_name, device)
    proc = make_process(model, "cosine", 1500, image_size)
    init = None
    if start_t is not None:
        from diffusionremotesensing_tpu.ops.resize import upsample_bicubic

        init = upsample_bicubic(lr_img[None], magnification_factor)[0]
    out = proc.sample(variables, key or jax.random.PRNGKey(0), n=1, cond=lr_img,
                      ddim_steps=ddim_steps, ddim_clip_x0=ddim_clip_x0,
                      start_t=start_t, init=init)
    return np.clip(np.asarray(out)[0], 0.0, 1.0)


def SAR_to_NDVI_generator(SAR_img_path: str, device=None, n_generations: int = 1, key=None,
                          s2d: bool = True, ddim_steps: Optional[int] = None,
                          ddim_clip_x0: bool = True):
    """Generate NDVI image(s) from a SAR tensor file with the shipped
    'Residual_Attention_UNet_EMA_imgsize128_SAR_TO_NDVI' checkpoint.

    ``ddim_steps``/``ddim_clip_x0``: optional DDIM fast path (framework
    addition); default None keeps the reference ancestral sampler."""
    import jax

    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        default_tap44,
        residual_attention_unet_sar_to_ndvi,
    )

    SAR_channels, NDVI_channels = 2, 1
    model_name = "Residual_Attention_UNet_EMA_imgsize128_SAR_TO_NDVI"
    image_size = parse_imgsize(model_name)
    print(f"Image size: {image_size}, SAR channels: {SAR_channels}, NDVI channels: {NDVI_channels}")

    if SAR_img_path.endswith(".npy"):
        sar = np.load(SAR_img_path).astype(np.float32)
    else:
        import torch

        sar = torch.load(SAR_img_path).numpy().astype(np.float32)
    if sar.ndim == 3 and sar.shape[0] == SAR_channels:
        sar = sar.transpose(1, 2, 0)  # CHW -> HWC
    if sar.min() < 0 and sar.min() > -1:
        sar = (sar + 1) / 2
    elif sar.min() < -1 or sar.max() > 1:
        raise ValueError("SAR image values are not in the range [-1, 1]")

    model = residual_attention_unet_sar_to_ndvi(
        sar_channels=SAR_channels, ndvi_channels=NDVI_channels, s2d=s2d,
        tap44=default_tap44(device) if s2d else False,
    )
    variables = _load_variables(model_name, device)
    proc = make_process(model, "cosine", 1500, image_size)
    out = proc.sample(variables, key or jax.random.PRNGKey(0), n=n_generations, cond=sar,
                      ddim_steps=ddim_steps, ddim_clip_x0=ddim_clip_x0)
    return np.asarray(out)


def plot_lr_sr(lr_img, sr_img, histogram: bool = True, save_path: Optional[str] = None):
    """LR vs SR side-by-side (optionally with histograms), reference :53-83."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    title_font = {"family": "sans-serif", "weight": "bold", "size": 15}
    lr = np.asarray(lr_img)
    sr = np.asarray(sr_img)
    if histogram:
        fig, axs = plt.subplots(2, 2, figsize=(15, 10))
        axs = axs.ravel()
        axs[0].imshow(np.clip(lr, 0, 1))
        axs[0].set_title("low resolution image", fontdict=title_font)
        axs[1].imshow(np.clip(sr, 0, 1))
        axs[1].set_title("super resolution image", fontdict=title_font)
        axs[2].hist(lr.flatten(), bins=100)
        axs[2].set_title("lr image histogram", fontdict=title_font)
        axs[3].hist(sr.flatten(), bins=100)
        axs[3].set_title("sr image histogram", fontdict=title_font)
    else:
        fig, axs = plt.subplots(1, 2, figsize=(15, 10))
        axs = axs.ravel()
        axs[0].imshow(np.clip(lr, 0, 1))
        axs[0].set_title("low resolution image", fontdict=title_font)
        axs[1].imshow(np.clip(sr, 0, 1))
        axs[1].set_title("super resolution image", fontdict=title_font)
    if save_path is not None:
        plt.savefig(save_path, dpi=300, bbox_inches="tight", pad_inches=0)
    plt.close(fig)


def plot_SAR_NDVI(SAR_img, NDVI_img, NDVI_pred_img, save_path: Optional[str] = None):
    """SAR / NDVI-GT / NDVI-predictions row plot, reference :121-160."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    preds = np.asarray(NDVI_pred_img)
    n = preds.shape[0]
    fig, axs = plt.subplots(1, 2 + n, figsize=(5 * (2 + n), 10))
    title_font = {"family": "sans-serif", "weight": "bold", "size": 8}
    axs = np.atleast_1d(axs).ravel()
    axs[0].imshow(np.asarray(SAR_img)[..., 0], cmap="gray")
    axs[0].set_title("SAR image", fontdict=title_font)
    axs[1].imshow(np.asarray(NDVI_img).squeeze(), cmap="RdYlGn")
    axs[1].set_title("NDVI ground truth", fontdict=title_font)
    for i in range(n):
        axs[2 + i].imshow(preds[i].squeeze(), cmap="RdYlGn")
        axs[2 + i].set_title(f"NDVI prediction {i}", fontdict=title_font)
    if save_path is not None:
        plt.savefig(save_path, dpi=300, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
