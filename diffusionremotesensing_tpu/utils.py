"""Media export, dataset organization, and image metrics.

Mirrors the helper surface of /root/reference/utils.py:257-432 (video_maker,
gif_maker, convert_png_to_jpg, data_organizer_superresolution) plus the
PSNR/SSIM metrics the benchmark harness needs (the reference publishes no
quantitative metrics; these close that gap).

All image tensors here are NHWC/HWC float [0, 1] numpy (or jax) arrays.
"""

from __future__ import annotations

import os
import random
import shutil
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "video_maker",
    "gif_maker",
    "convert_png_to_jpg",
    "data_organizer_superresolution",
    "psnr",
    "ssim",
    "save_image",
    "save_preview_grid",
    "machine_scoped_cache_dir",
    "force_cpu_if_requested",
]


def _frame_to_uint8(frame: np.ndarray) -> np.ndarray:
    """HWC float [0,1] (clamped) -> HWC uint8."""
    arr = np.asarray(frame)
    if arr.ndim == 4:  # (1, H, W, C)
        arr = arr[0]
    arr = np.clip(arr, 0.0, 1.0)
    return (arr * 255.0).astype(np.uint8)


def video_maker(frames: Sequence[np.ndarray], path: str, fps: int = 100) -> None:
    """Write the denoising trajectory as an mp4 with a per-frame
    'Frame i' overlay (reference video_maker, utils.py:384-432)."""
    import cv2

    first = _frame_to_uint8(frames[0])
    h, w = first.shape[:2]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    try:
        for i, frame in enumerate(frames):
            img = _frame_to_uint8(frame)
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
            bgr = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
            cv2.putText(
                bgr, f"Frame {i}", (10, 30), cv2.FONT_HERSHEY_SIMPLEX, 1, (255, 255, 255), 2
            )
            writer.write(bgr)
    finally:
        writer.release()


def gif_maker(frames: Sequence[np.ndarray], path: str, fps: int = 50) -> None:
    """Write frames as an animated GIF (reference gif_maker, utils.py:344-382).

    imageio v3's pillow plugin dropped the ``fps=`` keyword (it warned and
    IGNORED it, silently rendering at the default frame duration), so the
    rate is passed as a per-frame ``duration`` in milliseconds, with
    ``loop=0`` matching the reference GIFs' infinite loop."""
    import imageio

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    imgs = [_frame_to_uint8(f) for f in frames]
    imageio.mimsave(path, imgs, duration=1000.0 / fps, loop=0)


def convert_png_to_jpg(folder_path: str) -> None:
    """In-place convert all .png files in a folder to .jpg
    (reference convert_png_to_jpg, utils.py:331-342)."""
    from PIL import Image

    for name in os.listdir(folder_path):
        if name.lower().endswith(".png"):
            p = os.path.join(folder_path, name)
            img = Image.open(p).convert("RGB")
            img.save(os.path.splitext(p)[0] + ".jpg")
            os.remove(p)


def data_organizer_superresolution(
    main_folder: str,
    split_ratio: Tuple[float, float, float] = (0.8, 0.15, 0.05),
    seed: Optional[int] = None,
) -> None:
    """Recursively collect files under ``main_folder``, shuffle, and move them
    into train_original/val_original/test_original subfolders by ratio
    (reference data_organizer_superresolution, utils.py:257-329)."""
    assert abs(sum(split_ratio) - 1.0) < 1e-6
    files: List[str] = []
    split_dirs = {"train_original", "val_original", "test_original"}
    for root, dirs, names in os.walk(main_folder):
        dirs[:] = [d for d in dirs if d not in split_dirs]
        files.extend(os.path.join(root, n) for n in names)
    rng = random.Random(seed)
    rng.shuffle(files)
    n = len(files)
    n_train = int(n * split_ratio[0])
    n_val = int(n * split_ratio[1])
    buckets = {
        "train_original": files[:n_train],
        "val_original": files[n_train : n_train + n_val],
        "test_original": files[n_train + n_val :],
    }
    for sub, paths in buckets.items():
        dst_dir = os.path.join(main_folder, sub)
        os.makedirs(dst_dir, exist_ok=True)
        for p in paths:
            shutil.move(p, os.path.join(dst_dir, os.path.basename(p)))


# ----------------------------------------------------------------- metrics


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Peak signal-to-noise ratio in dB."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Mean structural similarity (Wang et al.), 7x7 uniform window per
    channel — standard constants C1=(0.01 R)^2, C2=(0.03 R)^2."""
    from scipy.ndimage import uniform_filter

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        mx = uniform_filter(x, 7)
        my = uniform_filter(y, 7)
        mxx = uniform_filter(x * x, 7)
        myy = uniform_filter(y * y, 7)
        mxy = uniform_filter(x * y, 7)
        vx = mxx - mx * mx
        vy = myy - my * my
        cxy = mxy - mx * my
        s = ((2 * mx * my + C1) * (2 * cxy + C2)) / ((mx**2 + my**2 + C1) * (vx + vy + C2))
        vals.append(s.mean())
    return float(np.mean(vals))


# ------------------------------------------------------------------- plots


def save_image(img: np.ndarray, path: str) -> None:
    """Save an HWC float [0,1] array as an image file."""
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(_frame_to_uint8(img).squeeze()).save(path)


def save_preview_grid(
    rows: Iterable[Sequence[np.ndarray]],
    titles: Sequence[str],
    path: str,
) -> None:
    """5x3-style matplotlib preview grid (reference train previews,
    train_diffusion_superres.py:416-433). ``rows`` yields per-row image
    tuples matching ``titles``."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = list(rows)
    ncols = len(titles)
    fig, axs = plt.subplots(len(rows), ncols, figsize=(5 * ncols, 5 * len(rows)), squeeze=False)
    for r, imgs in enumerate(rows):
        for c, (img, title) in enumerate(zip(imgs, titles)):
            arr = np.clip(np.asarray(img), 0, 1)
            axs[r, c].imshow(arr.squeeze(), cmap="gray" if arr.shape[-1] == 1 else None)
            axs[r, c].set_title(title)
            axs[r, c].axis("off")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def force_cpu_if_requested() -> bool:
    """Honor ``DRS_FORCE_CPU=1``: the container's sitecustomize pins the
    remote-TPU platform and IGNORES ``JAX_PLATFORMS`` env overrides, so
    CI/smoke runs need the config-level override before any jax backend
    init. One shared implementation for every benchmark/CLI entry point
    (cli._configure_platform layers the compile-cache policy on top).
    Returns True when CPU was forced."""
    if not os.environ.get("DRS_FORCE_CPU"):
        return False
    import jax

    jax.config.update("jax_platforms", "cpu")
    return True


def machine_scoped_cache_dir() -> str:
    """Compilation-cache dir keyed by this machine's CPU signature: a cache
    written on a different host must never be offered to XLA:CPU AOT here
    (round-1 bench hit 'machine features mismatch' deserialization errors)."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            # only frequency-independent lines: model name + ISA feature flags
            info = "".join(l for l in f if l.startswith(("model name", "flags")))
        sig = hashlib.md5(info.encode()).hexdigest()[:10]
    except OSError:
        sig = "nocpuinfo"
    return f"/tmp/jax_cache_{sig}"
