"""Datasets for the three tasks, emitting NHWC float32 dict-items.

Mirrors /root/reference/utils.py:40-255 and the generation launcher's
ImageFolder path (generate_new_imgs/train_diffusion_generation.py:566-586).
Items are dicts so the training engine is task-agnostic:

* superres:   {'x': hr (H,W,C), 'cond': lr (H/mag, W/mag, C)}
* SAR->NDVI:  {'x': ndvi (H,W,1), 'cond': sar (H,W,2)}
* generation: {'x': img (H,W,C), 'cond': int label}

All image data is float32 in [0, 1] (ToTensor semantics), channel-last.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
from PIL import Image, ImageFilter

from diffusionremotesensing_tpu.data.degradations import (
    _Rng,
    _gaussian_noise,
    degradation_bsrgan_plus,
    imread_uint,
    single2uint,
    soft_degradation_bsrgan,
    uint2single,
)

_IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp"}


class DecodedCache:
    """Bounded in-RAM cache of decoded (post-resize) uint8 images.

    Training re-decodes every image every epoch; on a few-core host the
    decode is the data-pipeline bottleneck (~1.3 ms/item measured,
    benchmarks/NOTES.md) even with --device_degradation. Decoded images are
    immutable and identical across epochs, so caching is bit-exact.
    Thread-safe insert-up-to-budget (the DataLoader fetches on a thread
    pool); no eviction — one epoch touches the same fixed set, so items
    past the byte budget simply stay uncached."""

    def __init__(self, max_mb: float):
        import threading

        self.max_bytes = int(max_mb * 1e6)
        self._bytes = 0
        self._d: dict = {}
        self._lock = threading.Lock()

    def get(self, key):
        return self._d.get(key)

    def put(self, key, arr: np.ndarray) -> None:
        with self._lock:
            if key in self._d or self._bytes + arr.nbytes > self.max_bytes:
                return
            self._d[key] = arr
            self._bytes += arr.nbytes


def _to_float_hwc(img: Image.Image) -> np.ndarray:
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def _load_any(path: str, data_format: str) -> Image.Image:
    """Load an image in the reference's three accepted formats as PIL."""
    if data_format == "PIL":
        return Image.open(path)
    if data_format == "numpy":
        y = np.load(path)
        return Image.fromarray((y * 255).astype(np.uint8))
    if data_format == "torch":
        import torch

        t = torch.load(path)  # CHW float
        arr = (t.numpy().transpose(1, 2, 0) * 255).astype(np.uint8)
        return Image.fromarray(arr.squeeze())
    raise ValueError(f"unknown data_format {data_format!r}")


def _decode_rgb(path: str, data_format: str, image_size=None):
    """Shared decode prologue: load, normalize mode, optional reference
    bilinear resize to image_size (utils.py:141-148). Both the host DownBlur
    dataset and DecodeOnlyDataset go through this, so the device-degradation
    parity cannot drift."""
    y = _load_any(path, data_format)
    y = y.convert("RGB") if y.mode not in ("RGB", "L") else y
    if image_size is not None and y.size != (image_size, image_size):
        y = y.resize((image_size, image_size), Image.BILINEAR)
    return y


class SuperresDownBlurDataset:
    """HR image -> (bicubic downsample / mag, Gaussian blur[, noise]) LR pair.

    Parity with get_data_superres (/root/reference/utils.py:93-166): PIL
    bilinear Resize to image_size, PIL bicubic downsample by the
    magnification factor, PIL GaussianBlur. ``blur_radius='random'`` draws
    from triangular(0.5, 1.5, mode=1) ONCE and freezes it for the whole
    dataset — the reference overwrites its attribute on first access
    (utils.py:151-152); we reproduce that (documented) behavior eagerly.
    """

    def __init__(
        self,
        root_dir: str,
        magnification_factor: int,
        blur_radius=0.5,
        gauss_noise: bool = False,
        data_format: str = "PIL",
        image_size: Optional[int] = None,
        seed: int = 0,
        cache_mb: float = 0.0,
        cache: Optional["DecodedCache"] = None,
    ):
        self.root_dir = root_dir
        self.magnification_factor = magnification_factor
        self.gauss_noise = gauss_noise
        self.data_format = data_format
        self.image_size = image_size
        self.filenames = sorted(os.listdir(root_dir))
        self._rng = _Rng(seed)
        # a shared DecodedCache keeps the byte budget global across the
        # train/val datasets (keys include root_dir/size/format so two
        # datasets over the same directory with different resize settings
        # can't serve each other's entries)
        self._cache = cache if cache is not None else (
            DecodedCache(cache_mb) if cache_mb > 0 else None
        )
        if blur_radius == "random":
            blur_radius = self._rng.py.triangular(0.5, 1.5, 1)
        self.blur_radius = float(blur_radius)

    def __len__(self) -> int:
        return len(self.filenames)

    def _decoded(self, idx: int) -> Image.Image:
        """Decoded + reference-resized HR image, via the bit-exact uint8
        cache when enabled (decode is the per-item cost the degradation
        doesn't dominate; see DecodedCache)."""
        key = (self.root_dir, idx, self.image_size, self.data_format)
        if self._cache is not None:
            arr = self._cache.get(key)
            if arr is not None:
                return Image.fromarray(arr.squeeze())
        y = _decode_rgb(
            os.path.join(self.root_dir, self.filenames[idx]), self.data_format, self.image_size
        )
        if self._cache is not None:
            arr = np.asarray(y, np.uint8)
            self._cache.put(key, arr if arr.ndim == 3 else arr[:, :, None])
        return y

    def __getitem__(self, idx: int):
        y = self._decoded(idx)
        mag = self.magnification_factor
        x = y.resize((y.size[0] // mag, y.size[1] // mag), Image.BICUBIC)
        x = x.filter(ImageFilter.GaussianBlur(self.blur_radius))
        x_arr = _to_float_hwc(x)
        if self.gauss_noise:
            # 3-mode noise (color/gray/channel-correlated), utils.py:15-38 —
            # the DownBlurNoise variant uses levels in [2, 10]
            x_arr = _gaussian_noise(self._rng, x_arr, 2, 10).astype(np.float32)
        return {"x": _to_float_hwc(y), "cond": x_arr}


class DecodeOnlyDataset:
    """Host side of the on-device DownBlur path: decode (and, when a source
    image is not already image_size, the reference's PIL bilinear resize —
    ~0.02 ms vs the ~2.2 ms of blur/bicubic/float work this mode moves onto
    the accelerator). Yields {'hr_u8': (S, S, C) uint8}; pair with
    data.device_degradation.make_downblur_transform."""

    def __init__(self, root_dir: str, image_size: int, data_format: str = "PIL",
                 cache_mb: float = 0.0, cache: Optional["DecodedCache"] = None):
        self.root_dir = root_dir
        self.image_size = image_size
        self.data_format = data_format
        self.filenames = sorted(os.listdir(root_dir))
        self._cache = cache if cache is not None else (
            DecodedCache(cache_mb) if cache_mb > 0 else None
        )

    def __len__(self) -> int:
        return len(self.filenames)

    def __getitem__(self, idx: int):
        key = (self.root_dir, idx, self.image_size, self.data_format)
        if self._cache is not None:
            arr = self._cache.get(key)
            if arr is not None:
                return {"hr_u8": arr}
        y = _decode_rgb(
            os.path.join(self.root_dir, self.filenames[idx]), self.data_format, self.image_size
        )
        arr = np.asarray(y, np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        if self._cache is not None:
            self._cache.put(key, arr)
        return {"hr_u8": arr}


class SuperresBSRGANDataset:
    """Eagerly degrades every file x num_crops with the BSRGAN(+) pipeline and
    holds all (lr, hr) pairs in RAM, shuffled — matching the reference's eager
    ctor (utils.py:168-255). Optionally dumps PNG pairs to ``destination_folder``."""

    def __init__(
        self,
        root_dir: str,
        magnification_factor: int,
        model_input_size: int,
        num_crops: int = 1,
        degradation_type: str = "BSR_plus",
        destination_folder: Optional[str] = None,
        seed: int = 0,
        num_workers: int = 0,
    ):
        if degradation_type == "BSR_plus":
            pipeline = degradation_bsrgan_plus
        elif degradation_type == "soft_BSR_plus":
            pipeline = soft_degradation_bsrgan
        else:
            raise ValueError("degradation_type must be 'BSR_plus' or 'soft_BSR_plus'")
        filenames = sorted(os.listdir(root_dir))
        # decode each source image ONCE (the reference re-reads per crop,
        # utils.py:204-206); the pipelines copy their input before mutating
        decoded = {
            name: uint2single(imread_uint(os.path.join(root_dir, name), 3))
            for name in filenames
        }
        jobs = [
            (name, seed + 7919 * (j * num_crops + c + 1))
            for j, name in enumerate(filenames)
            for c in range(num_crops)
        ]

        def degrade(job):
            name, job_seed = job
            lq, hq = pipeline(
                decoded[name], sf=magnification_factor,
                lq_patchsize=model_input_size, rng=job_seed,
            )
            # uint8 quantize round-trip, like the reference's
            # single2uint -> ToTensor (utils.py:213-218)
            return uint2single(single2uint(lq)), uint2single(single2uint(hq))

        if num_workers > 0:
            # the eager whole-dataset degradation (reference behavior) is the
            # startup bottleneck; cv2/scipy release the GIL so threads scale
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                pairs = list(pool.map(degrade, jobs))
        else:
            pairs = [degrade(j) for j in jobs]

        rng = _Rng(seed)
        order = rng.sample(range(len(pairs)), len(pairs))
        self.lr_images = [pairs[i][0] for i in order]
        self.hr_images = [pairs[i][1] for i in order]
        if destination_folder is not None:
            self._save(destination_folder)

    def _save(self, folder: str) -> None:
        os.makedirs(os.path.join(folder, "lr"), exist_ok=True)
        os.makedirs(os.path.join(folder, "hr"), exist_ok=True)
        for i, (lq, hq) in enumerate(zip(self.lr_images, self.hr_images)):
            Image.fromarray(single2uint(lq)).save(os.path.join(folder, "lr", f"x_{i}.png"))
            Image.fromarray(single2uint(hq)).save(os.path.join(folder, "hr", f"y_{i}.png"))

    def __len__(self) -> int:
        return len(self.lr_images)

    def __getitem__(self, idx: int):
        return {"x": self.hr_images[idx], "cond": self.lr_images[idx]}


class SarToNdviDataset:
    """Paired <root>/{sar,opt}/<same-filename> items; inputs in [-1, 1] are
    rescaled to [0, 1] (utils.py:87-89). Supports .pt / .npy / image files."""

    def __init__(self, root_dir: str, data_format: str = "torch"):
        self.sar_path = os.path.join(root_dir, "sar")
        self.opt_path = os.path.join(root_dir, "opt")
        self.filenames = sorted(os.listdir(self.sar_path))
        self.data_format = data_format

    def __len__(self) -> int:
        return len(self.filenames)

    def _load(self, path: str) -> np.ndarray:
        # the file extension wins over the declared data_format (the
        # reference supports .pt/.npy/image per its data_format flag)
        ext = os.path.splitext(path)[1].lower()
        if ext in (".pt", ".pth") or (ext == "" and self.data_format == "torch"):
            import torch

            t = torch.load(path)
            arr = t.numpy()
            return arr.transpose(1, 2, 0) if arr.ndim == 3 else arr[:, :, None]
        if ext == ".npy" or self.data_format == "numpy":
            arr = np.load(path).astype(np.float32)
            if arr.ndim == 2:  # single-channel 2-D arrays, same as the .pt branch
                return arr[:, :, None]
            return arr.transpose(1, 2, 0) if arr.ndim == 3 and arr.shape[0] <= 4 else arr
        img = Image.open(path)
        return _to_float_hwc(img) * 2.0 - 1.0  # PIL path: map to [-1,1] first

    def __getitem__(self, idx: int):
        sar = self._load(os.path.join(self.sar_path, self.filenames[idx]))
        ndvi = self._load(os.path.join(self.opt_path, self.filenames[idx]))
        sar = (np.asarray(sar, np.float32) + 1.0) / 2.0
        ndvi = (np.asarray(ndvi, np.float32) + 1.0) / 2.0
        return {"x": ndvi, "cond": sar}


class ImageFolderDataset:
    """Class-per-subfolder image dataset (torchvision.datasets.ImageFolder
    semantics: classes sorted alphabetically, labels = class index)."""

    def __init__(self, root_dir: str, image_size: Optional[int] = None):
        self.root_dir = root_dir
        self.classes = sorted(
            d for d in os.listdir(root_dir) if os.path.isdir(os.path.join(root_dir, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples: list[Tuple[str, int]] = []
        for c in self.classes:
            cdir = os.path.join(root_dir, c)
            for f in sorted(os.listdir(cdir)):
                if os.path.splitext(f)[1].lower() in _IMG_EXTS:
                    self.samples.append((os.path.join(cdir, f), self.class_to_idx[c]))
        self.image_size = image_size

    @property
    def num_classes(self) -> int:
        return len(self.classes)

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int):
        path, label = self.samples[idx]
        img = Image.open(path).convert("RGB")
        if self.image_size is not None:
            img = img.resize((self.image_size, self.image_size), Image.BILINEAR)
        return {"x": _to_float_hwc(img), "cond": np.int32(label)}
