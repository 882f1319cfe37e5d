"""Training losses: MSE / MAE / Huber / MSE+VGG-perceptual.

Mirrors the reference's selection (train_diffusion_superres.py:346-357):
'MSE' | 'MAE' | 'Huber' | 'MSE+Perceptual_noise', where the last is
0.3 * MSE + 0.7 * VGG19-feature MSE on the *predicted vs true noise images*
(reference VGGPerceptualLoss + CombinedLoss, train_diffusion_superres.py:25-76).

The VGG19 feature extractor is implemented natively in flax (NHWC). Pretrained
torchvision weights cannot be downloaded in this environment; pass a locally
available ``vgg19.pth``/state_dict via ``load_vgg19_params`` when one exists —
otherwise the perceptual term falls back to fixed randomly-initialized
features (a random-projection perceptual loss), clearly reported.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffusionremotesensing_tpu.ops.resize import resize_bicubic

__all__ = ["make_loss_fn", "VGG19Features", "vgg_perceptual_loss_fn", "load_vgg19_params"]


def _reduce(per_elem, weights):
    """Plain mean, or a per-sample weighted mean when ``weights`` (B,) is
    given. Used to exclude the wrap-padded rows a DataLoader with
    ``pad_to_multiple`` appends to the final partial batch (pad_mask is 1 for
    real rows, 0 for pads), so that batch's loss/grads match the unpadded
    equivalent instead of over-weighting the repeated samples."""
    if weights is None:
        return jnp.mean(per_elem)
    per_sample = jnp.mean(per_elem.reshape(per_elem.shape[0], -1), axis=1)
    return jnp.sum(per_sample * weights) / jnp.sum(weights)


def mse(pred, target, weights=None):
    return _reduce((pred - target) ** 2, weights)


def mae(pred, target, weights=None):
    return _reduce(jnp.abs(pred - target), weights)


def huber(pred, target, delta: float = 1.0, weights=None):
    """torch nn.HuberLoss(delta=1.0) semantics."""
    err = pred - target
    abs_err = jnp.abs(err)
    quad = 0.5 * err**2
    lin = delta * (abs_err - 0.5 * delta)
    return _reduce(jnp.where(abs_err <= delta, quad, lin), weights)


# torchvision vgg19.features layer plan: channel width per conv block
_VGG19_PLAN = [
    (64, 2),  # conv1_1, conv1_2 + pool
    (128, 2),
    (256, 4),
    (512, 4),
    (512, 4),
]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG19Features(nn.Module):
    """VGG19 convolutional feature extractor (the torchvision ``.features``
    stack: 16 convs + ReLU + 5 maxpools), NHWC."""

    @nn.compact
    def __call__(self, x):
        for b, (width, n_convs) in enumerate(_VGG19_PLAN):
            for c in range(n_convs):
                x = nn.Conv(
                    width,
                    (3, 3),
                    padding=((1, 1), (1, 1)),
                    name=f"conv{b + 1}_{c + 1}",
                )(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


def load_vgg19_params(state_dict) -> dict:
    """Convert a torchvision ``vgg19.features`` state_dict to flax params.

    Keys look like 'features.0.weight' / '0.weight' with conv indices
    0,2, 5,7, 10,12,14,16, 19,21,23,25, 28,30,32,34.
    """
    torch_idx = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
    names = [f"conv{b + 1}_{c + 1}" for b, (_, n) in enumerate(_VGG19_PLAN) for c in range(n)]
    params = {}
    for idx, name in zip(torch_idx, names):
        for prefix in (f"features.{idx}", str(idx)):
            wk, bk = f"{prefix}.weight", f"{prefix}.bias"
            if wk in state_dict:
                w = np.asarray(state_dict[wk])
                b = np.asarray(state_dict[bk])
                params[name] = {
                    "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                    "bias": jnp.asarray(b),
                }
                break
        else:
            raise KeyError(f"VGG19 conv index {idx} not found in state_dict")
    return {"params": params}


def vgg_perceptual_loss_fn(vgg_variables=None, seed: int = 0) -> Callable:
    """Build the VGG19 perceptual MSE on 224px ImageNet-normalized inputs.

    Matches reference VGGPerceptualLoss.forward: bicubic-resize both inputs to
    224 (align_corners=False), normalize with ImageNet stats, mean squared
    difference of the final conv-stack features.
    """
    model = VGG19Features()
    if vgg_variables is None:
        vgg_variables = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3), jnp.float32)
        )
    mean = jnp.asarray(_IMAGENET_MEAN)
    std = jnp.asarray(_IMAGENET_STD)

    def preprocess(img):
        # reference quirk preserved: the resize is gated on WIDTH only
        # (train_diffusion_superres.py:48: image.shape[-1] != 224 in NCHW —
        # here shape[-2], the NHWC width axis); a non-square W==224 input
        # skips the resize in both implementations
        if img.shape[-2] != 224:
            img = resize_bicubic(img, 224, 224)
        return (img - mean) / std

    def loss(pred, target, weights=None):
        fp = model.apply(vgg_variables, preprocess(pred))
        ft = model.apply(vgg_variables, preprocess(target))
        return _reduce((fp - ft) ** 2, weights)

    return loss


def make_loss_fn(name: str, vgg_variables=None) -> Callable:
    """Resolve a loss by its reference CLI name."""
    if name == "MSE":
        return mse
    if name == "MAE":
        return mae
    if name == "Huber":
        return huber
    if name == "MSE+Perceptual_noise":
        vgg = vgg_perceptual_loss_fn(vgg_variables)

        def combined(pred, target, weights=None):
            # CombinedLoss(weight_first=0.3): 0.3*MSE + 0.7*perceptual
            return 0.3 * mse(pred, target, weights) + 0.7 * vgg(pred, target, weights)

        return combined
    raise ValueError("The Loss must be either MSE or MAE or Huber or MSE+Perceptual_noise")
