"""Golden forward-pass parity: reference torch models vs our flax UNet with
imported weights. This validates every layer mapping (conv taps, strided-conv
padding, ConvTranspose flip, BatchNorm, time/label embeddings) and the
torch-bicubic condition upsample in one shot.

Skipped when the reference checkout is not mounted.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

if os.path.isdir(REF):
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "generate_new_imgs"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from diffusionremotesensing_tpu.io import import_torch_state_dict  # noqa: E402
from diffusionremotesensing_tpu.models.unet import (  # noqa: E402
    residual_attention_unet_generation,
    residual_attention_unet_sar_to_ndvi,
    residual_attention_unet_superres,
)


def _nhwc(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_superres_forward_parity(rng):
    from UNet_model_superres import Residual_Attention_UNet_superres

    tm = Residual_Attention_UNet_superres(device="cpu")
    tm.eval()
    variables = import_torch_state_dict(tm.state_dict())

    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    lr = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    t = np.array([7, 123], np.int64)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(lr), 2)

    fm = residual_attention_unet_superres(magnification_factor=2)
    got = fm.apply(
        variables,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
        jnp.asarray(lr.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-3, atol=1e-4)

    # the s2d fast-inference path (the production default on inference CLIs)
    # must hold the same parity against the imported torch checkpoint
    fm_s2d = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    got_s2d = fm_s2d.apply(
        variables,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
        jnp.asarray(lr.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got_s2d), _nhwc(ref), rtol=1e-3, atol=1e-4)


def test_sar_forward_parity(rng):
    from UNet_model_SAR_TO_NDVI import Residual_Attention_UNet_SAR_TO_NDVI

    tm = Residual_Attention_UNet_SAR_TO_NDVI(device="cpu")
    tm.eval()
    variables = import_torch_state_dict(tm.state_dict())

    ndvi = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    sar = rng.standard_normal((2, 2, 32, 32)).astype(np.float32)
    t = np.array([1, 199], np.int64)

    with torch.no_grad():
        ref = tm(torch.from_numpy(ndvi), torch.from_numpy(t), torch.from_numpy(sar))

    fm = residual_attention_unet_sar_to_ndvi()
    got = fm.apply(
        variables,
        jnp.asarray(ndvi.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
        jnp.asarray(sar.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("with_label", [True, False])
def test_generation_forward_parity(rng, with_label):
    from UNet_model_generation import Residual_Attention_UNet_generation

    tm = Residual_Attention_UNet_generation(num_classes=10, device="cpu")
    tm.eval()
    variables = import_torch_state_dict(tm.state_dict())

    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    t = np.array([50, 80], np.int64)
    y = np.array([3, 9], np.int64) if with_label else None

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x),
            torch.from_numpy(t),
            torch.from_numpy(y) if y is not None else None,
        )

    fm = residual_attention_unet_generation(num_classes=10)
    got = fm.apply(
        variables,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
        jnp.asarray(y) if y is not None else None,
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("variant", ["superres", "sar", "class"])
def test_export_roundtrip_loads_strict_into_torch(rng, variant):
    """flax -> torch export must load with strict=True into the reference
    model class and produce the same forward as the flax stack."""
    from diffusionremotesensing_tpu.io import export_torch_state_dict
    from diffusionremotesensing_tpu.models.unet import init_unet_params

    if variant == "superres":
        from UNet_model_superres import Residual_Attention_UNet_superres as TM

        fm = residual_attention_unet_superres(magnification_factor=2)
        tm = TM(device="cpu")
    elif variant == "sar":
        from UNet_model_SAR_TO_NDVI import Residual_Attention_UNet_SAR_TO_NDVI as TM

        fm = residual_attention_unet_sar_to_ndvi()
        tm = TM(device="cpu")
    else:
        from UNet_model_generation import Residual_Attention_UNet_generation as TM

        fm = residual_attention_unet_generation(num_classes=10)
        tm = TM(num_classes=10, device="cpu")

    variables = init_unet_params(fm, jax.random.PRNGKey(3), image_size=16)
    sd = export_torch_state_dict(variables, conditioning=variant)
    tm.load_state_dict(sd, strict=True)
    tm.eval()

    x_ch = 1 if variant == "sar" else 3
    x = rng.standard_normal((2, x_ch, 16, 16)).astype(np.float32)
    t = np.array([3, 9], np.int64)
    if variant == "superres":
        cond = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cond), 2)
        got = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
                       jnp.asarray(cond.transpose(0, 2, 3, 1)), train=False)
    elif variant == "sar":
        cond = rng.standard_normal((2, 2, 16, 16)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cond))
        got = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
                       jnp.asarray(cond.transpose(0, 2, 3, 1)), train=False)
    else:
        y = np.array([1, 7], np.int64)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(y))
        got = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
                       jnp.asarray(y), train=False)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-3, atol=1e-4)
