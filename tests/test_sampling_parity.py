"""Full reverse-chain parity: our jitted lax.scan sampler vs a torch
re-implementation of the reference's sampling loop
(/root/reference/train_diffusion_superres.py:207-255), with identical
weights (imported) and the IDENTICAL noise sequence (extracted from the
deterministic jax RNG stream and fed to the torch loop).

This validates end-to-end: schedule construction and indexing, the step
formula, the t = T-1..1 ordering, and the zero-noise final step.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

if os.path.isdir(REF):
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from diffusionremotesensing_tpu.diffusion import DiffusionProcess  # noqa: E402
from diffusionremotesensing_tpu.io import import_torch_state_dict  # noqa: E402
from diffusionremotesensing_tpu.models.unet import (  # noqa: E402
    residual_attention_unet_superres,
)
from diffusionremotesensing_tpu.schedules import make_schedule  # noqa: E402


def _extract_noise_sequence(key, T, shape):
    """Replay the sampler's RNG schedule: per step, key is split once and the
    noise subkey draws N(0, I) of x's shape (diffusion.make_sampler.step)."""
    zs = []
    for _ in range(T - 1):
        key, k_noise = jax.random.split(key)
        zs.append(np.asarray(jax.random.normal(k_noise, shape)))
    return zs


@pytest.mark.parametrize("schedule_name", ["linear", "cosine"])
def test_full_chain_matches_torch_loop(schedule_name):
    from UNet_model_superres import Residual_Attention_UNet_superres

    T = 12
    n, hr, lr_s, mag = 1, 16, 8, 2

    tm = Residual_Attention_UNet_superres(device="cpu")
    tm.eval()
    variables = import_torch_state_dict(tm.state_dict())

    fm = residual_attention_unet_superres(magnification_factor=mag)

    def apply_fn(v, x, t, cond, mask, cond_features=None):
        return fm.apply(v, x, t, cond, mask, train=False, cond_features=cond_features)

    def encode_cond_fn(v, cond):
        return fm.apply(v, cond, method="encode_cond")

    proc = DiffusionProcess(
        schedule_name, apply_fn, noise_steps=T, image_size=hr, image_channels=3,
        encode_cond_fn=encode_cond_fn,
    )

    rng = np.random.default_rng(0)
    x_T = rng.standard_normal((n, hr, hr, 3)).astype(np.float32)
    lr_img = rng.random((n, lr_s, lr_s, 3)).astype(np.float32)

    key = jax.random.PRNGKey(7)
    ours = np.asarray(proc.sampler()(variables, key, jnp.asarray(x_T), jnp.asarray(lr_img)))

    # torch loop with the reference's exact update rule, same weights, same z's
    zs = _extract_noise_sequence(key, T, x_T.shape)
    sched = make_schedule(schedule_name, T)
    alpha = np.asarray(sched.alpha, np.float64)
    alpha_hat = np.asarray(sched.alpha_hat, np.float64)
    beta = np.asarray(sched.beta, np.float64)

    x = torch.from_numpy(x_T.transpose(0, 3, 1, 2)).clone()
    lr_t = torch.from_numpy(lr_img.transpose(0, 3, 1, 2))
    with torch.no_grad():
        for step, i in enumerate(range(T - 1, 0, -1)):
            t = torch.full((n,), i, dtype=torch.long)
            eps = tm(x, t, lr_t, mag)
            z = torch.from_numpy(zs[step].transpose(0, 3, 1, 2)) if i > 1 else torch.zeros_like(x)
            a, ah, b = alpha[i], alpha_hat[i], beta[i]
            x = 1 / np.sqrt(a) * (x - ((1 - a) / np.sqrt(1 - ah)) * eps) + np.sqrt(b) * z
    ref = x.numpy().transpose(0, 2, 3, 1)

    # float32 divergence compounds over the chain; a freshly-initialized net
    # amplifies via untrained BN stats — assert tight agreement
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)
    assert np.abs(ours - ref).mean() < 1e-3
