"""Diffusion math: q-sample/step algebra against closed forms, sampler smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionremotesensing_tpu.diffusion import (
    DiffusionProcess,
    ddpm_step,
    make_sampler,
    q_sample,
    sample_timesteps,
)
from diffusionremotesensing_tpu.models.unet import (
    init_unet_params,
    residual_attention_unet_generation,
)
from diffusionremotesensing_tpu.schedules import make_schedule


def test_q_sample_closed_form():
    sched = make_schedule("linear", 100)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 8, 2))
    t = jnp.array([1, 50, 99])
    x_t, eps = q_sample(sched, x0, t, jax.random.PRNGKey(1))
    ah = np.asarray(sched.alpha_hat)[np.asarray(t)]
    expected = (
        np.sqrt(ah)[:, None, None, None] * np.asarray(x0)
        + np.sqrt(1 - ah)[:, None, None, None] * np.asarray(eps)
    )
    np.testing.assert_allclose(np.asarray(x_t), expected, rtol=1e-5, atol=1e-6)


def test_q_sample_noise_is_standard_normal():
    sched = make_schedule("cosine", 100)
    x0 = jnp.zeros((64, 8, 8, 3))
    _, eps = q_sample(sched, x0, jnp.ones((64,), jnp.int32), jax.random.PRNGKey(2))
    e = np.asarray(eps)
    assert abs(e.mean()) < 0.05
    assert abs(e.std() - 1.0) < 0.05


def test_sample_timesteps_range():
    t = sample_timesteps(jax.random.PRNGKey(0), 10_000, 200)
    t = np.asarray(t)
    assert t.min() >= 1 and t.max() <= 199
    # both endpoints of [1, 199] should be hit over 10k draws
    assert (t == 1).any() and (t == 199).any()


def test_ddpm_step_closed_form():
    sched = make_schedule("linear", 50)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 1))
    eps_hat = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    z = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    i = 7
    out = ddpm_step(sched, x, eps_hat, jnp.asarray(i), z)
    a = float(sched.alpha[i])
    ah = float(sched.alpha_hat[i])
    b = float(sched.beta[i])
    expected = (
        1 / np.sqrt(a) * (np.asarray(x) - (1 - a) / np.sqrt(1 - ah) * np.asarray(eps_hat))
        + np.sqrt(b) * np.asarray(z)
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-6)


def test_sampler_perfect_model_recovers_x0_scale():
    """With a model that predicts the true noise of a known x0, the sampler
    must walk back close to x0 (classic DDPM sanity check on tiny T)."""
    sched = make_schedule("linear", 20)
    x0 = 0.5 * jnp.ones((1, 4, 4, 1))

    def apply_fn(variables, x, t, cond, mask):
        # Oracle epsilon: eps = (x - sqrt(ah) x0) / sqrt(1-ah)
        ah = sched.alpha_hat[t.astype(jnp.int32)][:, None, None, None]
        return (x - jnp.sqrt(ah) * x0) / jnp.sqrt(1 - ah)

    sampler = make_sampler(apply_fn, sched)
    key = jax.random.PRNGKey(0)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 1))
    out = sampler(None, key, x_T)
    assert np.abs(np.asarray(out) - 0.5).mean() < 0.25


def test_sampler_runs_with_unet_and_cfg():
    m = residual_attention_unet_generation(num_classes=4)
    v = init_unet_params(m, jax.random.PRNGKey(0), image_size=16)

    def apply_fn(variables, x, t, cond, mask):
        return m.apply(variables, x, t, cond, mask, train=False)

    proc = DiffusionProcess(
        "cosine", apply_fn, noise_steps=6, image_size=16, image_channels=3
    )
    out = proc.sample(v, jax.random.PRNGKey(1), n=2, cond=jnp.array([0, 3]), cfg_scale=3.0)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_sampler_frames_capture():
    sched = make_schedule("linear", 5)

    def apply_fn(variables, x, t, cond, mask):
        return jnp.zeros_like(x)

    sampler = make_sampler(apply_fn, sched, capture_frames=True)
    x_T = jnp.ones((2, 4, 4, 1))
    out, frames = sampler(None, jax.random.PRNGKey(0), x_T)
    assert frames.shape == (4, 2, 4, 4, 1)  # T-1 frames
    np.testing.assert_allclose(np.asarray(frames[-1]), np.asarray(out))


def test_cfg_matches_two_call_lerp():
    """The batched single-call CFG must equal the reference's two-call lerp."""
    m = residual_attention_unet_generation(num_classes=4)
    v = init_unet_params(m, jax.random.PRNGKey(0), image_size=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.array([3, 3])
    y = jnp.array([1, 2])
    cfg = 3.0
    eps_c = m.apply(v, x, t, y, train=False)
    eps_u = m.apply(v, x, t, None, train=False)
    expected = np.asarray(eps_u) + cfg * (np.asarray(eps_c) - np.asarray(eps_u))

    x2 = jnp.concatenate([x, x])
    t2 = jnp.concatenate([t, t])
    y2 = jnp.concatenate([y, y])
    mask = jnp.array([1.0, 1.0, 0.0, 0.0])
    eps2 = m.apply(v, x2, t2, y2, mask, train=False)
    got = np.asarray(eps2[2:]) + cfg * (np.asarray(eps2[:2]) - np.asarray(eps2[2:]))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_hoisted_cond_features_match_inline():
    """encode_cond once + cond_features must equal the inline cond path."""
    from diffusionremotesensing_tpu.models.unet import (
        residual_attention_unet_superres,
    )
    from diffusionremotesensing_tpu.models.unet import init_unet_params

    m = residual_attention_unet_superres(magnification_factor=2)
    v = init_unet_params(m, jax.random.PRNGKey(0), image_size=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.array([3, 4])
    lr = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 3))
    inline = m.apply(v, x, t, lr, train=False)
    feats = m.apply(v, lr, method="encode_cond")
    hoisted = m.apply(v, x, t, None, train=False, cond_features=feats)
    np.testing.assert_allclose(np.asarray(hoisted), np.asarray(inline), atol=1e-6)


def test_ddim_oracle_recovers_x0():
    """With an oracle eps-model, DDIM at eta=0 must walk deterministically to
    x0 in few steps."""
    from diffusionremotesensing_tpu.diffusion import make_ddim_sampler

    sched = make_schedule("cosine", 1000)
    x0 = 0.3 * jnp.ones((2, 4, 4, 1))

    def apply_fn(variables, x, t, cond, mask):
        ah = sched.alpha_hat[t.astype(jnp.int32)][:, None, None, None]
        return (x - jnp.sqrt(ah) * x0) / jnp.sqrt(1 - ah)

    sampler = make_ddim_sampler(apply_fn, sched, num_steps=10, eta=0.0)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 1))
    out = sampler(None, jax.random.PRNGKey(1), x_T)
    np.testing.assert_allclose(np.asarray(out), 0.3, atol=1e-3)


def test_ddim_deterministic_at_eta0():
    from diffusionremotesensing_tpu.diffusion import make_ddim_sampler
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_generation,
    )

    m = residual_attention_unet_generation(num_classes=2)
    v = init_unet_params(m, jax.random.PRNGKey(0), image_size=16)

    def apply_fn(variables, x, t, cond, mask):
        return m.apply(variables, x, t, cond, mask, train=False)

    sched = make_schedule("cosine", 50)
    sampler = make_ddim_sampler(apply_fn, sched, num_steps=5)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    cond = jnp.array([1])
    a = sampler(v, jax.random.PRNGKey(2), x_T, cond)
    b = sampler(v, jax.random.PRNGKey(3), x_T, cond)  # different key, eta=0
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ddim_process_api_with_cfg():
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_generation,
    )

    m = residual_attention_unet_generation(num_classes=4)
    v = init_unet_params(m, jax.random.PRNGKey(0), image_size=16)

    def apply_fn(variables, x, t, cond, mask):
        return m.apply(variables, x, t, cond, mask, train=False)

    proc = DiffusionProcess("cosine", apply_fn, noise_steps=20, image_size=16, image_channels=3)
    sampler = proc.ddim_sampler(num_steps=4, cfg_scale=3.0)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    out = sampler(v, jax.random.PRNGKey(2), x_T, jnp.array([0, 3]))
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_ddim_quadratic_spacing_and_clip_recover_x0():
    """The quadratic-tau and clip_x0 variants must still walk an oracle
    eps-model to x0 (clip is a no-op for in-range x0, exactness preserved),
    and quadratic spacing must concentrate steps near t=0."""
    import numpy as _np

    from diffusionremotesensing_tpu.diffusion import make_ddim_sampler

    sched = make_schedule("cosine", 1000)
    x0 = 0.3 * jnp.ones((2, 4, 4, 1))

    def apply_fn(variables, x, t, cond, mask):
        ah = sched.alpha_hat[t.astype(jnp.int32)][:, None, None, None]
        return (x - jnp.sqrt(ah) * x0) / jnp.sqrt(1 - ah)

    x_T = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 1))
    for spacing in ("linear", "quadratic"):
        sampler = make_ddim_sampler(
            apply_fn, sched, num_steps=10, eta=0.0,
            tau_spacing=spacing, clip_x0=True,
        )
        out = sampler(None, jax.random.PRNGKey(1), x_T)
        _np.testing.assert_allclose(_np.asarray(out), 0.3, atol=1e-3)
    # spacing shape check: quadratic's smallest gap is at the low-t end
    lin = _np.unique(_np.linspace(1, 999, 10).round())
    quad = _np.unique((_np.linspace(1, _np.sqrt(999), 10) ** 2).round())
    assert quad[1] - quad[0] < lin[1] - lin[0]
    assert quad[-1] - quad[-2] > lin[-1] - lin[-2]


def test_ddim_clip_x0_changes_out_of_range_trajectories():
    """clip_x0 must actually bind when the model predicts out-of-range x0."""
    from diffusionremotesensing_tpu.diffusion import make_ddim_sampler

    sched = make_schedule("cosine", 100)
    x0_oob = 1.7 * jnp.ones((1, 4, 4, 1))  # outside [0, 1]

    def apply_fn(variables, x, t, cond, mask):
        ah = sched.alpha_hat[t.astype(jnp.int32)][:, None, None, None]
        return (x - jnp.sqrt(ah) * x0_oob) / jnp.sqrt(1 - ah)

    x_T = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 1))
    free = make_ddim_sampler(apply_fn, sched, num_steps=8)(None, jax.random.PRNGKey(1), x_T)
    clipped = make_ddim_sampler(apply_fn, sched, num_steps=8, clip_x0=True)(
        None, jax.random.PRNGKey(1), x_T
    )
    np.testing.assert_allclose(np.asarray(free), 1.7, atol=1e-3)
    np.testing.assert_allclose(np.asarray(clipped), 1.0, atol=1e-3)


def test_cfg_without_cond_raises_clearly():
    """cfg_scale with cond=None must fail with an explanatory ValueError at
    the sampler entry, not an opaque concatenate-None TypeError inside the
    scan trace."""
    import pytest

    from diffusionremotesensing_tpu.diffusion import DiffusionProcess
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_generation,
    )

    model = residual_attention_unet_generation(num_classes=2)
    v = init_unet_params(model, jax.random.PRNGKey(0), image_size=8)

    def apply_fn(variables, x, t, cond, mask):
        return model.apply(variables, x, t, cond, mask, train=False)

    proc = DiffusionProcess("linear", apply_fn, noise_steps=4, image_size=8,
                            image_channels=3)
    x_T = jnp.zeros((2, 8, 8, 3))
    for sampler in (proc.sampler(cfg_scale=3.0),
                    proc.ddim_sampler(2, cfg_scale=3.0)):
        with pytest.raises(ValueError, match="cfg_scale requires cond"):
            sampler(v, jax.random.PRNGKey(1), x_T, None)
