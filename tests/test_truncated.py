"""Truncated warm-start sampling (start_t): semantics, defaults, surfaces.

Framework addition (SDEdit arXiv:2108.01073 / CCDF arXiv:2112.05146) with no
reference counterpart: the reverse chain starts from a q-sampled cheap
reconstruction at t=start_t (the bicubic upsample for SR) and runs only
start_t steps. Default off everywhere = the reference full chain, pinned by
the bitwise-default tests below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionremotesensing_tpu.diffusion import (
    DiffusionProcess,
    ddpm_step,
    make_ddim_sampler,
    make_sampler,
    warm_start_state,
    q_sample,
)
from diffusionremotesensing_tpu.schedules import make_schedule


def _oracle_apply(sched, x0):
    """eps-oracle for a fixed x0: eps = (x - sqrt(ah) x0) / sqrt(1 - ah)."""

    def apply_fn(variables, x, t, cond, mask):
        ah = sched.alpha_hat[t.astype(jnp.int32)][:, None, None, None]
        return (x - jnp.sqrt(ah) * x0) / jnp.sqrt(1 - ah)

    return apply_fn


def test_warm_start_state_closed_form():
    sched = make_schedule("cosine", 100)
    init = jax.random.uniform(jax.random.PRNGKey(0), (3, 8, 8, 2))
    key = jax.random.PRNGKey(1)
    x_t = warm_start_state(sched, init, 40, key)
    # same key/shape/dtype -> q_sample's eps is the identical draw
    _, eps = q_sample(sched, init, jnp.full((3,), 40), key)
    ah = float(sched.alpha_hat[40])
    expected = np.sqrt(ah) * np.asarray(init) + np.sqrt(1 - ah) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(x_t), expected, rtol=1e-5, atol=1e-6)


def test_truncated_sampler_matches_manual_tail():
    """start_t=k must reproduce a hand-rolled k..1 ancestral loop with the
    sampler's exact key discipline (split per step, zero noise at t=1)."""
    sched = make_schedule("linear", 30)
    x0 = 0.4 * jnp.ones((2, 4, 4, 1))
    apply_fn = _oracle_apply(sched, x0)
    k_start = 9

    sampler = make_sampler(apply_fn, sched, start_t=k_start)
    key = jax.random.PRNGKey(7)
    x_init = jax.random.normal(jax.random.PRNGKey(8), (2, 4, 4, 1))
    got = np.asarray(sampler(None, key, x_init))

    x, k = x_init, key
    for i in range(k_start, 0, -1):
        k, k_noise = jax.random.split(k)
        t = jnp.full((2,), i, jnp.int32)
        eps_hat = apply_fn(None, x, t, None, None)
        n = int(np.prod(x.shape))
        z = jax.random.normal(k_noise, (n,)).reshape(x.shape)
        z = jnp.where(i > 1, z, jnp.zeros_like(z))
        x = ddpm_step(sched, x, eps_hat, jnp.asarray(i), z)
    np.testing.assert_allclose(got, np.asarray(x), rtol=1e-5, atol=1e-6)


def test_start_t_default_is_bitwise_reference_chain():
    """start_t=T-1 (and unset) must be the identical program: same ts, same
    keys, bitwise-equal output."""
    sched = make_schedule("cosine", 12)
    x0 = 0.6 * jnp.ones((1, 4, 4, 1))
    apply_fn = _oracle_apply(sched, x0)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 1))
    key = jax.random.PRNGKey(1)
    base = np.asarray(make_sampler(apply_fn, sched)(None, key, x_T))
    trunc = np.asarray(make_sampler(apply_fn, sched, start_t=11)(None, key, x_T))
    np.testing.assert_array_equal(base, trunc)
    # DDIM: linspace(1, T-1, N) is the same grid either way
    base_d = np.asarray(
        make_ddim_sampler(apply_fn, sched, num_steps=5)(None, key, x_T)
    )
    trunc_d = np.asarray(
        make_ddim_sampler(apply_fn, sched, num_steps=5, start_t=11)(None, key, x_T)
    )
    np.testing.assert_array_equal(base_d, trunc_d)


def test_truncated_oracle_recovers_x0_both_samplers():
    """Warm start at modest t + oracle model walks back to x0 for DDPM and
    for the truncated-DDIM subsequence."""
    sched = make_schedule("cosine", 1000)
    x0 = 0.3 * jnp.ones((2, 4, 4, 1))
    apply_fn = _oracle_apply(sched, x0)
    init = jnp.full((2, 4, 4, 1), 0.31)  # a close cheap reconstruction
    start = 200
    x_s = warm_start_state(sched, init, start, jax.random.PRNGKey(0))

    got = make_sampler(apply_fn, sched, start_t=start)(
        None, jax.random.PRNGKey(1), x_s
    )
    np.testing.assert_allclose(np.asarray(got), 0.3, atol=2e-2)

    got_d = make_ddim_sampler(apply_fn, sched, num_steps=8, start_t=start)(
        None, jax.random.PRNGKey(1), x_s
    )
    np.testing.assert_allclose(np.asarray(got_d), 0.3, atol=1e-3)


def test_ddim_single_step_anchors_at_start_t():
    """num_steps=1 must run its one step AT t_start (np.linspace(1, t, 1)
    would put it at t=1, silently never removing the start_t noise the
    caller's warm-start state carries — ADVICE round-3). With the eps-oracle
    a single DDIM step from t_start is an exact x0 prediction."""
    sched = make_schedule("cosine", 1000)
    x0 = 0.3 * jnp.ones((2, 4, 4, 1))
    apply_fn = _oracle_apply(sched, x0)
    start = 400
    x_s = warm_start_state(sched, jnp.full((2, 4, 4, 1), 0.32), start,
                           jax.random.PRNGKey(0))
    got = make_ddim_sampler(apply_fn, sched, num_steps=1, start_t=start)(
        None, jax.random.PRNGKey(1), x_s
    )
    np.testing.assert_allclose(np.asarray(got), 0.3, atol=1e-4)

    # untruncated num_steps=1: the single step sits at T-1 (x0 prediction
    # from the actual starting state), same anchoring rule
    seen = []

    def recording(variables, x, t, cond, mask):
        seen.append(t)
        return apply_fn(variables, x, t, cond, mask)

    with jax.disable_jit():
        make_ddim_sampler(recording, sched, num_steps=1)(
            None, jax.random.PRNGKey(1), x_s
        )
    assert int(seen[0][0]) == 999


def test_ddim_truncated_taus_stay_in_range():
    """The DDIM subsequence under start_t must never query t > start_t
    (an out-of-range tau would q-sample noise the warm start never added)."""
    sched = make_schedule("cosine", 500)
    seen = []

    def apply_fn(variables, x, t, cond, mask):
        seen.append(t)
        ah = sched.alpha_hat[t.astype(jnp.int32)][:, None, None, None]
        return (x - jnp.sqrt(ah) * 0.5) / jnp.sqrt(1 - ah)

    sampler = make_ddim_sampler(apply_fn, sched, num_steps=6, start_t=77)
    with jax.disable_jit():  # record concrete per-step t values
        sampler(None, jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 1)))
    ts = sorted(int(t[0]) for t in seen)
    assert ts[0] >= 1 and ts[-1] == 77, ts


def test_start_t_validation():
    sched = make_schedule("linear", 10)

    def apply_fn(variables, x, t, cond, mask):
        return jnp.zeros_like(x)

    for bad in (0, 10, -3):
        with pytest.raises(ValueError, match="start_t"):
            make_sampler(apply_fn, sched, start_t=bad)
        with pytest.raises(ValueError, match="start_t"):
            make_ddim_sampler(apply_fn, sched, num_steps=3, start_t=bad)

    proc = DiffusionProcess("linear", apply_fn, noise_steps=10, image_size=4,
                            image_channels=1)
    with pytest.raises(ValueError, match="start_t and init go together"):
        proc.sample(None, jax.random.PRNGKey(0), n=1, start_t=5)
    with pytest.raises(ValueError, match="start_t and init go together"):
        proc.sample(None, jax.random.PRNGKey(0), n=1,
                    init=jnp.zeros((4, 4, 1)))


def test_process_sample_warm_start_broadcast_and_shapes():
    """DiffusionProcess.sample(start_t, init): single HWC init broadcasts
    like cond; output shape/finiteness; DDIM combination works."""
    sched_steps = 20
    x0 = 0.5

    def apply_fn(variables, x, t, cond, mask):
        sched = make_schedule("cosine", sched_steps)
        ah = sched.alpha_hat[t.astype(jnp.int32)][:, None, None, None]
        return (x - jnp.sqrt(ah) * x0) / jnp.sqrt(1 - ah)

    proc = DiffusionProcess("cosine", apply_fn, noise_steps=sched_steps,
                            image_size=8, image_channels=3)
    init = jnp.full((8, 8, 3), 0.5)
    # ancestral truncation re-injects sqrt(beta) noise per step -> loose mean
    # check; DDIM at eta=0 is deterministic -> tight
    out = proc.sample(None, jax.random.PRNGKey(0), n=3, start_t=6, init=init)
    assert out.shape == (3, 8, 8, 3)
    assert np.abs(np.asarray(out) - 0.5).mean() < 0.2
    out_d = proc.sample(None, jax.random.PRNGKey(0), n=3, start_t=6,
                        init=init, ddim_steps=4)
    assert out_d.shape == (3, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(out_d), 0.5, atol=5e-2)


def test_aggregation_start_t_uses_bicubic_init():
    """AggregationSampler(start_t=1) output must sit near the bicubic
    upsample (x_1 ~ init at alpha_hat_1 ~ 1, one nearly-identity reverse
    step), proving the warm start feeds the chain; start_t=None must not."""
    from diffusionremotesensing_tpu.aggregation import AggregationSampler
    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )
    from diffusionremotesensing_tpu.ops.resize import upsample_bicubic

    mag, patch = 2, 8
    m = residual_attention_unet_superres(magnification_factor=mag)
    v = init_unet_params(m, jax.random.PRNGKey(0), image_size=patch * mag)
    proc = make_process(m, "cosine", 50, patch * mag)
    lr = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (16, 16, 3)), np.float32
    )
    bic = np.clip(
        np.asarray(upsample_bicubic(jnp.asarray(lr)[None], mag))[0], 0, 1
    )

    warm = AggregationSampler(proc, patch_size=patch, stride=patch,
                              magnification_factor=mag, batch_size=4,
                              start_t=1)
    out_warm = warm(v, lr, key=jax.random.PRNGKey(2))
    assert np.abs(out_warm - bic).mean() < 0.15

    cold = AggregationSampler(proc, patch_size=patch, stride=patch,
                              magnification_factor=mag, batch_size=4)
    out_cold = cold(v, lr, key=jax.random.PRNGKey(2))
    assert np.abs(out_cold - bic).mean() > np.abs(out_warm - bic).mean()


def test_serving_start_t_superres_only():
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_generation,
    )
    from diffusionremotesensing_tpu.serving import InferenceServer

    m = residual_attention_unet_generation(num_classes=2)
    v = init_unet_params(m, jax.random.PRNGKey(0), image_size=8)
    with pytest.raises(ValueError, match="superres"):
        InferenceServer(m, v, noise_schedule="cosine", noise_steps=8,
                        image_size=8, task="generation", start_t=3)


def test_serving_start_t_superres_batch():
    """The micro-batched superres endpoint runs the warm-start chain."""
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )
    from diffusionremotesensing_tpu.serving import InferenceServer

    m = residual_attention_unet_superres(magnification_factor=2)
    v = init_unet_params(m, jax.random.PRNGKey(0), image_size=16)
    srv = InferenceServer(m, v, noise_schedule="cosine", noise_steps=10,
                          image_size=16, task="superres", max_batch=2,
                          start_t=2)
    try:
        out = srv.infer_batch([np.full((8, 8, 3), 0.5, np.float32)])
        assert out[0].shape == (16, 16, 3)
        assert np.isfinite(out[0]).all()
    finally:
        srv.batcher.shutdown()
