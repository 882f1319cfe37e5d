"""Fused ancestral-update kernel (ops/fused_update.py): the bits->normal->
update math is pinned exactly on CPU via the deterministic bits operands
(the on-chip PRNG itself has no interpret-mode lowering; on TPU only the
bit source changes). Sampler wiring is shape-validated with eval_shape."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionremotesensing_tpu.diffusion import ddpm_step, make_sampler
from diffusionremotesensing_tpu.ops.fused_update import (
    _bits_to_normal,
    ancestral_update,
    update_coefs,
)
from diffusionremotesensing_tpu.schedules import make_schedule


def _rand(shape, seed=0, dtype=np.float32):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), dtype)


def _bits(shape, seed=1):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, 2**32, shape, dtype=np.uint32)
    )


def _expected_z(bits):
    # mirrors ops/fused_update._bits_to_normal's mantissa-bitcast uniforms
    b1, b2 = np.asarray(bits[0]), np.asarray(bits[1])
    f1 = (np.uint32(0x3F800000) | (b1 >> 9)).view(np.float32)
    f2 = (np.uint32(0x3F800000) | (b2 >> 9)).view(np.float32)
    u1 = np.float32(2.0) - f1
    u2 = f2 - np.float32(1.0)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


@pytest.mark.parametrize("i_val", [99, 50, 2, 1])
def test_matches_ddpm_step_with_injected_noise(i_val):
    B, H, W, C = 3, 8, 8, 12
    x, eps = _rand((B, H, W, C), 0), _rand((B, H, W, C), 1)
    bits = _bits((2, B, H, W, C))
    sch = make_schedule("cosine", 100)
    i = jnp.int32(i_val)
    out = ancestral_update(
        x, eps, update_coefs(sch, i), jnp.zeros(2, jnp.uint32), bits=bits,
        interpret=True,
    )
    z = _expected_z(bits) * (1.0 if i_val > 1 else 0.0)
    ref = ddpm_step(sch, x, eps, i, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_dtype_preserved_and_f32_math():
    B, H, W, C = 2, 4, 4, 3
    x = _rand((B, H, W, C), 2, np.float32).astype(jnp.bfloat16)
    eps = _rand((B, H, W, C), 3)
    bits = _bits((2, B, H, W, C), 4)
    sch = make_schedule("linear", 50)
    out = ancestral_update(
        x, eps, update_coefs(sch, jnp.int32(7)), jnp.zeros(2, jnp.uint32),
        bits=bits, interpret=True,
    )
    assert out.dtype == jnp.bfloat16 and out.shape == x.shape


def test_bits_to_normal_distribution():
    b = _bits((2, 512, 1024), 5)
    z = np.asarray(_bits_to_normal(b[0], b[1]))
    assert np.isfinite(z).all()
    assert abs(z.mean()) < 0.01 and abs(z.std() - 1.0) < 0.01
    # worst case of the (0,1] shift: bits == 0 must stay finite
    zero = jnp.zeros((8, 128), jnp.uint32)
    z0 = np.asarray(_bits_to_normal(zero, zero))
    assert np.isfinite(z0).all()


def test_update_coefs_zero_noise_at_last_step():
    sch = make_schedule("cosine", 100)
    assert float(update_coefs(sch, jnp.int32(1))[2]) == 0.0
    assert float(update_coefs(sch, jnp.int32(2))[2]) > 0.0


def test_sampler_wiring_eval_shape():
    """make_sampler(fused_update=True) must trace end-to-end (shapes/dtypes;
    no TPU lowering happens under eval_shape)."""
    sch = make_schedule("cosine", 10)

    def apply_fn(variables, x, t, cond, cond_mask, cond_features=None):
        return x * variables["w"]

    sample = make_sampler(apply_fn, sch, fused_update=True)
    x_T = jnp.zeros((2, 8, 8, 3), jnp.float32)
    out = jax.eval_shape(
        sample, {"w": jnp.ones(())}, jax.random.PRNGKey(0), x_T, None
    )
    assert out.shape == x_T.shape and out.dtype == x_T.dtype


def test_kernel_under_batch_sharded_mesh():
    """The kernel grid is batch-parallel; GSPMD must partition it along the
    data axis (pins the AggregationSampler mesh= + fused_update combination
    at the kernel level; bits replicated, state/eps batch-sharded)."""
    from diffusionremotesensing_tpu.parallel.sharding import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )

    B, H, W, C = 8, 8, 8, 12
    x, eps = _rand((B, H, W, C), 8), _rand((B, H, W, C), 9)
    bits = _bits((2, B, H, W, C), 10)
    sch = make_schedule("cosine", 100)
    coefs = update_coefs(sch, jnp.int32(40))
    seed = jnp.zeros(2, jnp.uint32)
    ref = np.asarray(ancestral_update(x, eps, coefs, seed, bits=bits, interpret=True))
    mesh = make_mesh()
    xs = jax.device_put(x, batch_sharding(mesh))
    es = jax.device_put(eps, batch_sharding(mesh))
    bs = jax.device_put(bits, replicated_sharding(mesh))
    got = np.asarray(ancestral_update(xs, es, coefs, seed, bits=bs, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-6)
