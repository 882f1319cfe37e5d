"""Fused Pallas attention gate: equivalence with the XLA path.

Runs the kernel in interpreter mode (CPU test env); the same code path is
compiled on TPU. The full-model check flips every gate to the fused kernel
and compares outputs against the standard flax forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionremotesensing_tpu.ops.pallas_kernels import (
    PALLAS_AVAILABLE,
    attention_gate_reference,
    fused_attention_gate,
)

pytestmark = pytest.mark.skipif(not PALLAS_AVAILABLE, reason="pallas unavailable")


@pytest.mark.parametrize("shape", [(2, 16, 16, 32), (2, 8, 8, 128)])
def test_fused_gate_matches_reference(shape):
    B, H, W, C = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, H // 2, W // 2, C)).astype(np.float32))

    def p(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32)) * 0.1

    args = (
        x, g, p(1, 1, C, C), p(C), p(2, 2, C, C), p(C), p(1, 1, C, 1), p(1),
        p(1, 1, C, C), p(C),
        jnp.ones((C,)) * 1.1, jnp.zeros((C,)) + 0.05,
        jnp.zeros((C,)) + 0.02, jnp.ones((C,)) * 0.9,
    )
    got = fused_attention_gate(*args, interpret=True)
    ref = attention_gate_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_full_model_with_pallas_gates_matches_xla():
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )

    m_xla = residual_attention_unet_superres(magnification_factor=2)
    m_pal = residual_attention_unet_superres(magnification_factor=2, use_pallas="interpret")
    v = init_unet_params(m_xla, jax.random.PRNGKey(0), image_size=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    t = jnp.array([3, 9])
    lr = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3))
    out_xla = m_xla.apply(v, x, t, lr, train=False)
    out_pal = m_pal.apply(v, x, t, lr, train=False)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla), rtol=1e-3, atol=1e-4)
