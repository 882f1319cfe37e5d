"""Fused s2d attention + packed head_at kernel (ops/att_block.py,
fused_att=True): the single Pallas program must equal the XLA chain it
replaces — gating signal, additive attention gate in s2d layout, and the
composed head's attention-branch 3x3 — at the kernel, model, and sharded
levels (interpret mode on CPU). Reference math:
/root/reference/UNet_model_superres.py:44-108 (gating_signal + attention
gate) and the head composition in models/unet.prepare_s2d_kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionremotesensing_tpu.ops.att_block import (
    att_head_block,
    build_att_weights,
    unpack_v8,
)
from diffusionremotesensing_tpu.ops.s2d import conv_s2d


def _rand(key, shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * scale


def _bn(key, c):
    return {
        "scale": _rand(key, (c,), 0.2) + 1.0,
        "bias": _rand(key + 1, (c,), 0.1),
        "mean": _rand(key + 2, (c,), 0.1),
        "var": jnp.abs(_rand(key + 3, (c,), 0.2)) + 0.5,
    }


def _pieces(c=32, ch=64, out4=12):
    return {
        "wgate": _rand(1, (1, 1, ch, c), 0.2),
        "bgate": _rand(2, (c,), 0.1),
        "bn_gate": _bn(3, c),
        "wg": _rand(7, (1, 1, c, c), 0.2),
        "bg": _rand(8, (c,), 0.1),
        "wx1": _rand(9, (1, 1, 4 * c, c), 0.15),
        "bx": _rand(10, (c,), 0.1),
        "wpsi": _rand(11, (1, 1, c, 1), 0.3),
        "bpsi": _rand(12, (1,), 0.1),
        "rc4": _rand(13, (1, 1, 4 * c, 4 * c), 0.1),
        "brc": _rand(14, (c,), 0.1),
        "bn_att": _bn(15, c),
        "wat": _rand(19, (3, 3, 4 * c, out4), 0.1),
    }


def _xla_oracle(x_s2d, h, p, eps=1e-5):
    """Independent composition of the replaced chain with plain XLA ops."""
    aff = lambda v, bn, t: (  # noqa: E731
        (v - jnp.tile(bn["mean"], t))
        * jax.lax.rsqrt(jnp.tile(bn["var"], t) + eps)
        * jnp.tile(bn["scale"], t)
        + jnp.tile(bn["bias"], t)
    )
    mm = lambda v, w: jnp.einsum("bhwc,co->bhwo", v, w[0, 0])  # noqa: E731
    g = jnp.maximum(aff(mm(h, p["wgate"]) + p["bgate"], p["bn_gate"], 1), 0.0)
    a = jnp.maximum(mm(g, p["wg"]) + p["bg"] + mm(x_s2d, p["wx1"]) + p["bx"], 0.0)
    psi = jax.nn.sigmoid(mm(a, p["wpsi"]) + p["bpsi"])
    attn = aff(mm(x_s2d * psi, p["rc4"]) + jnp.tile(p["brc"], 4), p["bn_att"], 4)
    return conv_s2d(attn, p["wat"], ((1, 1), (1, 1)))


def _folded(p):
    return build_att_weights(
        p["wgate"], p["bgate"], p["bn_gate"], p["wg"], p["bg"], p["wx1"],
        p["bx"], p["wpsi"], p["bpsi"], p["rc4"], p["brc"], p["bn_att"],
        p["wat"],
    )


@pytest.mark.parametrize("hg", [8, 16])
def test_kernel_matches_xla_chain(hg):
    p = _pieces()
    x = _rand(20, (2, hg, 8, 128), 0.5)
    h = _rand(21, (2, hg, 8, 64), 0.5)
    want = np.asarray(_xla_oracle(x, h, p))
    got = np.asarray(
        unpack_v8(att_head_block(x, h, _folded(p), interpret=True), 12)
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.slow
def test_model_fused_att_matches_s2d():
    """Full superres forward: fused_att=True == the plain s2d execution."""
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )

    m0 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    m1 = residual_attention_unet_superres(
        magnification_factor=2, s2d=True, fused_att=True
    )
    v = init_unet_params(m0, jax.random.PRNGKey(30), image_size=16)
    rng = np.random.default_rng(30)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([1, 5], np.int32)
    cond = rng.random((2, 8, 8, 3)).astype(np.float32)
    ref = np.asarray(m0.apply(v, x, t, cond, train=False))
    got = np.asarray(m1.apply(v, x, t, cond, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.slow
def test_model_fused_att_fallback_odd_rows():
    """H/2 not a multiple of 8 -> the flag silently keeps the XLA path."""
    from diffusionremotesensing_tpu.models.unet import (
        ResidualAttentionUNet,
        init_unet_params,
    )

    m0 = ResidualAttentionUNet(conditioning="class", num_classes=3, s2d=True)
    m1 = ResidualAttentionUNet(
        conditioning="class", num_classes=3, s2d=True, fused_att=True
    )
    v = init_unet_params(m0, jax.random.PRNGKey(31), image_size=24)
    rng = np.random.default_rng(31)
    x = rng.standard_normal((2, 24, 24, 3)).astype(np.float32)
    t = np.array([2, 4], np.int32)
    lab = np.array([0, 2], np.int32)
    ref = np.asarray(m0.apply(v, x, t, lab, train=False))
    got = np.asarray(m1.apply(v, x, t, lab, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.slow
def test_sampler_fused_att_matches_s2d():
    """Full reverse chain through make_process with fused_att=True."""
    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )

    m0 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    m1 = residual_attention_unet_superres(
        magnification_factor=2, s2d=True, fused_att=True, tap44="block"
    )
    v = init_unet_params(m0, jax.random.PRNGKey(32), image_size=32)
    key = jax.random.PRNGKey(33)
    x_T = jax.random.normal(jax.random.PRNGKey(34), (2, 32, 32, 3))
    cond = jax.random.uniform(jax.random.PRNGKey(35), (2, 16, 16, 3))
    out0 = np.asarray(make_process(m0, "cosine", 5, 32).sampler()(v, key, x_T, cond))
    out1 = np.asarray(make_process(m1, "cosine", 5, 32).sampler()(v, key, x_T, cond))
    np.testing.assert_allclose(out1, out0, atol=1e-4)


def test_kernel_under_batch_sharded_mesh():
    """The kernel grid is batch-parallel; GSPMD must partition it along the
    data axis (x/h batch-sharded, weights replicated)."""
    from diffusionremotesensing_tpu.parallel.sharding import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )

    p = _pieces()
    w = _folded(p)
    x = _rand(40, (8, 8, 8, 128), 0.5)
    h = _rand(41, (8, 8, 8, 64), 0.5)
    ref = np.asarray(att_head_block(x, h, w, interpret=True))
    mesh = make_mesh()
    xs = jax.device_put(x, batch_sharding(mesh))
    hs = jax.device_put(h, batch_sharding(mesh))
    ws = jax.device_put(w, replicated_sharding(mesh))
    got = np.asarray(att_head_block(xs, hs, ws, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_att_block_fits_vmem_shapes():
    """VMEM guard (unet._forward_s2d's use_fa): flagship shapes fit, the
    whole-tile gate shapes that crash Mosaic do not."""
    from diffusionremotesensing_tpu.ops.att_block import att_block_fits_vmem

    assert att_block_fits_vmem(64, 64, 128, 64)       # flagship bench shape
    assert att_block_fits_vmem(8, 8, 128, 64)         # CPU test shapes
    assert not att_block_fits_vmem(128, 128, 128, 64)  # HR-256 whole tile
    assert not att_block_fits_vmem(256, 256, 128, 64)  # HR-512 whole tile
