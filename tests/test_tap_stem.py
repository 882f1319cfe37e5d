"""Fused stem kernel (ops/tap_block.tap_stem_block, tap44='stem'):
conv0 + bias + cond-add + whole ResConvBlock-0 in one Pallas program must
equal the stem composed with the already-pinned tap_block kernel, and the
model/sampler paths must match the dense-s2d execution (interpret mode on
CPU). Reference math: /root/reference/UNet_model_superres.py:110-172 plus
the conv0/cond stem at :300-316."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionremotesensing_tpu.ops.s2d import conv_s2d, k3_to_s2d, space_to_depth
from diffusionremotesensing_tpu.ops.tap_block import (
    build_block_weights,
    build_cond_slabs,
    stem_halves,
    tap_block,
    tap_stem_block,
)


def _rand(key, shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * scale


def _bn(key):
    return {
        "scale": _rand(key, (32,), 0.2) + 1.0,
        "bias": _rand(key + 1, (32,), 0.1),
        "mean": _rand(key + 2, (32,), 0.1),
        "var": jnp.abs(_rand(key + 3, (32,), 0.2)) + 0.5,
    }


def _weights():
    w = {
        "w0": _rand(20, (3, 3, 3, 16), 0.2),
        "b0": _rand(21, (16,), 0.1),
        "conv1": (_rand(22, (3, 3, 16, 32), 0.1), _rand(23, (32,), 0.1)),
        "skip": (_rand(24, (3, 3, 16, 32), 0.1), _rand(25, (32,), 0.1)),
        "conv2": (_rand(26, (3, 3, 32, 32), 0.1), _rand(27, (32,), 0.1)),
        "short": (_rand(28, (1, 1, 16, 32), 0.1), _rand(29, (32,), 0.1)),
    }
    bw = build_block_weights(
        w["conv1"][0], w["conv1"][1], _bn(30),
        w["skip"][0], w["skip"][1],
        w["conv2"][0], w["conv2"][1], _bn(34),
        w["short"][0], w["short"][1], _bn(38),
    )
    return w, bw


@pytest.mark.parametrize("nh,H", [(2, 16), (4, 16), (2, 8)])
def test_tap_stem_matches_stem_plus_tap_block(nh, H):
    """stem-fused kernel == (dense-s2d conv0 + bias + cond) ∘ tap_block for
    every grid partition count, including the NH=4 flagship layout."""
    w, bw = _weights()
    x = _rand(40, (2, H, H, 3))
    cond = _rand(41, (2, H, H, 16), 0.5)
    te4 = jnp.tile(jnp.maximum(_rand(42, (2, 32), 0.3), 0.0), (1, 4))

    xs = space_to_depth(x)
    cond_s = space_to_depth(cond)
    w0s = k3_to_s2d(w["w0"])
    b0_4 = jnp.tile(w["b0"], 4)

    h_s = conv_s2d(xs, w0s, ((1, 1), (1, 1))) + b0_4 + cond_s
    want = tap_block(h_s, te4, bw, interpret=True)

    condb = build_cond_slabs(b0_4, 2, H // 2, H // 2, cond_s2d=cond_s, nh=nh)
    got = tap_stem_block(xs, condb, te4, bw, w0s, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_tap_stem_no_cond():
    """Generation-style call: the slab carries only the conv0 bias."""
    w, bw = _weights()
    x = _rand(43, (1, 8, 8, 3))
    te4 = jnp.tile(jnp.maximum(_rand(44, (1, 32), 0.3), 0.0), (1, 4))
    xs = space_to_depth(x)
    w0s = k3_to_s2d(w["w0"])
    b0_4 = jnp.tile(w["b0"], 4)

    h_s = conv_s2d(xs, w0s, ((1, 1), (1, 1))) + b0_4
    want = tap_block(h_s, te4, bw, interpret=True)
    condb = build_cond_slabs(b0_4, 1, 4, 4)
    got = tap_stem_block(xs, condb, te4, bw, w0s, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_stem_halves_rule():
    assert stem_halves(64) == 4        # flagship 128px: 16-row programs
    assert stem_halves(32) == 2        # 64px
    assert stem_halves(16) == 2
    assert stem_halves(4) == 2         # tiny test shapes
    assert stem_halves(48) == 3        # 96px divides cleanly
    assert 40 % stem_halves(40) == 0   # non-multiple falls back to a divisor


def test_stem_model_generation_matches_s2d():
    """cond=None model path (class-conditional) through tap44='stem'."""
    from diffusionremotesensing_tpu.models.unet import (
        ResidualAttentionUNet,
        init_unet_params,
    )

    m0 = ResidualAttentionUNet(conditioning="class", num_classes=4, s2d=True)
    m1 = ResidualAttentionUNet(
        conditioning="class", num_classes=4, s2d=True, tap44="stem"
    )
    v = init_unet_params(m0, jax.random.PRNGKey(50), image_size=16)

    rng = np.random.default_rng(50)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([1, 5], np.int32)
    lab = np.array([0, 3], np.int32)
    ref = np.asarray(m0.apply(v, x, t, lab, train=False))
    got = np.asarray(m1.apply(v, x, t, lab, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_stem_fits_vmem_shapes():
    from diffusionremotesensing_tpu.ops.tap_block import stem_fits_vmem

    assert stem_fits_vmem(64, 64)          # flagship (measured ~9 MB peak)
    assert stem_fits_vmem(4, 4)            # tiny test shapes
    assert not stem_fits_vmem(128, 128)    # HR-256 whole tile: slabs ~18 MB
    assert not stem_fits_vmem(256, 256)    # HR-512 whole tile
    assert not stem_fits_vmem(8, 128)      # W2 alone drives the slab cost


def test_cond_slab_inversion_matches_flat_cond():
    """The demoted-stem path (unet._forward_s2d) recovers the flat
    bias+cond base from encode_cond_stem's 5-D slabs by slicing each slab's
    interior rows — pin that inversion against build_cond_slabs exactly."""
    b0_4 = jnp.tile(_rand(70, (16,), 0.1), 4)
    cond_s = _rand(71, (2, 8, 8, 64), 0.5)
    slabs = build_cond_slabs(b0_4, 2, 8, 8, cond_s2d=cond_s, nh=4)
    rows = 8 // slabs.shape[1]
    got = jnp.concatenate(
        [slabs[:, i, 2 : 2 + rows] for i in range(slabs.shape[1])], axis=1
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(b0_4 + cond_s), atol=0
    )


def test_stem_demotes_past_vmem_budget():
    """tap44='stem' at a shape whose slabs exceed the VMEM budget must
    demote to the block kernel and still consume the hoisted 5-D slabs
    exactly (the inversion branch) — a wide-but-short tile keeps W2 = 128
    past the stem guard while everything else stays CPU-test sized."""
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )
    from diffusionremotesensing_tpu.ops.tap_block import stem_fits_vmem

    assert not stem_fits_vmem(8, 128)

    m0 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    m1 = residual_attention_unet_superres(
        magnification_factor=2, s2d=True, tap44="stem"
    )
    v = init_unet_params(m0, jax.random.PRNGKey(80), image_size=32)

    rng = np.random.default_rng(80)
    x = rng.standard_normal((1, 16, 256, 3)).astype(np.float32)
    t = np.array([3], np.int32)
    cond = rng.random((1, 8, 128, 3)).astype(np.float32)
    ref = np.asarray(m0.apply(v, x, t, cond, train=False))
    feats = m1.apply(v, cond, method="encode_cond_stem")
    assert feats.ndim == 5
    kern = m1.apply(v, method="prepare_s2d_kernels")
    got = np.asarray(
        m1.apply(v, x, t, cond_features=feats, s2d_kernels=kern, train=False)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_stem_sampler_matches_s2d():
    """Full reverse chain with tap44='stem' through make_process — exercises
    the encode_cond_stem hoist (5-D slab cond_features) end to end."""
    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )

    m0 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    m1 = residual_attention_unet_superres(
        magnification_factor=2, s2d=True, tap44="stem"
    )
    v = init_unet_params(m0, jax.random.PRNGKey(51), image_size=32)

    key = jax.random.PRNGKey(52)
    x_T = jax.random.normal(jax.random.PRNGKey(53), (2, 32, 32, 3))
    cond = jax.random.uniform(jax.random.PRNGKey(54), (2, 16, 16, 3))
    out0 = np.asarray(make_process(m0, "cosine", 5, 32).sampler()(v, key, x_T, cond))
    out1 = np.asarray(make_process(m1, "cosine", 5, 32).sampler()(v, key, x_T, cond))
    np.testing.assert_allclose(out1, out0, atol=1e-4)
