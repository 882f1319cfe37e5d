"""s2d inference path of the UNet == the ordinary path (same params)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionremotesensing_tpu.models.unet import (
    ResidualAttentionUNet,
    init_unet_params,
    residual_attention_unet_superres,
)


def test_s2d_forward_matches_normal_superres():
    m0 = residual_attention_unet_superres(magnification_factor=2)
    m1 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    v = init_unet_params(m0, jax.random.PRNGKey(0), image_size=32)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    t = np.array([3, 9], np.int32)
    cond = rng.random((2, 16, 16, 3)).astype(np.float32)

    ref = np.asarray(m0.apply(v, x, t, cond, train=False))
    got = np.asarray(m1.apply(v, x, t, cond, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_s2d_forward_matches_normal_generation():
    m0 = ResidualAttentionUNet(conditioning="class", num_classes=4)
    m1 = ResidualAttentionUNet(conditioning="class", num_classes=4, s2d=True)
    v = init_unet_params(m0, jax.random.PRNGKey(1), image_size=16)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([1, 5], np.int32)
    lab = np.array([0, 3], np.int32)

    ref = np.asarray(m0.apply(v, x, t, lab, train=False))
    got = np.asarray(m1.apply(v, x, t, lab, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_s2d_sampler_matches_normal_sampler():
    """Full reverse chain through make_process (the s2d hoisted cond path)."""
    from diffusionremotesensing_tpu.diffusion import make_process

    m0 = residual_attention_unet_superres(magnification_factor=2)
    m1 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    v = init_unet_params(m0, jax.random.PRNGKey(2), image_size=32)

    key = jax.random.PRNGKey(3)
    x_T = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3))
    cond = jax.random.uniform(jax.random.PRNGKey(5), (2, 16, 16, 3))

    out0 = np.asarray(make_process(m0, "cosine", 6, 32).sampler()(v, key, x_T, cond))
    out1 = np.asarray(make_process(m1, "cosine", 6, 32).sampler()(v, key, x_T, cond))
    np.testing.assert_allclose(out1, out0, atol=1e-4)


def test_s2d_training_path_unchanged():
    """train=True must take the ordinary path (batch-stat BN) even with s2d on."""
    m1 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    v = init_unet_params(m1, jax.random.PRNGKey(6), image_size=16)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([1, 2], jnp.int32)
    cond = jnp.zeros((2, 8, 8, 3))
    out, mut = m1.apply(v, x, t, cond, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 16, 16, 3)
    assert "batch_stats" in mut


def test_s2d_forward_matches_normal_sar():
    from diffusionremotesensing_tpu.models.unet import residual_attention_unet_sar_to_ndvi

    m0 = residual_attention_unet_sar_to_ndvi()
    m1 = residual_attention_unet_sar_to_ndvi(s2d=True)
    v = init_unet_params(m0, jax.random.PRNGKey(7), image_size=16)

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    t = np.array([2, 8], np.int32)
    sar = rng.random((2, 16, 16, 2)).astype(np.float32)

    ref = np.asarray(m0.apply(v, x, t, sar, train=False))
    got = np.asarray(m1.apply(v, x, t, sar, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_s2d_train_step_matches_normal():
    """s2d TRAINING forward: loss, gradients and the merged batch_stats all
    match the ordinary train path (fp-tolerance; stats are tight — identical
    element multisets in tap layout)."""
    import optax

    from diffusionremotesensing_tpu.train import Trainer
    from diffusionremotesensing_tpu.data.loader import DataLoader

    rng = np.random.default_rng(9)
    x = rng.random((4, 16, 16, 3)).astype(np.float32)
    cond = rng.random((4, 8, 8, 3)).astype(np.float32)
    batch = {"x": x, "cond": cond}
    key = jax.random.PRNGKey(3)

    def one_step(s2d_train):
        model = residual_attention_unet_superres(
            magnification_factor=2, s2d=s2d_train, s2d_train=s2d_train
        )
        v = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
        tr = Trainer(model, "linear", noise_steps=10, image_size=16, lr=1e-3,
                     loss="MSE", seed=0)
        state = tr.init_state(jax.tree_util.tree_map(jnp.array, v))
        step = tr._build_train_step()
        state, loss = step(state, {k: jnp.asarray(v_) for k, v_ in batch.items()}, key)
        return float(loss), state

    loss0, st0 = one_step(False)
    loss1, st1 = one_step(True)
    np.testing.assert_allclose(loss1, loss0, rtol=1e-5)
    # batch_stats: linear reductions — tight agreement, and the level-0 BNs
    # must actually have been updated away from their init values
    for a, b in zip(jax.tree_util.tree_leaves(st0.batch_stats),
                    jax.tree_util.tree_leaves(st1.batch_stats)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)
    blk_mean = st1.batch_stats["conv_block0"]["BatchNorm_0"]["mean"]
    assert float(jnp.abs(jnp.asarray(blk_mean)).max()) > 0  # stats moved
    # params after one adam step: compare where well-conditioned
    for a, b in zip(jax.tree_util.tree_leaves(st0.params),
                    jax.tree_util.tree_leaves(st1.params)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert np.abs(b - a).max() <= 2.1e-3  # 2*lr + slack (adam sign flips at g~0)


def test_tap44_forward_matches_s2d():
    """tap44 (tap-structured Pallas conv, interpret mode on CPU) must equal
    the dense-s2d path exactly for BOTH enablement levels."""
    m0 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    v = init_unet_params(m0, jax.random.PRNGKey(7), image_size=32)

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    t = np.array([2, 8], np.int32)
    cond = rng.random((2, 16, 16, 3)).astype(np.float32)
    ref = np.asarray(m0.apply(v, x, t, cond, train=False))
    for level in ("conv2", True, "block", "stem", "l1"):
        m1 = residual_attention_unet_superres(
            magnification_factor=2, s2d=True, tap44=level
        )
        got = np.asarray(m1.apply(v, x, t, cond, train=False))
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=f"tap44={level}")


def test_tap44_sampler_matches_s2d():
    """Full reverse chain with tap44 through make_process (hoisted kernels)."""
    from diffusionremotesensing_tpu.diffusion import make_process

    m0 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    m1 = residual_attention_unet_superres(magnification_factor=2, s2d=True, tap44=True)
    v = init_unet_params(m0, jax.random.PRNGKey(8), image_size=32)

    key = jax.random.PRNGKey(9)
    x_T = jax.random.normal(jax.random.PRNGKey(10), (2, 32, 32, 3))
    cond = jax.random.uniform(jax.random.PRNGKey(11), (2, 16, 16, 3))
    out0 = np.asarray(make_process(m0, "cosine", 5, 32).sampler()(v, key, x_T, cond))
    out1 = np.asarray(make_process(m1, "cosine", 5, 32).sampler()(v, key, x_T, cond))
    np.testing.assert_allclose(out1, out0, atol=1e-4)
