"""W8A8 static-calibration quantized inference (ops/quant.py).

Covers: the int8 conv sandwich math, calibration via the "quant" collection
(flax-module sites in blocks.py and hand-written s2d sites in unet.py), the
site-exclusion policy, that init/training never see the collection, and that
quantized variables drive the real jitted samplers for both conv paths
(s2d and reference/normal) and the generation (label/CFG) task.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionremotesensing_tpu.diffusion import make_process
from diffusionremotesensing_tpu.models.unet import (
    init_unet_params,
    residual_attention_unet_generation,
    residual_attention_unet_superres,
)
from diffusionremotesensing_tpu.ops import quant


def _paths(node, prefix=""):
    if isinstance(node, dict):
        for k, v in node.items():
            yield from _paths(v, prefix + "/" + str(k))
    else:
        yield prefix


def test_conv_int8_matches_fake_quant_reference():
    """conv_int8 == f32 conv of the int8-quantized operands times the scales
    (the sandwich introduces no error beyond the quantization itself)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (2, 8, 8, 16))
    w = jax.random.normal(k2, (3, 3, 16, 8)) * 0.1
    amax = quant.abs_max(x)
    out = quant.conv_int8(
        x, w, amax, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # manual fake-quant reference
    sx = float(amax) / 127.0
    xq = np.clip(np.round(np.asarray(x) / sx), -127, 127)
    sw = np.maximum(np.abs(np.asarray(w)).max(axis=(0, 1, 2)), 1e-12) / 127.0
    wq = np.clip(np.round(np.asarray(w) / sw), -127, 127)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(xq, jnp.float32), jnp.asarray(wq, jnp.float32),
        (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) * (sx * sw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)
    # and the quantization error vs the exact conv is small for these ranges
    exact = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    rel = float(jnp.max(jnp.abs(out - exact))) / float(jnp.max(jnp.abs(exact)))
    assert rel < 0.05, rel


def _superres_setup(s2d=True):
    model = residual_attention_unet_superres(magnification_factor=2, s2d=s2d)
    v = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (2, 16, 16, 3))
    t = jnp.array([100, 900], jnp.int32)
    cond = jax.random.uniform(jax.random.fold_in(k, 1), (2, 8, 8, 3))
    return model, v, x, t, cond


def test_calibration_and_policy():
    model, v, x, t, cond = _superres_setup()
    # init never records quant (guarded by is_initializing)
    assert "quant" not in v
    tree = quant.calibrate(model, v, [(x, t, cond), (x * 0.5, t, cond)], train=False)
    ps = sorted(_paths(dict(tree)))
    # both site families present: flax-module paths and s2d labels
    assert any("/conv_blocks_" in p or "/attention" in p for p in ps)
    assert any(p.startswith("/s2d.") for p in ps)
    # amaxes are positive scalars; the x*0.5 probe must not lower the max
    solo = quant.calibrate(model, v, [(x, t, cond)], train=False)
    for p_all, p_one in zip(
        jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(solo)
    ):
        assert float(p_all) >= float(p_one) - 1e-6
    scales = quant.filter_scales(tree)
    kept = sorted(_paths(scales))
    assert kept and all("head" not in p and "psi" not in p for p in kept)
    assert len(kept) < len(ps)


@pytest.mark.slow
def test_quantized_forward_bounded_error_both_paths():
    for s2d in (True, False):
        model, v, x, t, cond = _superres_setup(s2d=s2d)
        ref = model.apply(v, x, t, cond, train=False)
        tree = quant.calibrate(model, v, [(x, t, cond)], train=False)
        vq = quant.attach(v, quant.filter_scales(tree, margin=1.05))
        out = model.apply(vq, x, t, cond, train=False)
        assert out.shape == ref.shape
        err = float(jnp.max(jnp.abs(out - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        assert err < 0.15 * max(scale, 1e-3), (s2d, err, scale)
        # without the quant collection the exact path is bit-identical
        again = model.apply(v, x, t, cond, train=False)
        np.testing.assert_array_equal(np.asarray(again), np.asarray(ref))


def test_quantize_for_sampling_through_real_samplers():
    model, v, x, t, cond = _superres_setup()
    proc = make_process(model, "cosine", 6, 16)
    x0 = jax.image.resize(cond, (2, 16, 16, 3), "bicubic")
    vq = quant.quantize_for_sampling(
        model, v, proc.schedule.alpha_hat, x0, cond, jax.random.PRNGKey(9),
        train=False,
    )
    assert "quant" in vq and jax.tree_util.tree_leaves(vq["quant"])
    xT = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    out = np.asarray(proc.sampler()(vq, jax.random.PRNGKey(5), xT, cond))
    assert out.shape == (2, 16, 16, 3) and np.isfinite(out).all()
    out_d = np.asarray(proc.ddim_sampler(3)(vq, jax.random.PRNGKey(5), xT, cond))
    assert np.isfinite(out_d).all()


def test_quantize_superres_tile_and_aggregation():
    from diffusionremotesensing_tpu.aggregation import AggregationSampler

    model, v, _, _, _ = _superres_setup()
    proc = make_process(model, "cosine", 5, 16)
    lr = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(3), (16, 16, 3)), np.float32
    )
    vq = quant.quantize_superres_tile(
        model, v, proc.schedule.alpha_hat, lr, 8, 2, jax.random.PRNGKey(4)
    )
    agg = AggregationSampler(proc, patch_size=8, stride=4,
                             magnification_factor=2, batch_size=4)
    out = np.asarray(agg(vq, lr, key=jax.random.PRNGKey(6)))
    assert out.shape == (32, 32, 3) and np.isfinite(out).all()


def test_generation_quant_with_labels():
    model = residual_attention_unet_generation(num_classes=3, s2d=True)
    v = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    proc = make_process(model, "cosine", 5, 16)
    labels = jnp.array([0, 2], jnp.int32)
    x0 = jnp.full((2, 16, 16, 3), 0.5, jnp.float32)
    vq = quant.quantize_for_sampling(
        model, v, proc.schedule.alpha_hat, x0, labels, jax.random.PRNGKey(7),
        train=False,
    )
    xT = jax.random.normal(jax.random.PRNGKey(8), (2, 16, 16, 3))
    out = np.asarray(proc.sampler(cfg_scale=3.0)(vq, jax.random.PRNGKey(9), xT, labels))
    assert out.shape == (2, 16, 16, 3) and np.isfinite(out).all()


def test_output_head_excluded_on_plain_path():
    """The first/last-layer policy must hold on BOTH conv paths: the s2d
    head sites are labeled 'head*', but the plain (s2d=False) path's final
    1x1 conv is the flax module 'output' — it must not be quantized either."""
    model, v, x, t, cond = _superres_setup(s2d=False)
    tree = quant.calibrate(model, v, [(x, t, cond)], train=False)
    assert any("/output/" in p for p in _paths(dict(tree)))  # site was seen
    kept = sorted(_paths(quant.filter_scales(tree)))
    assert kept and all("output" not in p for p in kept)


def test_cfg_uncond_branch_calibrated():
    """Generation calibration must exercise the unconditional (mask=0) CFG
    regime: a half-ones cond_mask changes the recorded maxima vs an
    all-conditioned probe set (the zeroed label embedding is a different
    activation regime the sampler runs on half of every batch)."""
    model = residual_attention_unet_generation(num_classes=3, s2d=False)
    v = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    # make the label embedding loud so the regimes measurably differ
    emb = np.asarray(v["params"]["label_emb"]["embedding"])
    v = jax.tree_util.tree_map(lambda a: a, v)
    v["params"]["label_emb"]["embedding"] = jnp.asarray(emb * 50.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.array([3, 4], jnp.int32)
    labels = jnp.array([0, 2], jnp.int32)
    cond_tree = quant.calibrate(model, v, [(x, t, labels)], train=False)
    mask = jnp.array([1.0, 0.0])
    both_tree = quant.calibrate(model, v, [(x, t, labels, mask)], train=False)
    a = jax.tree_util.tree_leaves(cond_tree)
    b = jax.tree_util.tree_leaves(both_tree)
    assert len(a) == len(b)
    assert any(abs(float(x1) - float(x2)) > 1e-6 for x1, x2 in zip(a, b))
    # and the one-stop helper accepts the mask (serve.py generation path)
    from diffusionremotesensing_tpu.schedules import make_schedule

    sched = make_schedule("cosine", 6)
    vq = quant.quantize_for_sampling(
        model, v, sched.alpha_hat, jnp.full((2, 16, 16, 3), 0.5), labels,
        jax.random.PRNGKey(2), cond_mask=mask, train=False,
    )
    assert "quant" in vq and jax.tree_util.tree_leaves(vq["quant"])


def test_tap44_branch_merge_covers_dense_sites():
    """The tap44 VMEM guard picks the fused-kernel branch per batch shape, so
    one aggregation run can execute BOTH branches (full chunks + remainder).
    quantize_for_sampling must therefore also calibrate the dense-s2d conv
    sites the fused branch skips (model.clone(tap44=False) merge)."""
    model = residual_attention_unet_superres(
        magnification_factor=2, s2d=True, tap44="block"
    )
    v = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.array([2, 3], jnp.int32)
    cond = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 3))
    # the fused branch alone never touches the dense level-0 conv sites
    fused_only = quant.calibrate(model, v, [(x, t, cond)], train=False)
    assert not any("s2d.blk_conv1" in p for p in _paths(dict(fused_only)))
    from diffusionremotesensing_tpu.schedules import make_schedule

    sched = make_schedule("cosine", 6)
    x0 = jax.image.resize(cond, (2, 16, 16, 3), "bicubic")
    vq = quant.quantize_for_sampling(
        model, v, sched.alpha_hat, x0, cond, jax.random.PRNGKey(3), train=False
    )
    kept = sorted(_paths(vq["quant"]))
    assert any("s2d.blk_conv1" in p for p in kept), kept


def test_training_path_untouched_by_quant_hooks():
    """The training forward (train=True, no quant collection) must neither
    record scales nor change numerics — the hooks are inference-only in
    practice because nothing passes mutable=["quant"] during training."""
    model, v, x, t, cond = _superres_setup(s2d=False)
    out, muts = model.apply(
        v, x, t, cond, train=True, mutable=["batch_stats"]
    )
    assert "quant" not in muts
    assert np.isfinite(np.asarray(out)).all()
