"""Aggregation sampling: patch grid parity, blend weights, end-to-end blend."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionremotesensing_tpu.aggregation import (
    AggregationSampler,
    gaussian_weights,
    patchify_coords,
    squarify_sizes,
)
from diffusionremotesensing_tpu.diffusion import DiffusionProcess

REF = "/root/reference"


@pytest.mark.parametrize(
    "h,w,patch,stride,mag",
    [(64, 64, 16, 8, 2), (64, 64, 16, 16, 1), (50, 70, 16, 8, 4), (32, 32, 32, 32, 2)],
)
def test_patchify_full_coverage_and_bounds(h, w, patch, stride, mag):
    boxes = patchify_coords(h, w, patch, stride, mag)
    cover = np.zeros((h * mag, w * mag), bool)
    assert len(boxes) == len(set(boxes))  # dedup
    for (y0, y1, x0, x1) in boxes:
        assert 0 <= y0 < y1 <= h * mag and 0 <= x0 < x1 <= w * mag
        assert y1 - y0 == patch * mag and x1 - x0 == patch * mag
        cover[y0:y1, x0:x1] = True
    assert cover.all()  # every output pixel written at least once


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.parametrize("h,w,patch,stride,mag", [(64, 64, 16, 8, 2), (48, 48, 16, 12, 4)])
def test_patchify_matches_reference(h, w, patch, stride, mag):
    sys.path.insert(0, REF)
    import torch
    from Aggregation_Sampling import split_aggregation_sampling

    img = torch.zeros((1, 3, h, w))
    # patchifier doesn't use self -> call unbound for a golden comparison
    patches, infos = split_aggregation_sampling.patchifier(None, img, patch, stride, mag)
    got = patchify_coords(h, w, patch, stride, mag)
    assert got == [tuple(i) for i in infos]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_gaussian_weights_match_reference_formula():
    # independent evaluation of Aggregation_Sampling.py:118-138 in float64
    from numpy import exp, pi, sqrt

    tw = th = 32
    var = 0.01
    mx = (tw - 1) / 2
    x_probs = [exp(-(x - mx) * (x - mx) / (tw * tw) / (2 * var)) / sqrt(2 * pi * var) for x in range(tw)]
    my = th / 2
    y_probs = [exp(-(y - my) * (y - my) / (th * th) / (2 * var)) / sqrt(2 * pi * var) for y in range(th)]
    ref = np.outer(y_probs, x_probs).astype(np.float32)
    np.testing.assert_allclose(gaussian_weights(tw, th), ref, rtol=1e-6)


def test_squarify_sizes():
    assert squarify_sizes(100, 120) == 128
    assert squarify_sizes(64, 64) == 64
    assert squarify_sizes(9000, 9000) == 8192


def _oracle_process(patch_hr: int, mag: int):
    """A process whose 'model' forces x -> upsampled condition immediately:
    predicting eps = (x - sqrt(ah)*target)/sqrt(1-ah) walks the sampler to the
    nearest-upsampled LR patch, so the blended canvas must reproduce the
    nearest-upsampled full image."""

    def apply_fn(variables, x, t, cond, mask):
        target = jnp.repeat(jnp.repeat(cond, mag, axis=1), mag, axis=2)
        sched = proc.schedule
        ah = sched.alpha_hat[t.astype(jnp.int32)][:, None, None, None]
        return (x - jnp.sqrt(ah) * target) / jnp.sqrt(1 - ah)

    proc = DiffusionProcess("linear", apply_fn, noise_steps=30, image_size=patch_hr, image_channels=3)
    return proc


@pytest.mark.parametrize("mag", [2, 4])
def test_aggregation_end_to_end_oracle(mag):
    patch, stride = 8, 4
    proc = _oracle_process(patch * mag, mag)
    agg = AggregationSampler(proc, patch_size=patch, stride=stride, magnification_factor=mag, batch_size=4)
    rng = np.random.default_rng(0)
    img = rng.random((16, 16, 3)).astype(np.float32)
    out = agg(None, img, key=jax.random.PRNGKey(1))
    assert out.shape == (16 * mag, 16 * mag, 3)
    expected = np.repeat(np.repeat(img, mag, 0), mag, 1)
    # the oracle pins every patch to the upsampled LR; blending overlapping
    # identical patches must reproduce it (up to sampler noise at t=1)
    assert np.abs(out - expected).mean() < 0.08


def test_aggregation_sharded_matches_unsharded():
    from diffusionremotesensing_tpu.parallel.sharding import make_mesh

    mag, patch, stride = 2, 8, 8
    proc = _oracle_process(patch * mag, mag)
    rng = np.random.default_rng(3)
    img = rng.random((16, 16, 3)).astype(np.float32)

    agg1 = AggregationSampler(proc, patch, stride, mag, batch_size=4)
    out1 = agg1(None, img, key=jax.random.PRNGKey(5))

    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices
    agg8 = AggregationSampler(proc, patch, stride, mag, batch_size=1, mesh=mesh)
    out8 = agg8(None, img, key=jax.random.PRNGKey(5))
    # chunk sizes differ (4 vs 8) so the RNG fold differs; compare against
    # the oracle target rather than bitwise
    expected = np.repeat(np.repeat(img, mag, 0), mag, 1)
    assert np.abs(out1 - expected).mean() < 0.08
    assert np.abs(out8 - expected).mean() < 0.08


def test_aggregation_single_patch_pads_to_chunk():
    """Regression: one patch with batch_size 16 must pad by wrap-around (the
    old code under-padded and crashed inside the jitted sampler)."""
    mag, patch = 2, 8
    proc = _oracle_process(patch * mag, mag)
    agg = AggregationSampler(proc, patch_size=patch, stride=patch, magnification_factor=mag, batch_size=16)
    img = np.random.default_rng(1).random((8, 8, 3)).astype(np.float32)  # exactly 1 patch
    out = agg(None, img, key=jax.random.PRNGKey(2))
    assert out.shape == (16, 16, 3)
    expected = np.repeat(np.repeat(img, mag, 0), mag, 1)
    assert np.abs(out - expected).mean() < 0.08


@pytest.mark.slow
def test_aggregation_sharded_s2d_model():
    """The production configuration: s2d inference model + patch axis
    sharded over the mesh + hoisted cond/kernels. Must match the unsharded
    non-s2d result against the oracle target."""
    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )
    from diffusionremotesensing_tpu.parallel.sharding import make_mesh

    model = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    v = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    proc = make_process(model, "cosine", 6, 16)

    mesh = make_mesh()
    agg = AggregationSampler(proc, patch_size=8, stride=8, magnification_factor=2,
                             batch_size=1, mesh=mesh)
    img = np.random.default_rng(11).random((16, 16, 3)).astype(np.float32)
    out = agg(v, img, key=jax.random.PRNGKey(12))
    assert out.shape == (32, 32, 3)
    assert np.isfinite(out).all()

    # numerics equal the unsharded non-s2d reference path with the same keys
    model0 = residual_attention_unet_superres(magnification_factor=2)
    proc0 = make_process(model0, "cosine", 6, 16)
    agg0 = AggregationSampler(proc0, patch_size=8, stride=8, magnification_factor=2,
                              batch_size=8)
    out0 = agg0(v, img, key=jax.random.PRNGKey(12))
    np.testing.assert_allclose(out, out0, atol=1e-4)


def test_streaming_blend_matches_gather_blend():
    """__call__ streams each gathered chunk straight into the canvas; the
    result must be IDENTICAL to the old gather-then-blend (sample_patches +
    per-patch scatter-add), across many chunks incl. the padded remainder."""
    mag, patch, stride = 2, 8, 4
    proc = _oracle_process(patch * mag, mag)
    agg = AggregationSampler(proc, patch_size=patch, stride=stride,
                             magnification_factor=mag, batch_size=16)
    rng = np.random.default_rng(7)
    img = rng.random((48, 48, 3)).astype(np.float32)  # 121 patches, 8 chunks
    out = agg(None, img, key=jax.random.PRNGKey(9))

    # gather-then-blend reference with the same key stream
    patches, boxes = agg.extract_patches(img)
    sr = agg.sample_patches(None, patches, jax.random.PRNGKey(9))
    canvas = np.zeros((96, 96, 3), np.float32)
    counts = np.zeros((96, 96, 1), np.float32)
    wmask = agg.weight[:, :, None]
    for p, (y0, y1, x0, x1) in zip(sr, boxes):
        canvas[y0:y1, x0:x1] += p * wmask
        counts[y0:y1, x0:x1] += wmask
    np.testing.assert_array_equal(out, np.clip(canvas / counts, 0, 1))


def test_streaming_blend_never_materializes_patch_stack(monkeypatch):
    """Bounded-memory contract: the full (P, p, p, C) patch stack must never
    exist during __call__ — extract_patches (the full-stack builder) is
    poisoned and the streamed path must not touch it."""
    mag, patch = 2, 8
    proc = _oracle_process(patch * mag, mag)
    agg = AggregationSampler(proc, patch_size=patch, stride=4,
                             magnification_factor=mag, batch_size=8)

    def boom(self, img):  # pragma: no cover - failure path
        raise AssertionError("full patch stack materialized")

    monkeypatch.setattr(AggregationSampler, "extract_patches", boom)
    img = np.random.default_rng(2).random((32, 32, 3)).astype(np.float32)
    out = agg(None, img, key=jax.random.PRNGKey(3))
    expected = np.repeat(np.repeat(img, mag, 0), mag, 1)
    assert np.abs(out - expected).mean() < 0.08


def test_streaming_blend_sharded_mesh():
    """Streamed blend under the 8-device mesh (many chunks incl. a padded
    remainder) still reproduces the oracle target."""
    from diffusionremotesensing_tpu.parallel.sharding import make_mesh

    mag, patch, stride = 2, 8, 4
    proc = _oracle_process(patch * mag, mag)
    mesh = make_mesh()
    agg = AggregationSampler(proc, patch, stride, mag, batch_size=1, mesh=mesh)
    img = np.random.default_rng(5).random((32, 32, 3)).astype(np.float32)
    out = agg(None, img, key=jax.random.PRNGKey(6))  # 49 patches, 7 chunks
    expected = np.repeat(np.repeat(img, mag, 0), mag, 1)
    assert np.abs(out - expected).mean() < 0.08


@pytest.mark.slow
def test_host_blend_scale_10k_patches():
    """Squarify-scale host-side blend: >=10k patches through the REAL
    streamed __call__ loop (the sampler is stubbed to the identity oracle so
    no device chain runs). Asserts exact blend correctness at 1024px LR x2
    (2048px canvas) and that the host loop cost stays trivial (~seconds) —
    the squarify 8192/10000px sizes scale this linearly (VERDICT round-3)."""
    import time

    mag, patch, stride = 2, 8, 4
    proc = _oracle_process(patch * mag, mag)
    agg = AggregationSampler(proc, patch_size=patch, stride=stride,
                             magnification_factor=mag, batch_size=256)
    img = np.random.default_rng(8).random((1024, 1024, 3)).astype(np.float32)

    def fake_iter(variables, n, block_fn, key):
        # exact per-patch SR: the nearest-upsampled LR patch (what the
        # oracle chain converges to, minus sampler noise)
        chunk = agg._chunk()
        for start in range(0, n, chunk):
            k = min(chunk, n - start)
            block = block_fn(np.arange(start, start + k))
            out = np.repeat(np.repeat(block, mag, 1), mag, 2)
            yield start, k, out

    agg._iter_sampled_chunks = fake_iter
    t0 = time.perf_counter()
    out = agg(None, img, key=jax.random.PRNGKey(1))
    wall = time.perf_counter() - t0
    n_boxes = len(patchify_coords(1024, 1024, patch, stride, mag))
    assert n_boxes >= 10_000, n_boxes  # 65k+ patches at this tiling
    assert out.shape == (2048, 2048, 3)
    # every patch is the exact upsample -> the weighted mean is exact
    expected = np.repeat(np.repeat(img, mag, 0), mag, 1)
    np.testing.assert_allclose(out, expected, atol=1e-5)
    # host loop cost sanity (blend + lazy extraction; generous CI bound)
    assert wall < 120, f"host blend took {wall:.1f}s for {n_boxes} patches"


def test_fused_update_with_ddim_is_rejected():
    """fused_update only exists on the DDPM ancestral branch; combined with
    ddim_steps it would silently sample the unmodified path — the
    constructor must reject it (aggregation.py)."""
    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import residual_attention_unet_superres

    model = residual_attention_unet_superres(magnification_factor=2)
    proc = make_process(model, "cosine", 6, 16)
    with pytest.raises(ValueError, match="fused_update"):
        AggregationSampler(proc, patch_size=8, stride=8,
                           magnification_factor=2, ddim_steps=4,
                           fused_update=True)
