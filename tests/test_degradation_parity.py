"""Statistical parity of the from-scratch BSRGAN degradation pipelines vs the
reference implementation (/root/reference/degradation_from_BSRGAN.py).

The pipelines are randomized compositions, so bit parity is impossible (and
the RNG streams differ by design); instead we check distributional agreement:
run both pipelines many times on the same image and compare the populations
of output statistics (mean intensity, per-image std, LR-HR downscale
residual). Slow-ish (~20s), marked accordingly.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

if os.path.isdir(REF):
    sys.path.insert(0, REF)

N_RUNS = 40


def _stats(pipeline_fn, img, n, seed0):
    means, stds, roughness = [], [], []
    for i in range(n):
        lq, hq = pipeline_fn(img.copy(), i + seed0)
        means.append(lq.mean())
        stds.append(lq.std())
        # high-frequency energy of the LQ patch (degradations kill/add it)
        roughness.append(np.abs(np.diff(lq, axis=0)).mean())
    return np.array(means), np.array(stds), np.array(roughness)


def _compare(ref_fn, our_fn, img):
    r = _stats(ref_fn, img, N_RUNS, 0)
    o = _stats(our_fn, img, N_RUNS, 1000)
    for name, a, b in zip(("mean", "std", "roughness"), r, o):
        # population means within half a pooled std of each other
        pooled = np.sqrt((a.std() ** 2 + b.std() ** 2) / 2) + 1e-6
        diff = abs(a.mean() - b.mean())
        assert diff < 0.75 * pooled + 0.02, (
            f"{name}: ref {a.mean():.4f}+-{a.std():.4f} vs ours {b.mean():.4f}+-{b.std():.4f}"
        )


@pytest.fixture(scope="module")
def test_image():
    rng = np.random.default_rng(0)
    # structured content: smooth gradient + texture, like a remote-sensing crop
    y, x = np.mgrid[0:96, 0:96] / 96.0
    img = 0.3 + 0.4 * x[..., None] + 0.1 * np.sin(20 * y)[..., None]
    img = img + 0.1 * rng.random((96, 96, 3))
    return np.clip(img, 0, 1).astype(np.float32)


def test_plus_pipeline_distribution(test_image):
    import random as pyrandom

    import degradation_from_BSRGAN as refmod

    from diffusionremotesensing_tpu.data.degradations import degradation_bsrgan_plus

    def ref_fn(img, seed):
        pyrandom.seed(seed)
        np.random.seed(seed)
        return refmod.degradation_bsrgan_plus(img, sf=2, lq_patchsize=32)

    def our_fn(img, seed):
        return degradation_bsrgan_plus(img, sf=2, lq_patchsize=32, rng=seed)

    _compare(ref_fn, our_fn, test_image)


def test_soft_pipeline_distribution(test_image):
    import random as pyrandom

    import degradation_from_BSRGAN as refmod

    from diffusionremotesensing_tpu.data.degradations import soft_degradation_bsrgan

    def ref_fn(img, seed):
        pyrandom.seed(seed)
        np.random.seed(seed)
        return refmod.soft_degradation_bsrgan(img, sf=2, lq_patchsize=32)

    def our_fn(img, seed):
        return soft_degradation_bsrgan(img, sf=2, lq_patchsize=32, rng=seed)

    _compare(ref_fn, our_fn, test_image)


def test_matlab_imresize_matches_reference_imresize_np(test_image):
    import degradation_from_BSRGAN as refmod

    from diffusionremotesensing_tpu.data.degradations import matlab_imresize

    ref = refmod.imresize_np(test_image.copy(), 1 / 2, True)
    got = matlab_imresize(test_image, 1 / 2, antialias=True)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
