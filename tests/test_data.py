"""Data layer: loader semantics, datasets, degradation pipelines."""

import os

import numpy as np
import pytest
from PIL import Image

from diffusionremotesensing_tpu.data.datasets import (
    ImageFolderDataset,
    SarToNdviDataset,
    SuperresBSRGANDataset,
    SuperresDownBlurDataset,
)
from diffusionremotesensing_tpu.data.degradations import (
    degradation_bsrgan,
    degradation_bsrgan_plus,
    matlab_imresize,
    soft_degradation_bsrgan,
)
from diffusionremotesensing_tpu.data.loader import DataLoader


@pytest.fixture
def img_dir(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.png")
    return str(d)


@pytest.fixture
def class_dir(tmp_path):
    rng = np.random.default_rng(1)
    for c in ["Forest", "River"]:
        d = tmp_path / "cls" / c
        d.mkdir(parents=True)
        for i in range(3):
            arr = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return str(tmp_path / "cls")


def test_loader_batching_and_shuffle():
    ds = [{"x": np.full((2, 2, 1), float(i), np.float32)} for i in range(10)]
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["x"].shape == (4, 2, 2, 1)
    assert batches[2]["x"].shape == (2, 2, 2, 1)  # keep last partial batch
    # set_epoch reshuffles
    loader.set_epoch(0)
    first = [b["x"][0, 0, 0, 0] for b in loader]
    loader.set_epoch(1)
    second = [b["x"][0, 0, 0, 0] for b in loader]
    assert first != second


def test_loader_sharding_partitions():
    ds = [{"x": np.full((1,), float(i), np.float32)} for i in range(16)]
    seen = []
    for shard in range(4):
        loader = DataLoader(ds, batch_size=2, shuffle=False, num_shards=4, shard_index=shard)
        for b in loader:
            seen.extend(b["x"].ravel().tolist())
    assert sorted(seen) == list(map(float, range(16)))


def test_loader_sharding_shuffled_disjoint_and_epoch_reshuffle():
    """DistributedSampler parity: shards cover each shuffled epoch with
    EQUAL lengths (wrap-around padding — unequal shard sizes would deadlock
    multi-process collective steps), and set_epoch reshuffles membership."""
    ds = [{"x": np.full((1,), float(i), np.float32)} for i in range(17)]

    def collect(shard, epoch):
        loader = DataLoader(ds, batch_size=4, shuffle=True, seed=7,
                            num_shards=2, shard_index=shard)
        loader.set_epoch(epoch)
        out = []
        for b in loader:
            out.extend(b["x"].ravel().tolist())
        return out

    a0, b0 = collect(0, 0), collect(1, 0)
    assert len(a0) == len(b0) == 9  # ceil(17/2): equal step counts per process
    assert set(a0) | set(b0) == set(map(float, range(17)))  # complete cover
    # exactly one wrap-around duplicate pads 17 -> 18
    assert len(a0) + len(b0) - len(set(a0 + b0)) == 1
    a1, b1 = collect(0, 1), collect(1, 1)
    assert a1 != a0  # epoch reseeds the permutation
    assert set(a1) | set(b1) == set(map(float, range(17)))
    assert set(a1) != set(a0)  # membership actually moved between shards


def test_cli_process_shard_single_process():
    """cli.py wires num_shards/shard_index from the JAX process topology;
    in a single-process run that must be the identity shard."""
    from diffusionremotesensing_tpu.cli import _process_shard

    assert _process_shard() == (1, 0)


def test_loader_pad_to_multiple():
    ds = [{"x": np.zeros((2, 2, 1), np.float32)} for _ in range(5)]
    loader = DataLoader(ds, batch_size=8, pad_to_multiple=8)
    (batch,) = list(loader)
    assert batch["x"].shape[0] == 8
    assert batch["pad_mask"].sum() == 5


def test_downblur_dataset(img_dir):
    ds = SuperresDownBlurDataset(img_dir, magnification_factor=2, blur_radius=0.5, image_size=64)
    assert len(ds) == 6
    item = ds[0]
    assert item["x"].shape == (64, 64, 3)
    assert item["cond"].shape == (32, 32, 3)
    assert 0.0 <= item["x"].min() and item["x"].max() <= 1.0


def test_downblur_random_radius_frozen(img_dir):
    ds = SuperresDownBlurDataset(img_dir, magnification_factor=2, blur_radius="random")
    r = ds.blur_radius
    assert 0.5 <= r <= 1.5
    _ = ds[0]
    assert ds.blur_radius == r  # frozen per-dataset, like the reference quirk


def test_downblurnoise_dataset(img_dir):
    ds = SuperresDownBlurDataset(
        img_dir, magnification_factor=2, blur_radius=0.5, gauss_noise=True, image_size=64
    )
    item = ds[0]
    assert item["cond"].shape == (32, 32, 3)
    assert item["cond"].min() >= 0 and item["cond"].max() <= 1


def test_sar_to_ndvi_dataset(tmp_path):
    (tmp_path / "sar").mkdir()
    (tmp_path / "opt").mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        np.save(tmp_path / "sar" / f"p{i}.npy", rng.uniform(-1, 1, (2, 16, 16)).astype(np.float32))
        np.save(tmp_path / "opt" / f"p{i}.npy", rng.uniform(-1, 1, (1, 16, 16)).astype(np.float32))
    # same filename required in both dirs (reference pairing rule)
    for i in range(3):
        os.rename(tmp_path / "opt" / f"p{i}.npy", tmp_path / "opt" / f"p{i}.npy")
    ds = SarToNdviDataset(str(tmp_path), data_format="numpy")
    item = ds[0]
    assert item["cond"].shape == (16, 16, 2)
    assert item["x"].shape == (16, 16, 1)
    # [-1,1] -> [0,1]
    assert item["x"].min() >= 0.0 and item["x"].max() <= 1.0


def test_image_folder_dataset(class_dir):
    ds = ImageFolderDataset(class_dir, image_size=32)
    assert ds.num_classes == 2
    assert ds.classes == ["Forest", "River"]  # sorted
    assert len(ds) == 6
    item = ds[0]
    assert item["x"].shape == (32, 32, 3)
    assert item["cond"] == 0


def test_matlab_imresize_halves():
    img = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
    out = matlab_imresize(img, 0.5)
    assert out.shape == (8, 8, 3)
    # antialiased downscale preserves the mean closely
    assert abs(out.mean() - img.mean()) < 0.02


@pytest.mark.parametrize("pipeline", [degradation_bsrgan, degradation_bsrgan_plus, soft_degradation_bsrgan])
def test_degradation_pipelines_shapes(pipeline):
    rng_img = np.random.default_rng(0)
    img = rng_img.random((80, 80, 3)).astype(np.float32)
    lq, hq = pipeline(img, sf=2, lq_patchsize=16, rng=123)
    assert lq.shape == (16, 16, 3)
    assert hq.shape == (32, 32, 3)
    assert lq.min() >= 0.0 and lq.max() <= 1.0


def test_degradation_reproducible():
    img = np.random.default_rng(0).random((80, 80, 3)).astype(np.float32)
    a = degradation_bsrgan_plus(img, sf=2, lq_patchsize=16, rng=7)
    b = degradation_bsrgan_plus(img, sf=2, lq_patchsize=16, rng=7)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_bsrgan_dataset_eager(img_dir, tmp_path):
    dest = str(tmp_path / "dump")
    ds = SuperresBSRGANDataset(
        img_dir, magnification_factor=2, model_input_size=16, num_crops=2,
        destination_folder=dest,
    )
    assert len(ds) == 12
    item = ds[0]
    assert item["cond"].shape == (16, 16, 3)
    assert item["x"].shape == (32, 32, 3)
    assert len(os.listdir(os.path.join(dest, "lr"))) == 12
    assert len(os.listdir(os.path.join(dest, "hr"))) == 12


def test_loader_pad_exceeding_batch_rows():
    """Regression: rem > n must wrap-around, not silently under-pad."""
    ds = [{"x": np.full((2, 2, 1), float(i), np.float32)} for i in range(3)]
    loader = DataLoader(ds, batch_size=8, pad_to_multiple=8)
    (batch,) = list(loader)
    assert batch["x"].shape[0] == 8
    assert batch["pad_mask"].tolist() == [1, 1, 1, 0, 0, 0, 0, 0]
    # pad rows are wrap-around repeats of the real rows
    np.testing.assert_array_equal(batch["x"][3], batch["x"][0])
    np.testing.assert_array_equal(batch["x"][5], batch["x"][2])
    np.testing.assert_array_equal(batch["x"][6], batch["x"][0])


def test_loader_num_workers_same_batches():
    """Threaded prefetch must yield identical batches in identical order."""
    ds = [{"x": np.full((2,), float(i), np.float32)} for i in range(17)]
    a = list(DataLoader(ds, batch_size=4, shuffle=True, seed=3))
    b = list(DataLoader(ds, batch_size=4, shuffle=True, seed=3, num_workers=4))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["x"], y["x"])


def test_bsrgan_dataset_parallel_build_matches_serial(img_dir):
    a = SuperresBSRGANDataset(img_dir, 2, 16, num_crops=2, seed=5)
    b = SuperresBSRGANDataset(img_dir, 2, 16, num_crops=2, seed=5, num_workers=4)
    assert len(a) == len(b) == 12
    for i in range(12):
        np.testing.assert_array_equal(a[i]["cond"], b[i]["cond"])
        np.testing.assert_array_equal(a[i]["x"], b[i]["x"])
    # different crops of the same file must differ (per-job seeds)
    assert not np.array_equal(a[0]["cond"], a[1]["cond"]) or not np.array_equal(a[0]["x"], a[1]["x"])


def test_decoded_cache_is_bit_exact_and_bounded(tmp_path):
    """DecodedCache: cached items identical to fresh decodes; budget caps
    insertion; both datasets produce identical outputs with cache on/off."""
    import numpy as np
    from PIL import Image

    from diffusionremotesensing_tpu.data.datasets import (
        DecodedCache,
        DecodeOnlyDataset,
        SuperresDownBlurDataset,
    )

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), np.uint8)).save(d / f"i{i}.png")

    plain = DecodeOnlyDataset(str(d), 16)
    cached = DecodeOnlyDataset(str(d), 16, cache_mb=10)
    for i in range(4):
        np.testing.assert_array_equal(cached[i]["hr_u8"], plain[i]["hr_u8"])
    for i in range(4):  # second epoch: served from cache, still identical
        np.testing.assert_array_equal(cached[i]["hr_u8"], plain[i]["hr_u8"])
    assert len(cached._cache._d) == 4

    p0 = SuperresDownBlurDataset(str(d), 2, 0.5, image_size=16)
    p1 = SuperresDownBlurDataset(str(d), 2, 0.5, image_size=16, cache_mb=10)
    for i in range(4):
        a, b = p0[i], p1[i]
        np.testing.assert_array_equal(a["x"], b["x"])
        np.testing.assert_array_equal(a["cond"], b["cond"])
    # epoch 2 from cache
    for i in range(4):
        a, b = p0[i], p1[i]
        np.testing.assert_array_equal(a["x"], b["x"])
        np.testing.assert_array_equal(a["cond"], b["cond"])

    tiny = DecodedCache(max_mb=0.001)  # 1 KB: one 768-byte item fits, next doesn't
    tiny.put(0, np.zeros((16, 16, 3), np.uint8))
    tiny.put(1, np.zeros((16, 16, 3), np.uint8))
    assert 0 in tiny._d and 1 not in tiny._d


def test_sar_to_ndvi_dataset_2d_npy(tmp_path):
    """Single-channel pairs stored as 2-D .npy arrays get the channel dim
    appended (same as the .pt branch) — a 2-D item would otherwise break the
    NHWC batch contract at the first q_sample."""
    (tmp_path / "sar").mkdir()
    (tmp_path / "opt").mkdir()
    rng = np.random.default_rng(1)
    np.save(tmp_path / "sar" / "p0.npy", rng.uniform(-1, 1, (16, 16)).astype(np.float32))
    np.save(tmp_path / "opt" / "p0.npy", rng.uniform(-1, 1, (16, 16)).astype(np.float32))
    ds = SarToNdviDataset(str(tmp_path), data_format="numpy")
    item = ds[0]
    assert item["cond"].shape == (16, 16, 1)
    assert item["x"].shape == (16, 16, 1)
