"""CIFAR10 local-batch loader (synthesized pickled batches)."""

import os
import pickle

import numpy as np

from diffusionremotesensing_tpu.data.cifar10 import Cifar10Dataset


def _mk_cifar(tmp_path, n_per_batch=4):
    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.default_rng(0)
    for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        batch = {
            b"data": (rng.random((n_per_batch, 3072)) * 255).astype(np.uint8),
            b"labels": rng.integers(0, 10, n_per_batch).tolist(),
        }
        with open(d / name, "wb") as f:
            pickle.dump(batch, f)
    return str(tmp_path)


def test_cifar10_dataset(tmp_path):
    root = _mk_cifar(tmp_path)
    ds = Cifar10Dataset(root, train=True)
    assert len(ds) == 20
    item = ds[0]
    assert item["x"].shape == (32, 32, 3)
    assert 0 <= item["cond"] < 10
    assert ds.num_classes == 10
    test = Cifar10Dataset(root, train=False)
    assert len(test) == 4


def test_cifar10_resize(tmp_path):
    root = _mk_cifar(tmp_path)
    ds = Cifar10Dataset(root, image_size=16)
    assert ds[0]["x"].shape == (16, 16, 3)
