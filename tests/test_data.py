"""Dataset / pipeline tests: split determinism parity, batch layout,
synthetic storage contract."""

import numpy as np
import pytest

from tqdne_tpu.data import representation as rep
from tqdne_tpu.data.dataset import (
    ClassificationDataset,
    Dataset,
    make_synthetic_dataset,
    split_indices,
)
from tqdne_tpu.data.pipeline import BatchLoader, to_channels_first, to_channels_last


@pytest.fixture(scope="module")
def h5path(tmp_path_factory):
    return make_synthetic_dataset(tmp_path_factory.mktemp("data") / "preprocessed.h5", n=40, t=512)


def test_split_parity_with_reference_semantics():
    """Same permutation the reference computes (dataset.py:34-51)."""
    n = 100
    rng = np.random.default_rng(seed=42)
    shuffled = rng.permutation(np.arange(n))
    np.testing.assert_array_equal(split_indices(n, "train"), shuffled[:85])
    np.testing.assert_array_equal(split_indices(n, "validation"), shuffled[85:90])
    np.testing.assert_array_equal(split_indices(n, "test"), shuffled[90:])
    np.testing.assert_array_equal(split_indices(n, "train_validation"), shuffled[:90])
    np.testing.assert_array_equal(split_indices(n, "full"), np.arange(n))
    # splits are disjoint and cover everything
    all_idx = np.concatenate(
        [split_indices(n, s) for s in ("train", "validation", "test")]
    )
    assert len(np.unique(all_idx)) == n


def test_dataset_getitem_contract(h5path):
    ds = Dataset(h5path, rep.Identity(), cut=256, cond=True, split="train")
    item = ds[0]
    assert item["signal"].shape == (3, 256)
    assert item["waveform"].shape == (3, 256)
    assert item["cond"].shape == (5,)
    assert item["signal"].dtype == np.float32
    ds.close()


def test_dataset_batch_order(h5path):
    """load_batch must preserve the requested (shuffled) order."""
    ds = Dataset(h5path, rep.Identity(), split="train")
    idx = np.array([5, 0, 2, 2])  # includes a duplicate
    batch = ds.load_batch(idx)
    for j, i in enumerate(idx):
        np.testing.assert_array_equal(batch["signal"][j], ds[int(i)]["signal"])
    ds.close()


def test_classification_labels(h5path):
    mag_bins = [4, 5, 6, 9.1]
    dist_bins = [0, 100, 200]
    ds = ClassificationDataset(h5path, rep.Identity(), mag_bins, dist_bins, split="full")
    assert ds.num_classes == 6
    dist = ds.file["hypocentral_distance"][:]
    mag = ds.file["magnitude"][:]
    want = (np.digitize(dist, dist_bins) - 1) * 3 + np.digitize(mag, mag_bins) - 1
    np.testing.assert_array_equal(ds.labels, want)
    w = ds.get_class_weights()
    assert w.shape == (6,)
    assert (w > 0).all()
    ds.close()


def test_batch_loader_layout_and_epochs(h5path):
    ds = Dataset(h5path, rep.MovingAverageEnvelope(), cut=512, cond=True, split="train")
    loader = BatchLoader(ds, batch_size=8, shuffle=True, seed=1, prefetch=2)
    batches = list(loader)
    assert len(batches) == len(ds) // 8
    b = batches[0]
    assert b["signal"].shape == (8, 512, 6)  # channels-last on device
    assert b["cond"].shape == (8, 5)
    # round-trip layout helpers
    np.testing.assert_array_equal(
        to_channels_last({"signal": to_channels_first(b["signal"])})["signal"], b["signal"]
    )
    # different epochs shuffle differently
    batches2 = list(loader)
    assert not np.array_equal(batches[0]["signal"], batches2[0]["signal"])
    ds.close()


def test_batch_loader_sharded(h5path):
    import jax

    from tqdne_tpu.parallel.mesh import batch_sharding, make_mesh

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"
    mesh = make_mesh()
    ds = Dataset(h5path, rep.Identity(), cut=256, cond=True, split="train")
    loader = BatchLoader(ds, batch_size=16, sharding=batch_sharding(mesh), prefetch=0)
    b = next(iter(loader))
    assert b["signal"].sharding.num_devices == 8
    assert b["signal"].shape == (16, 256, 3)
    ds.close()
