"""PairedDataset (SeisbenchDataset equivalent) tests."""

import numpy as np
import pytest

from tqdne_tpu.data import representation as rep
from tqdne_tpu.data.dataset import PairedDataset


@pytest.fixture
def paired(tmp_path, rng):
    import h5py

    n, c, t = 30, 3, 512
    for name in ("obs", "syn"):
        with h5py.File(tmp_path / f"{name}.h5", "w") as f:
            f.create_dataset("waveforms", data=rng.standard_normal((n, c, t)).astype(np.float32))
            snr = np.full((n, c), 5.0, np.float32)
            snr[:5] = 0.5  # filtered out (low SNR)
            f.create_dataset("snr", data=snr)
            ratio = np.ones(n, np.float32)
            ratio[5:8] = 50.0  # filtered out (bad data ratio)
            f.create_dataset("data_ratio", data=ratio)
    return tmp_path


def test_paired_dataset_filters_and_split(paired):
    train = PairedDataset(paired / "obs.h5", paired / "syn.h5", rep.Identity(), cut=256)
    test = PairedDataset(paired / "obs.h5", paired / "syn.h5", rep.Identity(), cut=256,
                         training=False)
    # 30 - 8 filtered = 22 -> 19 train / 3 test
    assert len(train) + len(test) == 22
    assert len(test) == 22 - int(22 * 0.9)
    assert not set(train.indices) & set(test.indices)
    # filtered indices never appear
    assert set(train.indices).isdisjoint(range(8))
    train.close()
    test.close()


def test_paired_batch_contract(paired):
    ds = PairedDataset(paired / "obs.h5", paired / "syn.h5",
                       rep.MovingAverageEnvelope(), cut=512)
    batch = ds.load_batch(np.arange(4))
    assert batch["signal"].shape == (4, 6, 512)
    assert batch["cond_signal"].shape == (4, 6, 512)
    assert batch["waveform"].shape == (4, 3, 512)
    assert np.isfinite(batch["cond_signal"]).all()
    ds.close()


def test_paired_cut_pads_short_records(paired):
    ds = PairedDataset(paired / "obs.h5", paired / "syn.h5", rep.Identity(), cut=1024)
    batch = ds.load_batch(np.arange(2))
    assert batch["signal"].shape == (2, 3, 1024)
    assert (batch["signal"][..., 512:] == 0).all()  # zero padded
    ds.close()
