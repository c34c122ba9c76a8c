"""I/O convenience tests (MatFileHandler / SeismicParameters parity)."""

import numpy as np
import pytest

from tqdne_tpu.utils.io import SeismicParameters, load_mat


def test_load_mat_roundtrip(tmp_path, rng):
    from scipy.io import savemat

    data = {
        "wfMat": rng.standard_normal((4, 16)).astype(np.float32),
        "meta": {"mag": 6.1, "rhyp": 42.0},
    }
    savemat(tmp_path / "gan.mat", data)
    out = load_mat(tmp_path / "gan.mat")
    np.testing.assert_allclose(out["wfMat"], data["wfMat"])
    assert out["meta"]["mag"] == pytest.approx(6.1)
    assert out["meta"]["rhyp"] == pytest.approx(42.0)


def test_seismic_parameters_dot_access(tmp_path, rng):
    import h5py

    path = tmp_path / "p.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("magnitude", data=rng.uniform(4, 8, 10))
        f.create_dataset("vs30s", data=rng.uniform(200, 800, 10))
        f.create_dataset("waveforms", data=rng.standard_normal((10, 3, 64)).astype(np.float32))

    p = SeismicParameters(path)
    assert p.magnitude.shape == (10,)
    assert p.vs30.shape == (10,)  # alt-spelling fallback (vs30s stored)
    assert p.waveforms.shape == (10, 3, 64)
    assert "magnitude" in p.keys()
    info = p.get_data_info()
    assert info["waveforms"][0] == (10, 3, 64)
    with pytest.raises(AttributeError):
        p.nonexistent
    p.close()
