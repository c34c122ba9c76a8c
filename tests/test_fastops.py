"""Native fastops extension parity vs the numpy reference paths."""

import numpy as np
import pytest

fastops = pytest.importorskip("tqdne_tpu._fastops")


def test_envelope_matches_numpy(rng):
    from tqdne_tpu.data.representation import moving_average_same

    x = rng.standard_normal((3, 3, 1024)).astype(np.float32)
    out = fastops.envelope_representation(x, 128, 1e-6, 1e-6)
    assert out.shape == (3, 6, 1024)
    env = moving_average_same(np.abs(x), 128)
    np.testing.assert_allclose(out[:, :3], x / (env + 1e-6), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        out[:, 3:], np.log(env + 1e-6) - np.log(1e-6) / 2, rtol=1e-5, atol=1e-5
    )


def test_envelope_roundtrip_through_representation(rng):
    from tqdne_tpu.data.representation import MovingAverageEnvelope

    x = rng.standard_normal((2, 3, 2048)).astype(np.float32)
    r = MovingAverageEnvelope()
    back = r.invert_representation(r.get_representation(x))  # native forward
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-5)


def test_validity_indices_match_numpy(rng):
    from tqdne_tpu.data.quality import find_last_oscillating_sample

    t = np.arange(2048) / 100.0
    wf = (np.sin(2 * np.pi * 3 * t) * np.exp(-(((t - 8) / 4) ** 2))).astype(np.float32)
    batch = np.tile(wf, (4, 3, 1)).astype(np.float32)
    batch[0, :, 1024:] = 0
    got = fastops.validity_indices(batch, 20, 2)
    want = find_last_oscillating_sample(batch, 20, 2).max(-1)
    np.testing.assert_array_equal(got, want)


def test_transpose_scrub(rng):
    y = rng.standard_normal((4, 256, 3)).astype(np.float32)
    y[0, 5, 1] = np.nan
    y[1, 6, 2] = np.inf
    z = fastops.transpose_scrub(y)
    assert z.shape == (4, 3, 256)
    assert np.isfinite(z).all()
    np.testing.assert_array_equal(z[2], y[2].T)
