"""Plot construction + sampling-eval callback unit tests."""

import numpy as np
import pytest

from tqdne_tpu.eval import plots as P
from tqdne_tpu.eval.metrics import MeanSquaredError


@pytest.fixture
def waveforms(rng):
    pred = rng.standard_normal((16, 3, 256)).astype(np.float32)
    target = pred + 0.1 * rng.standard_normal((16, 3, 256)).astype(np.float32)
    mag = rng.uniform(4, 9, 16)
    dist = rng.uniform(1, 199, 16)
    return pred, target, mag, dist


def test_sample_plot(waveforms):
    pred, target, *_ = waveforms
    fig = P.SamplePlot(plot_target=True, fs=100, channel=0)(pred, target)
    assert fig is not None
    img = P.fig_to_image(fig)
    assert img.size[0] > 100


def test_upsampling_plot(waveforms):
    pred, target, *_ = waveforms
    fig = P.UpsamplingSamplePlot(fs=100, channel=1)(pred, target, cond_signal=target)
    assert fig is not None


def test_asd_plot(waveforms):
    pred, target, *_ = waveforms
    fig = P.AmplitudeSpectralDensityPlot(fs=100, channel=2)(pred, target)
    assert fig is not None


def test_waveform_gallery_grid(waveforms):
    pred, target, *_ = waveforms
    # 2 events x 6 samples each, observed = first two targets
    fig = P.WaveformGalleryGrid(fs=100, channel=0, samples_per_event=6)(
        pred[:12], target[:2], event_labels=["M5.0 d=40km", "M6.2 d=110km"]
    )
    assert fig is not None
    assert len(fig.axes) == 2


def test_lognormal_likelihood_matrix_discriminates(rng):
    """Matched generated IMs score a higher likelihood than a shifted set."""
    n = 400
    mag = rng.uniform(4, 8, n)
    dist = rng.uniform(0, 200, n)
    obs = np.exp(rng.standard_normal(n))
    matched = np.exp(rng.standard_normal(n))
    shifted = matched * 100.0
    bins_m, bins_d = [4, 6, 8], [0, 100, 200]
    good = P.lognormal_likelihood_matrix(obs, matched, mag, dist, bins_m, bins_d)
    bad = P.lognormal_likelihood_matrix(obs, shifted, mag, dist, bins_m, bins_d)
    assert np.isfinite(good).all()
    assert (good > bad).all()


def test_cumulative_probability_plot(rng):
    n = 300
    mag = rng.uniform(4, 8, n)
    dist = rng.uniform(0, 200, n)
    obs_im = np.exp(rng.standard_normal(n))
    gen_im = np.exp(rng.standard_normal(n))
    plot = P.CumulativeProbabilityPlot(mag_bins=[4, 6, 8], dist_bins=[0, 100, 200])
    fig = plot(gen_im, obs_im, mag=mag, dist=dist)
    assert fig is not None
    # three-panel variant with a GMM matrix
    gmm = np.ones((2, 2))
    fig3 = plot(gen_im, obs_im, mag=mag, dist=dist, gmm_matrix=gmm)
    assert len(fig3.axes) >= 3


def test_bin_plot(waveforms):
    pred, target, mag, dist = waveforms
    plot = P.BinPlot(MeanSquaredError(channel=0), mag_bins=[4, 6, 9], dist_bins=[0, 100, 200])
    fig = plot(pred, target, mag=mag, dist=dist)
    assert fig is not None
    assert plot.name.startswith("Bin ")


def test_grid_plots(waveforms):
    pred, target, mag, dist = waveforms
    for cls in (P.MovingAverageEnvelopeGrid, P.AmplitudeSpectralDensityGrid):
        fig = cls(fs=100, channel=0, mag_bins=[4, 6, 9], dist_bins=[0, 100, 200])(
            pred, target, mag=mag, dist=dist
        )
        assert fig is not None


def test_sampling_eval_callback(tmp_path, rng):
    """Callback runs sampling, inverts, computes metrics, writes plots."""
    import jax.numpy as jnp

    from tqdne_tpu.data.representation import Identity
    from tqdne_tpu.eval.metrics import AmplitudeSpectralDensity
    from tqdne_tpu.train.callbacks import SamplingEvalCallback
    from tqdne_tpu.train.loop import MetricWriter

    batches = [
        {
            "signal": rng.standard_normal((4, 64, 3)).astype(np.float32),
            "waveform": rng.standard_normal((4, 64, 3)).astype(np.float32),
            "cond": np.zeros((4, 5), np.float32),
        }
    ]

    def fake_sample(params, key, batch):
        return jnp.asarray(batch["signal"]) * 0.5

    cb = SamplingEvalCallback(
        fake_sample, batches, Identity(),
        metrics=[AmplitudeSpectralDensity(fs=100, channel=0, isotropic=True)],
        plots=[P.SamplePlot(plot_target=True, fs=100, channel=0)],
        every_n_epochs=1,
    )

    class FakeTrainer:
        workdir = tmp_path
        writer = MetricWriter(tmp_path)

    class FakeState:
        ema_params = {}

    cb(FakeTrainer(), FakeState(), epoch=0, gstep=10)
    assert (tmp_path / "plots" / "epoch_0").exists()
    records = open(tmp_path / "metrics.jsonl").read()
    assert "eval/AmplitudeSpectralDensity" in records

    # period gating: epoch 1 with every_n=2 does nothing new
    cb2 = SamplingEvalCallback(fake_sample, batches, Identity(), every_n_epochs=2)
    cb2(FakeTrainer(), FakeState(), epoch=1, gstep=20)  # (1+1) % 2 == 0 -> runs
    cb2(FakeTrainer(), FakeState(), epoch=2, gstep=30)  # (2+1) % 2 == 1 -> skips


def test_callback_bin_grid_plots(tmp_path, rng):
    """Bin/Grid figures during training: conds are denormalized with the
    dataset feature stats and fed to the plots as mag/dist (VERDICT #10)."""
    import jax.numpy as jnp

    from tqdne_tpu.data.representation import Identity
    from tqdne_tpu.eval.metrics import MeanSquaredError
    from tqdne_tpu.train.callbacks import SamplingEvalCallback
    from tqdne_tpu.train.loop import MetricWriter

    keys = ("hypocentral_distance", "magnitude", "vs30",
            "hypocentre_depth", "azimuthal_gap")
    stats = np.array([[100.0, 50.0], [5.5, 1.0], [400.0, 100.0],
                      [20.0, 10.0], [90.0, 30.0]])
    raw = np.stack([
        rng.uniform(1, 199, 24), rng.uniform(4.1, 9.0, 24),
        rng.uniform(200, 800, 24), rng.uniform(2, 60, 24),
        rng.uniform(10, 300, 24),
    ], axis=1).astype(np.float32)
    cond = (raw - stats[:, 0]) / stats[:, 1]
    batches = [{
        "signal": rng.standard_normal((24, 64, 3)).astype(np.float32),
        "waveform": rng.standard_normal((24, 64, 3)).astype(np.float32),
        "cond": cond.astype(np.float32),
    }]

    def fake_sample(params, key, batch):
        return jnp.asarray(batch["signal"]) * 0.5

    cb = SamplingEvalCallback(
        fake_sample, batches, Identity(),
        plots=[
            P.BinPlot(MeanSquaredError(channel=0), mag_bins=[4, 6, 9.1],
                      dist_bins=[0, 100, 200]),
            P.MovingAverageEnvelopeGrid(100, 0, [4, 6, 9.1], [0, 100, 200],
                                        window_size=16),
            P.AmplitudeSpectralDensityGrid(100, 0, [4, 6, 9.1], [0, 100, 200]),
        ],
        every_n_epochs=1,
        feature_stats=stats,
        features_keys=keys,
    )

    class FakeTrainer:
        workdir = tmp_path
        writer = MetricWriter(tmp_path)

    class FakeState:
        ema_params = {}

    cb(FakeTrainer(), FakeState(), epoch=0, gstep=1)
    pngs = sorted(p.name for p in (tmp_path / "plots" / "epoch_0").glob("*.png"))
    assert any("Bin" in n for n in pngs), pngs
    assert any("MovingAverageEnvelopeGrid" in n for n in pngs), pngs
    assert any("AmplitudeSpectralDensityGrid" in n for n in pngs), pngs


def test_callback_repeated_failures_surface(tmp_path, rng):
    """A metric that fails every eval must raise after N consecutive
    failures instead of scrolling by as warnings forever."""
    import jax.numpy as jnp

    from tqdne_tpu.data.representation import Identity
    from tqdne_tpu.train.callbacks import SamplingEvalCallback
    from tqdne_tpu.train.loop import MetricWriter

    batches = [{
        "signal": rng.standard_normal((4, 64, 3)).astype(np.float32),
        "waveform": rng.standard_normal((4, 64, 3)).astype(np.float32),
    }]

    def fake_sample(params, key, batch):
        return jnp.asarray(batch["signal"])

    class AlwaysBroken:
        name = "AlwaysBroken"

        def __call__(self, pred, target):
            raise ValueError("boom")

    cb = SamplingEvalCallback(
        fake_sample, batches, Identity(), metrics=[AlwaysBroken()],
        every_n_epochs=1, max_consecutive_failures=3,
    )

    class FakeTrainer:
        workdir = tmp_path
        writer = MetricWriter(tmp_path)

    class FakeState:
        ema_params = {}

    cb(FakeTrainer(), FakeState(), epoch=0, gstep=1)  # warn
    cb(FakeTrainer(), FakeState(), epoch=1, gstep=2)  # warn
    with pytest.raises(RuntimeError, match="3 sampling evals in a row"):
        cb(FakeTrainer(), FakeState(), epoch=2, gstep=3)


def test_callback_batch_size_mismatch_raises(tmp_path, rng):
    import jax.numpy as jnp

    from tqdne_tpu.data.representation import Identity
    from tqdne_tpu.train.callbacks import SamplingEvalCallback
    from tqdne_tpu.train.loop import MetricWriter

    batches = [{
        "signal": rng.standard_normal((4, 64, 3)).astype(np.float32),
        "waveform": rng.standard_normal((4, 64, 3)).astype(np.float32),
    }]

    def bad_sample(params, key, batch):
        return jnp.asarray(batch["signal"])[:2]  # drops half the batch

    cb = SamplingEvalCallback(bad_sample, batches, Identity(), every_n_epochs=1)

    class FakeTrainer:
        workdir = tmp_path
        writer = MetricWriter(tmp_path)

    class FakeState:
        ema_params = {}

    with pytest.raises(ValueError, match="must preserve batch size"):
        cb(FakeTrainer(), FakeState(), epoch=0, gstep=1)
