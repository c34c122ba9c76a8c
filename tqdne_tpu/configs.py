"""Project configs and architecture presets.

Mirrors the reference's two-tier config system: dataclass experiment
configs (/root/reference/experiments/config.py) and literal architecture
dicts (/root/reference/tqdne/architectures.py).  Configs derive data
paths from a workdir and carry the representation used to map waveforms
into model space.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

from tqdne_tpu.data import representation as rep

FEATURES_KEYS = (
    "hypocentral_distance",
    "magnitude",
    "vs30",
    "hypocentre_depth",
    "azimuthal_gap",
)


@dataclasses.dataclass
class Config:
    """Base project configuration (config.py:7-30 parity)."""

    workdir: str | Path = "."
    project_name: str = "tqdne-tpu"
    channels: int = 3
    fs: int = 100
    t: int | None = None
    features_keys: tuple[str, ...] = FEATURES_KEYS

    def __post_init__(self):
        path = Path(self.workdir)
        self.datasetdir = path / "data"
        self.outputdir = path / "outputs"
        self.original_datapath = self.datasetdir / "raw_waveforms.h5"
        self.datapath = self.datasetdir / "preprocessed_waveforms.h5"

    def make_representation(self) -> rep.Representation:
        return rep.Identity()


@dataclasses.dataclass
class SpectrogramConfig(Config):
    """128x128 log-spectrogram representation (config.py:33-42 parity)."""

    stft_channels: int = 256
    hop_size: int = 32
    t: int | None = 4064
    griffin_lim_backend: str = "jax"  # invert on the accelerator by default
    # 128 matches the reference's librosa default
    # (/root/reference/tqdne/representation.py:106-108);
    # scripts/gl_iter_sweep.py measures where fewer iterations are
    # waveform-metric-equivalent for deployment (momentum-GL converges
    # geometrically, so most of the 128 may buy nothing measurable).
    griffin_lim_iters: int = 128

    def make_representation(self) -> rep.Representation:
        return rep.LogSpectrogram(
            stft_channels=self.stft_channels,
            hop_size=self.hop_size,
            backend=self.griffin_lim_backend,
            n_iter=self.griffin_lim_iters,
            length=self.t or 4064,
        )


@dataclasses.dataclass
class LatentSpectrogramConfig(SpectrogramConfig):
    """Latent diffusion on spectrograms — the flagship HighFEM config."""

    latent_channels: int = 8
    kl_weight: float = 1e-6


# Canonical magnitude / distance bins (reference config.py:53-58), shared by
# the classification config and the training-time Bin/Grid evaluation plots.
MAG_BINS: tuple[float, ...] = (4, 4.75, 5, 5.5, 6.5, 7.5, 9.1)
DIST_BINS: tuple[float, ...] = (0, 75, 100, 125, 150, 175, 200)


@dataclasses.dataclass
class SpectrogramClassificationConfig(SpectrogramConfig):
    """Magnitude x distance bin classification (config.py:53-58 parity)."""

    mag_bins: tuple[float, ...] = MAG_BINS
    dist_bins: tuple[float, ...] = DIST_BINS

    @property
    def num_classes(self) -> int:
        return (len(self.mag_bins) - 1) * (len(self.dist_bins) - 1)


@dataclasses.dataclass
class MovingAverageEnvelopeConfig(Config):
    """Raw 1D waveform + envelope representation (config.py:61-67 parity)."""

    channels: int = 6  # 3 signal + 3 envelope
    t: int | None = 4064

    def make_representation(self) -> rep.Representation:
        return rep.MovingAverageEnvelope()


@dataclasses.dataclass
class LatentMovingAverageEnvelopeConfig(MovingAverageEnvelopeConfig):
    latent_channels: int = 16
    kl_weight: float = 1e-6


# --- architecture presets (architectures.py parity) -------------------------


def get_1d_autoencoder_configs(config) -> tuple[dict, dict]:
    base = {
        "model_channels": 64,
        "channel_mult": (1, 2, 4),
        "attention_resolutions": (),
        "num_res_blocks": 2,
        "dims": 1,
        "conv_kernel_size": 5,
        "dropout": 0.1,
    }
    encoder = base | {"in_channels": config.channels, "out_channels": config.latent_channels * 2}
    decoder = base | {"in_channels": config.latent_channels, "out_channels": config.channels}
    return encoder, decoder


def get_1d_unet_config(config, in_channels: int, out_channels: int) -> dict:
    return {
        "in_channels": in_channels,
        "out_channels": out_channels,
        "cond_features": len(config.features_keys),
        "dims": 1,
        "conv_kernel_size": 5,
        "model_channels": 64,
        "channel_mult": (1, 2, 4, 4),
        "attention_resolutions": (8,),
        "num_res_blocks": 2,
        "num_heads": 4,
        "dropout": 0.1,
    }


def get_2d_autoencoder_configs(config) -> tuple[dict, dict]:
    base = {
        "model_channels": 64,
        "channel_mult": (1, 2, 4),
        "attention_resolutions": (),
        "num_res_blocks": 2,
        "dims": 2,
        "conv_kernel_size": 3,
        "dropout": 0.1,
    }
    encoder = base | {"in_channels": config.channels, "out_channels": config.latent_channels * 2}
    decoder = base | {"in_channels": config.latent_channels, "out_channels": config.channels}
    return encoder, decoder


def get_2d_unet_config(
    config, in_channels: int, out_channels: int, model_channels: int = 128,
    use_causal_mask: bool = False,
) -> dict:
    return {
        "in_channels": in_channels,
        "out_channels": out_channels,
        "cond_features": len(config.features_keys),
        "dims": 2,
        "conv_kernel_size": 3,
        "model_channels": model_channels,
        "channel_mult": (1, 2, 4, 4),
        "attention_resolutions": (8,),
        "num_res_blocks": 2,
        "num_heads": 4,
        "dropout": 0.1,
        "use_causal_mask": use_causal_mask,
    }


def get_classifier_encoder_config(config, out_channels: int = 256) -> dict:
    """Encoder preset used by train_classifier.py:70-82."""
    return {
        "in_channels": config.channels,
        "model_channels": 64,
        "out_channels": out_channels,
        "channel_mult": (1, 2, 4, 4),
        "attention_resolutions": (8,),
        "num_res_blocks": 2,
        "dims": 2,
        "conv_kernel_size": 3,
        "num_heads": 4,
        "dropout": 0.1,
    }
