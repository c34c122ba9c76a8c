"""tqdne-tpu: TPU-native generative seismic-waveform framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
highfem/tqdne ("This Quake Does Not Exist"): latent EDM diffusion models
that synthesize 3-component, 100 Hz seismic accelerograms conditioned on
scalar source/site features, plus the training, evaluation, data and CLI
stack around them.  See README.md / DESIGN.md / PARITY.md.
"""

__version__ = "0.1.0"

__all__ = [
    "__version__",
    "EDMConfig",
    "ConsistencyConfig",
    "DDPMConfig",
    "UNet",
    "AutoencoderKL",
    "Classifier",
    "configs",
]


def __getattr__(name):  # lazy re-exports (keep `import tqdne_tpu` light)
    if name == "EDMConfig":
        from tqdne_tpu.diffusion.edm import EDMConfig

        return EDMConfig
    if name == "ConsistencyConfig":
        from tqdne_tpu.diffusion.consistency import ConsistencyConfig

        return ConsistencyConfig
    if name == "DDPMConfig":
        from tqdne_tpu.diffusion.ddpm import DDPMConfig

        return DDPMConfig
    if name == "UNet":
        from tqdne_tpu.models.unet import UNet

        return UNet
    if name == "AutoencoderKL":
        from tqdne_tpu.models.autoencoder import AutoencoderKL

        return AutoencoderKL
    if name == "Classifier":
        from tqdne_tpu.models.classifier import Classifier

        return Classifier
    if name == "configs":
        import importlib

        return importlib.import_module("tqdne_tpu.configs")
    raise AttributeError(name)
