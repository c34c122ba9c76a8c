from tqdne_tpu.models.autoencoder import AutoencoderKL, Decoder, Encoder
from tqdne_tpu.models.classifier import Classifier
from tqdne_tpu.models.unet import UNet

__all__ = ["UNet", "AutoencoderKL", "Encoder", "Decoder", "Classifier"]
