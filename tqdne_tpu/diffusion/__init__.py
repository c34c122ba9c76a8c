from tqdne_tpu.diffusion.consistency import ConsistencyConfig
from tqdne_tpu.diffusion.ddpm import DDPMConfig
from tqdne_tpu.diffusion.edm import EDMConfig

__all__ = ["EDMConfig", "ConsistencyConfig", "DDPMConfig"]
