from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig  # noqa: F401
from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig  # noqa: F401
