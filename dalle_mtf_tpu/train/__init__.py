from dalle_mtf_tpu.train.optim import get_optimizer, lr_schedule  # noqa: F401
from dalle_mtf_tpu.train.trainer import Trainer, TrainState  # noqa: F401
