from dalle_mtf_tpu.utils.config import Config, fetch_model_params, image_seq_len  # noqa: F401
from dalle_mtf_tpu.utils.precision import Policy, get_policy  # noqa: F401
