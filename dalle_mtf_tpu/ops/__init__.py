from dalle_mtf_tpu.ops.gumbel import gumbel_softmax  # noqa: F401
from dalle_mtf_tpu.ops.losses import (  # noqa: F401
    mse_loss,
    softmax_cross_entropy_with_logits,
)
from dalle_mtf_tpu.ops.attention import causal_attention, attention_reference  # noqa: F401
