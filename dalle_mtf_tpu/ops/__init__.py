from dalle_mtf_tpu.ops.gumbel import gumbel_softmax  # noqa: F401
from dalle_mtf_tpu.ops.losses import (  # noqa: F401
    mse_loss,
    softmax_cross_entropy_with_logits,
)
from dalle_mtf_tpu.ops.attention import causal_attention, attention_reference  # noqa: F401
from dalle_mtf_tpu.ops.ring_attention import ring_attention, ring_attention_sharded  # noqa: F401
from dalle_mtf_tpu.ops.xent_fused import chunked_softmax_xent  # noqa: F401
from dalle_mtf_tpu.ops.pad import pad  # noqa: F401
