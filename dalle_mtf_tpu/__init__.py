"""dalle_mtf_tpu — a TPU-native JAX framework with the capabilities of
EleutherAI/DALLE-mtf.

Two-stage text-to-image training:
  stage 1: a Gumbel-softmax discrete VAE compressing images to codebook tokens
           (reference: src/vae_tf/models.py, src/dalle_mtf/models.py:12-138)
  stage 2: an autoregressive decoder-only transformer over [text ; image]
           token sequences (reference: src/dalle_mtf/models.py:141-416)
plus the sampling path the reference never finished (KV-cache image-token
decode + VAE reconstruction; reference PREDICT paths raise NotImplementedError,
model_fns.py:135-136).

Everything here is built TPU-first: `jax.sharding.Mesh` + NamedSharding over
ICI instead of mesh-tensorflow's layout solver, jit-compiled training steps
instead of TPUEstimator, Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"

from dalle_mtf_tpu.utils.config import Config, fetch_model_params  # noqa: F401
from dalle_mtf_tpu.utils.precision import Policy, get_policy  # noqa: F401
from dalle_mtf_tpu.parallel.mesh import (  # noqa: F401
    parse_mesh_shape,
    parse_layout,
    build_mesh,
    logical_to_pspec,
)
