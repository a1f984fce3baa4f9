"""Decode-time int8 weight quantization.

Autoregressive decoding is weight-bandwidth bound: every generated token
streams all layer weights from HBM. Storing the six big per-layer matrices
as int8 with per-output-column scales halves that traffic; XLA fuses the
dequantize into the per-step matvec reads (measured 1.6x on the MLP matvec
pair inside a 1024-step scan on v5e), so no bf16 copy is ever materialized.

Quantized params keep the same tree structure plus ``<name>_scale`` leaves;
the model's weight getter (DALLE._w) dequantizes transparently, so prefill,
decode, and even training would all see consistent weights. Training still
uses the full-precision master params — this is a serving-path transform
(apply after checkpoint restore).
"""

from __future__ import annotations

import jax.numpy as jnp

# contraction axes per weight (leading axis is the layer stack L)
_SPECS = {
    "wq": (1,),       # [L, E, H, D], contract E
    "wk": (1,),
    "wv": (1,),
    "wo": (1, 2),     # [L, H, D, E], contract H, D
    "w_mlp1": (1,),   # [L, E, I]
    "w_mlp2": (1,),   # [L, I, E]
}


def quantize_layers_int8(params: dict) -> dict:
    """Returns a copy of ``params`` with the big layer weights in int8.

    Scales are per-layer, per-output-column (max-abs / 127), stored under
    ``<name>_scale`` in fp32.
    """
    layers = dict(params["layers"])
    for name, axes in _SPECS.items():
        w = layers[name].astype(jnp.float32)
        scale = jnp.max(jnp.abs(w), axis=axes, keepdims=True) / 127.0
        scale = jnp.maximum(scale, 1e-12)
        layers[name] = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        layers[name + "_scale"] = scale.astype(jnp.float32)
    out = dict(params)
    out["layers"] = layers
    return out
