"""Decode-time weight quantization (int8 and packed int4).

Autoregressive decoding is weight-bandwidth bound: every generated token
streams all layer weights from HBM. Storing the six big per-layer matrices
as int8 with per-output-column scales halves that traffic (measured 1.6x
on the MLP matvec pair inside a 1024-step scan on v5e); int4 packs two
values per byte along a contraction axis for another 2x stream reduction —
the unpack (shift/mask/convert) is elementwise, so XLA fuses it into the
matmul read and no wide copy is ever materialized.

Quantized params keep the same tree structure plus ``<name>_scale`` leaves
(int4 additionally ``<name>_int4`` markers); the model's weight getter
(DALLE._w) dequantizes transparently, so prefill, decode, and even training
would all see consistent weights. Training still uses the full-precision
master params — this is a serving-path transform (apply after checkpoint
restore).
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


# int4 packing axis per weight: the FIRST contraction axis (axis indices
# include the leading [L] layer stack). Packing along a contraction dim
# keeps the per-output-column scale layout identical to int8's.
_PACK_AXIS = {
    "wq": 1,       # [L, E, H, D]
    "wk": 1,
    "wv": 1,
    "wo": 2,       # [L, H, D, E] — D is even (head_dim), H may be odd
    "w_mlp1": 1,   # [L, E, I]
    "w_mlp2": 1,   # [L, I, E]
}


def pack_int4(q: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Pack int8 values in [-7, 7] two-per-byte along ``axis`` (must be
    even-sized): low nibble = element 2i, high nibble = element 2i+1."""
    n = q.shape[axis]
    assert n % 2 == 0, (q.shape, axis)
    lo = jnp.take(q, jnp.arange(0, n, 2), axis=axis)
    hi = jnp.take(q, jnp.arange(1, n, 2), axis=axis)
    return ((lo & 0xF) | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inverse of pack_int4 -> int8 values in [-7, 7]; elementwise
    shift/mask, fusable into the consuming matmul's operand read."""
    lo = (packed << 4) >> 4  # arithmetic shifts sign-extend the low nibble
    hi = packed >> 4
    stacked = jnp.stack([lo, hi], axis=axis + 1)
    shape = list(packed.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def quantize_layers_int4(params: dict) -> dict:
    """Returns a copy of ``params`` with the big layer weights packed int4
    (two values per byte along the contraction axis) + per-output-column
    scales (max-abs / 7) under ``<name>_scale`` and a ``<name>_int4``
    marker leaf. 4x less HBM weight stream than bf16."""
    layers = dict(params["layers"])
    for name, axes in _SPECS.items():
        w = layers[name].astype(jnp.float32)
        scale = jnp.max(jnp.abs(w), axis=axes, keepdims=True) / 7.0
        scale = jnp.maximum(scale, 1e-12)
        q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int8)
        layers[name] = pack_int4(q, _PACK_AXIS[name])
        layers[name + "_scale"] = scale.astype(jnp.float32)
        # presence marker, stacked [L] so the model's layer scan can carry it
        layers[name + "_int4"] = jnp.ones((w.shape[0],), jnp.int8)
    out = dict(params)
    out["layers"] = layers
    return out
