"""Decode-time weight quantization (int8 and packed int4).

Autoregressive decoding is weight-bandwidth bound: every generated token
streams all layer weights from HBM. Storing the big per-layer matrices
as int8 with per-output-column scales halves that traffic (measured 1.6x
on the MLP matvec pair inside a 1024-step scan on v5e); int4 packs two
values per byte along a contraction axis for another 2x stream reduction.

Int4 packing is SPLIT-HALF, not interleaved: byte row r of a packed
contraction axis holds (w[r], w[r + K/2]) in its (low, high) nibbles. The
consuming matmul then decomposes into two matmuls against same-shape
ELEMENTWISE nibble views ((p << 4) >> 4 and p >> 4) — the exact pattern
XLA already fuses into the operand read for int8's scale multiply. The
earlier even/odd interleave needed a stack+reshape "unpack" that XLA
materialized to HBM (read packed + write wide + re-read), which made int4
decode 2.5x SLOWER than int8 on v5e.

The output projection w_out [E, V] is quantized too — at dalle_coco scale
it is ~26% of the decode weight stream (53.6M params) and previously
streamed as fp32 master weights through ``_last_logits``.

Quantized params keep the same tree structure plus ``<name>_scale`` leaves
(int4 additionally ``<name>_int4`` markers); the model's weight access
(DALLE._einsum_w / _last_logits) dequantizes transparently. Training still
uses the full-precision master params — this is a serving-path transform
(apply after checkpoint restore).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_decode_weights(params: dict, dtype=jnp.bfloat16) -> dict:
    """Serving-path transform for UNQUANTIZED decoding: cast the fp32
    master matrices (ndim >= 2) to the compute dtype ONCE, outside the
    decode scan. XLA does not reliably fuse an fp32->bf16 convert into
    matvec operand reads — measured on v5e, leaving the convert inside the
    per-token scan cost +0.35 s/image at dalle_coco scale versus fp32
    streaming, and bf16-at-rest halves the stream outright. 1D params
    (biases, LN gains) stay fp32 — they are noise-scale traffic."""
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 and a.ndim >= 2
        else a,
        params,
    )

# contraction axes per weight (leading axis is the layer stack L)
_SPECS = {
    "wq": (1,),       # [L, E, H, D], contract E
    "wk": (1,),
    "wv": (1,),
    "wo": (1, 2),     # [L, H, D, E], contract H, D
    "w_mlp1": (1,),   # [L, E, I]
    "w_mlp2": (1,),   # [L, I, E]
}


def _quantize_one(w, axes, qmax):
    """(int values, fp32 scale) with per-output-column scale = max-abs/qmax
    over the contraction ``axes`` (keepdims)."""
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=axes, keepdims=True) / qmax
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w / scale), -qmax, qmax).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_layers_int8(params: dict) -> dict:
    """Returns a copy of ``params`` with the big layer weights and the
    output projection in int8 + per-output-column ``<name>_scale`` fp32."""
    layers = dict(params["layers"])
    for name, axes in _SPECS.items():
        q, scale = _quantize_one(layers[name], axes, 127.0)
        layers[name] = q
        layers[name + "_scale"] = scale
    out = dict(params)
    out["layers"] = layers
    q, scale = _quantize_one(params["w_out"], (0,), 127.0)
    out["w_out"] = q
    out["w_out_scale"] = scale
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
    even-sized), split-half: byte r holds (q[r], q[r + n/2]) as
    (low, high) nibbles — so unpacking is two same-shape elementwise views
    plus a cheap concat, never a strided interleave."""
    n = q.shape[axis]
    assert n % 2 == 0, (q.shape, axis)
    lo = jnp.take(q, jnp.arange(0, n // 2), axis=axis)
    hi = jnp.take(q, jnp.arange(n // 2, n), axis=axis)
    return ((lo & 0xF) | (hi << 4)).astype(jnp.int8)


def nibble_views(packed: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(low, high) int8 views in [-7, 7] — pure elementwise shift/mask on
    the packed bytes, fusable into a consuming matmul's operand read."""
    return (packed << 4) >> 4, packed >> 4  # arithmetic shifts sign-extend


def unpack_int4(packed: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inverse of pack_int4 -> int8 values in [-7, 7]. The hot paths use
    nibble_views directly (two matmuls); this materializing form is for
    tests and generic consumers."""
    lo, hi = nibble_views(packed)
    return jnp.concatenate([lo, hi], axis=axis)


def quantize_layers_int4(params: dict) -> dict:
    """Returns a copy of ``params`` with the big layer weights and the
    output projection packed int4 (two values per byte, split-half along
    the contraction axis) + per-output-column scales (max-abs / 7) under
    ``<name>_scale`` and a ``<name>_int4`` marker leaf. 4x less HBM weight
    stream than bf16."""
    layers = dict(params["layers"])
    for name, axes in _SPECS.items():
        q, scale = _quantize_one(layers[name], axes, 7.0)
        layers[name] = pack_int4(q, _PACK_AXIS[name])
        layers[name + "_scale"] = scale
        # presence marker, stacked [L] so the model's layer scan can carry it
        layers[name + "_int4"] = jnp.ones((q.shape[0],), jnp.int8)
    out = dict(params)
    out["layers"] = layers
    q, scale = _quantize_one(params["w_out"], (0,), 7.0)
    out["w_out"] = pack_int4(q, 0)
    out["w_out_scale"] = scale
    out["w_out_int4"] = jnp.ones((), jnp.int8)
    return out
