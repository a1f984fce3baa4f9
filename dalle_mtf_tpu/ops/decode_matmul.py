"""Single-pass streaming dequant matmuls for the decode hot path.

Autoregressive decode is weight-stream bound: each generated token reads
every layer matrix plus the output projection from HBM exactly once, with
a tiny [M <= 32, K] activation. Leaving the dequant (int8 convert+scale,
int4 nibble split) to XLA is unreliable at matvec geometry — profiling on
v5e showed the w_out int8 dequant NOT fusing into the matmul read (the
bf16 copy hit HBM every step), and an fp32->bf16 convert of unquantized
masters cost more than it saved. These Pallas kernels make the streaming
contract explicit: the packed/int8 bytes are read ONCE per token, dequant
happens in VMEM/registers, and the MXU sees bf16 tiles.

Shapes are 2D here; the model's call sites (dalle.py::_einsum_w /
_last_logits) flatten their einsum geometry to [M, K] x [K, N] and reshape
back. Serving-path only (no VJP). Grid is over N blocks; a ragged tail
(w_out's 50771 vocab) is handled by a plain einsum on the sliced tail —
<= BN-1 columns, negligible traffic.

MEASURED VERDICT (v5e, dalle_coco batch-1 decode): these kernels LOSE to
the XLA einsum forms — int8 1.161 s vs 0.921 s, int4 0.942 s vs 0.905 s
per image. The decode step makes ~73 weight-matmul calls per token; each
pallas custom-call launch costs ~3 us that XLA's fused schedule does not
pay, and at matvec shapes that overhead exceeds what explicit streaming
saves. cfg.decode_kernels therefore defaults to False; the kernels remain
an option for batched-decode geometries where the launch cost amortizes
across rows.

Reference capability parity: the reference's PREDICT path streamed full
fp32 mtf weights per step (model_fns.py:112-136); this is the tpu-native
replacement at 1/4 (int4) the HBM traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BN = 512       # output-column block
M_PAD = 8      # sublane pad for the tiny activation rows


def _int8_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[...].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = acc * s_ref[...]


def _int4_kernel(xl_ref, xh_ref, w_ref, s_ref, o_ref):
    # nibble extraction in i32 registers — Mosaic cannot legalize shifts on
    # i8 vectors (arith.shli); the i8->i32 convert happens after the byte
    # load, so HBM traffic is still the packed bytes
    p = w_ref[...].astype(jnp.int32)
    lo = ((p << 28) >> 28).astype(jnp.bfloat16)  # sign-extend low nibble
    hi = (p >> 4).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        xl_ref[...], lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = acc + jax.lax.dot_general(
        xh_ref[...], hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = acc * s_ref[...]


def _pad_rows(x, m_pad):
    m = x.shape[0]
    if m == m_pad:
        return x
    return jnp.pad(x, ((0, m_pad - m), (0, 0)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_matmul(x, w, scale, interpret: bool = False):
    """x [M, K] bf16, w [K, N] int8, scale [1, N] f32 -> [M, N] f32.

    Per-output-column dequant fused into the single streaming read of w.
    """
    m, k = x.shape
    n = w.shape[1]
    m8 = max(M_PAD, m)
    xp = _pad_rows(x, m8)
    n0 = (n // BN) * BN
    parts = []
    if n0:
        out = pl.pallas_call(
            _int8_kernel,
            grid=(n0 // BN,),
            in_specs=[
                pl.BlockSpec((m8, k), lambda j: (0, 0)),
                pl.BlockSpec((k, BN), lambda j: (0, j)),
                pl.BlockSpec((1, BN), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((m8, BN), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((m8, n0), jnp.float32),
            interpret=interpret,
        )(xp, w[:, :n0], scale[:, :n0])
        parts.append(out[:m])
    if n0 < n:
        wt = w[:, n0:].astype(jnp.bfloat16) * scale[:, n0:].astype(jnp.bfloat16)
        parts.append(
            jnp.einsum("mk,kn->mn", x, wt, preferred_element_type=jnp.float32)
        )
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul(x_lo, x_hi, packed, scale, interpret: bool = False):
    """x_lo/x_hi [M, Kp] bf16, packed [Kp, N] int8 (split-half nibbles,
    quantize.py), scale [1, N] f32 -> [M, N] f32.

    The packed bytes are read once; both nibble halves dequantize in VMEM.
    Callers build x_lo/x_hi to match the weight's packing structure (a
    contiguous half-split of the contraction axis for everything except wo,
    which splits per-head head_dim halves).
    """
    m, kp = x_lo.shape
    n = packed.shape[1]
    m8 = max(M_PAD, m)
    xl = _pad_rows(x_lo, m8)
    xh = _pad_rows(x_hi, m8)
    n0 = (n // BN) * BN
    parts = []
    if n0:
        out = pl.pallas_call(
            _int4_kernel,
            grid=(n0 // BN,),
            in_specs=[
                pl.BlockSpec((m8, kp), lambda j: (0, 0)),
                pl.BlockSpec((m8, kp), lambda j: (0, 0)),
                pl.BlockSpec((kp, BN), lambda j: (0, j)),
                pl.BlockSpec((1, BN), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((m8, BN), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((m8, n0), jnp.float32),
            interpret=interpret,
        )(xl, xh, packed[:, :n0], scale[:, :n0])
        parts.append(out[:m])
    if n0 < n:
        pt = packed[:, n0:]
        st = scale[:, n0:].astype(jnp.bfloat16)
        lo = ((pt << 4) >> 4).astype(jnp.bfloat16) * st
        hi = (pt >> 4).astype(jnp.bfloat16) * st
        tail = jnp.einsum(
            "mk,kn->mn", x_lo, lo, preferred_element_type=jnp.float32
        ) + jnp.einsum("mk,kn->mn", x_hi, hi, preferred_element_type=jnp.float32)
        parts.append(tail)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
