"""Fused causal attention (Pallas flash attention) + local-window variant.

The reference delegated attention to black-box mtf kernels:
``mtf_transformer.attention.attention`` with an additive -1e10 causal mask
materialized over the full [seq, seq] square (src/dalle_mtf/models.py:221-227,
287-299) and ``local_attention_1d`` with a radius (models.py:257-273). Here
the hot path is Pallas kernels: no materialized mask or [S, S] score tensor
in HBM, bf16 in / fp32 accumulate on the MXU. The local variant is the same
kernel with a band mask — unlike the reference, it is actually reachable
(``attention_type: "local"`` in config).

Three kernel families, dispatched on padded sequence length:

- **Wedge** (default for ``s_pad <= WHOLE_ROW_MAX_SEQ`` — covers both the
  dalle_coco hot path at S=1280 and dalle_12B at S=2560): one pallas_call
  per q-block i with a STATIC key extent (i+1)*block, so blocks above the
  causal diagonal are never computed. Within a call: single matmul pair,
  one-shot softmax, no loops, no VMEM scratch, in-kernel iota mask.
  Measured 0.76 ms fwd / 2.69 ms fused bwd at 16x8x1280x128 bf16 on v5e
  with dispatch amortized (see BENCH.md's microbench-floor correction).

- **Whole-row** (``DALLE_TPU_ATTN_SHORT=wr``): one program per
  (batch*head, q-block) computes the FULL score row [block_q, S] — full
  S^2 work, no loop machinery; the wedge's final call degenerates to it.

- **Online-softmax loop** (longer sequences): classic flash attention —
  the [block_q, S] score row no longer fits VMEM, so kv blocks stream
  through running (m, l) statistics.

Backward pass: fully fused Pallas kernels (FlashAttention-2 style) in the
same flavors — wedge/whole-row fuse dQ(block i) and dK/dV(block i) into
ONE program sharing resident inputs. The forward saves only
(q, k, v, out, lse) — lse lane-replicated to [S, 128] so per-row scalars
stay TPU-tileable — and the backward rematerializes score blocks on the
fly: no [S, S] tensor ever exists in HBM in either direction (the
``BACKWARD_IMPL = "xla"`` switch keeps the XLA rematerialization path
selectable per deployment). Loop-path backward prefers larger tiles than
forward (DEFAULT_BWD_BLOCK).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
# backward kernels prefer bigger tiles (measured on v5e at dalle_coco shapes)
DEFAULT_BWD_BLOCK = 640
NEG_INF = -1e10  # matches the reference's additive mask value (models.py:227)


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = True,
    window: int | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """XLA reference attention. q,k,v: [B, H, S, D] -> [B, H, S, D].

    Semantics match mtf attention with the additive causal mask
    (models.py:221-227): scores scaled by D^-0.5, mask adds -1e10;
    ``dropout_rate`` drops attention *weights* (mtf attention's
    dropout_rate arg, models.py:294-299) with inverted scaling.
    """
    *_, s_q, d = q.shape
    s_k = k.shape[-2]
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    i = jnp.arange(s_q)[:, None] + (s_k - s_q)
    j = jnp.arange(s_k)[None, :]
    mask = jnp.zeros((s_q, s_k), jnp.float32)
    if causal:
        mask = jnp.where(j > i, NEG_INF, mask)
    if window is not None:
        mask = jnp.where(i - j >= window, NEG_INF, mask)
    scores = scores + mask
    weights = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = 1.0 - dropout_rate
        keep_mask = jax.random.bernoulli(dropout_rng, keep, weights.shape)
        weights = jnp.where(keep_mask, weights / keep, 0.0)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref=None,
    *, block_k: int, window, seq_len: int, with_lse: bool = False,
):
    """One (batch*head, q-block) program of causal flash attention.

    q_ref: [block_q, D]; k_ref/v_ref: [S, D] (whole sequence for this head —
    at DALLE's scale S*D*2B is a few hundred KB, comfortably VMEM-resident);
    o_ref: [block_q, D].
    """
    block_q = q_ref.shape[0]
    d = q_ref.shape[1]
    qi = pl.program_id(1)
    q_offset = qi * block_q

    scale = 1.0 / math.sqrt(d)
    # Keep q/k in their native (bf16) dtype INTO the MXU and accumulate in
    # fp32 (preferred_element_type): on v5e the fp32 matmul path runs at a
    # fraction of the 197 TF/s bf16 rate, so pre-casting to fp32 here would
    # throttle the whole kernel. The scale is applied to the fp32 scores.
    q = q_ref[...]

    # Causal: only kv blocks whose start is <= the last query row.
    num_kv_blocks = jax.lax.div(q_offset + block_q - 1, block_k) + 1

    row_ids = q_offset + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(j, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [block_q, block_k]
        col_ids = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = col_ids > row_ids
        # Keys beyond the true sequence length (block padding) always sit at
        # col > row for causal use, but guard explicitly for safety.
        mask = jnp.logical_or(mask, col_ids >= seq_len)
        if window is not None:
            mask = jnp.logical_or(mask, row_ids - col_ids >= window)
        s = jnp.where(mask, NEG_INF, s)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv_blocks, body, (acc, m0, l0))
    o_ref[...] = (acc / l).astype(o_ref.dtype)
    if lse_ref is not None:
        # lane-replicated log-sum-exp of the scaled scores, for the backward
        # kernels (the [*, 128] replication keeps per-row scalars tileable)
        lse = m + jnp.log(l)
        lse_ref[...] = jnp.broadcast_to(lse, (block_q, LSE_LANES))


LSE_LANES = 128


def _pad_seq(x, s_pad):
    s = x.shape[-2]
    if s_pad == s:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, s_pad - s), (0, 0)])


# ---------------------------------------------------------------- whole-row
# Short-sequence kernels: the full [block, S] score row lives in VMEM and the
# softmax is one-shot (no online statistics). See the module docstring for
# why this beats the online-softmax loop at DALLE shapes.

WHOLE_ROW_MAX_SEQ = 3072  # wedge regime bound: above this the [block, S]
# fp32 score row plus resident K/V prefixes press the 16 MB VMEM limit
# and the online-softmax loop kernels take over (the shipped dalle_4k
# config, S=4352, runs there). Measured at S=2560 (dalle_12B's true shape
# with the 384px VAE): wedge beats the loop kernels (BENCH.md).
LSE_ROWS = 8  # sublane replication for row-vector (per-query) scalars


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _wr_pick_block(s128: int, n_f32_bufs: int, itemsize: int = 2):
    """Largest 128-multiple row-block whose n_f32_bufs [block, s_pad] fp32
    score buffers fit the VMEM budget. Returns (block, s_pad).

    fp32 inputs (itemsize 4) double every operand on the kernel's VMEM
    stack, so their budget is much tighter — the fp32 path is a
    correctness/debug arm (precision A/B), not the production path.
    """
    budget = (8 << 20) if itemsize <= 2 else (7 << 19)
    total = 4 * s128 * s128 * n_f32_bufs
    n_blocks = max(1, -(-total // budget))
    block = _round_up(-(-s128 // n_blocks), 128)
    # recompute the block count for the ROUNDED block — otherwise
    # block * n_blocks over-pads (e.g. S=3072 fp32: 11 blocks of 384 =
    # 4224 rows instead of ceil(3072/384) = 8 blocks = 3072)
    n_blocks = -(-s128 // block)
    return block, block * n_blocks


def _wr_mask(s_pad: int, seq_len: int, window) -> jax.Array:
    """int8 [s_pad, s_pad]: nonzero = masked. Built once per call (XLA CSEs
    it across layers); replaces per-block iota+compare inside the kernels.
    int8 (not bool) because bool operands lower to s32 on the TPU custom-call
    boundary — 4x the stack VMEM, enough to blow the 16 MB scoped limit when
    the kernel sits inside a remat'd scan body."""
    row = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    m = col > row
    if seq_len < s_pad:
        m = jnp.logical_or(m, col >= seq_len)
    if window is not None:
        m = jnp.logical_or(m, row - col >= window)
    return m.astype(jnp.int8)


def _wr_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref=None):
    """One (batch*head, q-block) program: full score row, one-shot softmax.

    q_ref: [block, D]; k_ref/v_ref: [S, D]; mask_ref: [block, S] bool.
    bf16 into the MXU, fp32 accumulate (preferred_element_type) — on v5e the
    fp32 matmul path runs at a fraction of the bf16 rate.
    """
    d = q_ref.shape[-1]
    scale = 1.0 / math.sqrt(d)
    s = jax.lax.dot_general(
        q_ref[...], k_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [block, S]
    # additive arithmetic mask (int8 0/1 * NEG_INF), NOT a select on an i1
    # vector: Mosaic fails to relayout [block, S] i1 at wr shapes (S >= 2560,
    # "Non-singleton logical dimension is replicated in destination")
    s = s + mask_ref[...].astype(jnp.float32) * NEG_INF
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # fully-masked rows (possible for padded rows under a local window):
    # with finite NEG_INF they give p == exp(0) everywhere (l == S, never
    # 0), so detect them from the MASK — row-min of the int8 mask is 1.0
    # iff every entry is masked — and emit 0 output + a huge lse so
    # backward's exp(s - lse) underflows to 0 for every entry of the row
    dead = jnp.min(mask_ref[...].astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = ((o / l) * (1.0 - dead)).astype(o_ref.dtype)
    if lse_ref is not None:
        lse = (m + jnp.log(l)) * (1.0 - dead) + (-NEG_INF) * dead
        lse_ref[...] = jnp.broadcast_to(lse, (q_ref.shape[0], LSE_LANES))


def _wr_forward(q, k, v, window, interpret: bool, with_lse: bool = False):
    b, h, s, d = q.shape
    block_q, s_pad = _wr_pick_block(
        _round_up(s, 128), n_f32_bufs=1, itemsize=q.dtype.itemsize
    )
    bh = b * h
    qf = _pad_seq(q, s_pad).reshape(bh, s_pad, d)
    kf = _pad_seq(k, s_pad).reshape(bh, s_pad, d)
    vf = _pad_seq(v, s_pad).reshape(bh, s_pad, d)
    n_q = s_pad // block_q
    mask = _wr_mask(s_pad, s, window).reshape(n_q, block_q, s_pad)

    out_shapes = [jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype)]
    out_specs = [pl.BlockSpec((None, block_q, d), lambda b_, i: (b_, i, 0))]
    if with_lse:
        out_shapes.append(
            jax.ShapeDtypeStruct((bh, s_pad, LSE_LANES), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((None, block_q, LSE_LANES), lambda b_, i: (b_, i, 0))
        )
    outs = pl.pallas_call(
        _wr_fwd_kernel,
        grid=(bh, n_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, s_pad, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((None, s_pad, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((None, block_q, s_pad), lambda b_, i: (i, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * s_pad * s_pad * d,
            bytes_accessed=4 * bh * s_pad * d * q.dtype.itemsize,
            transcendentals=bh * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf, mask)
    out = outs[0].reshape(b, h, s_pad, d)
    if s_pad != s:
        out = out[:, :, :s, :]
    if with_lse:
        return out, outs[1]  # lse stays padded+flat for the bwd kernels
    return out


def _wr_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                   lse_row_ref, dsum_row_ref, mask_ref, maskT_ref,
                   dq_ref, dk_ref, dv_ref, *, block: int):
    """Fused dQ + dK/dV for one (batch*head, block) over full score rows.

    One program computes dQ for query-block i AND dK/dV for key-block i:
    the two halves share the full q/k/v/do inputs already resident in VMEM
    (block views are dynamic slices of those refs — the arrays are streamed
    ONCE, not duplicated as separate block inputs), and fusing halves the
    program count vs separate dq/dkv kernels.

    dQ half:   p  = exp(s - lse);  ds  = p  * (dO.V^T - dsum);  dQ = scale*ds.K
    dKV half:  p' = exp(s' - lse'); ds' = p' * (V_blk.dO^T - dsum'); transposed
    per-query scalars (lse', dsum') arrive sublane-replicated [LSE_ROWS, S].
    Masked entries are killed ADDITIVELY before exp (s + mask*NEG_INF), so
    exp underflows to exactly 0 for them — no i1 select (Mosaic cannot
    relayout [block, S] i1 vectors at S >= 2560) and no inf to launder.
    """
    d = q_ref.shape[-1]
    scale = 1.0 / math.sqrt(d)
    i0 = pl.program_id(1) * block
    qb_ref = q_ref[pl.ds(i0, block), :]
    dob_ref = do_ref[pl.ds(i0, block), :]
    kb_ref = k_ref[pl.ds(i0, block), :]
    vb_ref = v_ref[pl.ds(i0, block), :]

    # --- dQ for query-block i
    s = jax.lax.dot_general(
        qb_ref, k_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [block, S]
    p = jnp.exp(s + mask_ref[...].astype(jnp.float32) * NEG_INF
                - lse_ref[:, :1])
    dp = jax.lax.dot_general(
        dob_ref, v_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - dsum_ref[:, :1])).astype(k_ref.dtype)
    dq = jax.lax.dot_general(
        ds, k_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[...] = (dq * scale).astype(dq_ref.dtype)

    # --- dK/dV for key-block i
    sT = jax.lax.dot_general(
        kb_ref, q_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [block, S]
    pT = jnp.exp(sT + maskT_ref[...].astype(jnp.float32) * NEG_INF
                 - lse_row_ref[0:1, :])
    dv = jax.lax.dot_general(
        pT.astype(do_ref.dtype), do_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_ref[...] = dv.astype(dv_ref.dtype)
    dpT = jax.lax.dot_general(
        vb_ref, do_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dsT = (pT * (dpT - dsum_row_ref[0:1, :])).astype(q_ref.dtype)
    dk = jax.lax.dot_general(
        dsT, q_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_ref[...] = (dk * scale).astype(dk_ref.dtype)


def _wr_backward(q, k, v, out, lse_flat, g, window, interpret: bool):
    b, h, s, d = q.shape
    bh = b * h
    block, s_pad = _wr_pick_block(
        _round_up(s, 128), n_f32_bufs=2, itemsize=q.dtype.itemsize
    )

    # normalize the forward's lse padding to this pass's s_pad (padded rows
    # only ever meet do == 0, so any finite fill is safe)
    lse = lse_flat
    if lse.shape[1] < s_pad:
        lse = jnp.pad(lse, ((0, 0), (0, s_pad - lse.shape[1]), (0, 0)))
    elif lse.shape[1] > s_pad:
        lse = lse[:, :s_pad, :]

    dsum = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dsum = _pad_seq(dsum[..., None], s_pad).reshape(bh, s_pad, 1)
    dsum_flat = jnp.broadcast_to(dsum, (bh, s_pad, LSE_LANES))

    qf = _pad_seq(q, s_pad).reshape(bh, s_pad, d)
    kf = _pad_seq(k, s_pad).reshape(bh, s_pad, d)
    vf = _pad_seq(v, s_pad).reshape(bh, s_pad, d)
    gf = _pad_seq(g, s_pad).reshape(bh, s_pad, d)

    n_blk = s_pad // block
    mask = _wr_mask(s_pad, s, window)
    mask_q = mask.reshape(n_blk, block, s_pad)
    maskT = jnp.swapaxes(mask, 0, 1).reshape(n_blk, block, s_pad)
    # per-query scalars as row vectors for the dkv half
    lse_row = jnp.broadcast_to(lse[:, :, 0][:, None, :], (bh, LSE_ROWS, s_pad))
    dsum_row = jnp.broadcast_to(
        dsum[:, :, 0][:, None, :], (bh, LSE_ROWS, s_pad)
    )

    full = lambda: pl.BlockSpec((None, s_pad, d), lambda b_, i: (b_, 0, 0))  # noqa: E731
    blk = lambda: pl.BlockSpec((None, block, d), lambda b_, i: (b_, i, 0))  # noqa: E731
    dq, dk, dv = pl.pallas_call(
        functools.partial(_wr_bwd_kernel, block=block),
        grid=(bh, n_blk),
        in_specs=[
            full(), full(), full(), full(),
            pl.BlockSpec((None, block, LSE_LANES), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, block, LSE_LANES), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, LSE_ROWS, s_pad), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((None, LSE_ROWS, s_pad), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((None, block, s_pad), lambda b_, i: (i, 0, 0)),
            pl.BlockSpec((None, block, s_pad), lambda b_, i: (i, 0, 0)),
        ],
        out_specs=[blk(), blk(), blk()],
        out_shape=[jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lse, dsum_flat, lse_row, dsum_row, mask_q, maskT)

    def unflat(x):
        x = x.reshape(b, h, s_pad, d)
        return x[:, :, :s, :] if s_pad != s else x

    return unflat(dq), unflat(dk), unflat(dv)


# ------------------------------------------------------------------- wedge
# Causal-skip variant of the whole-row family: one pallas_call per q-block i
# with a STATIC key extent (i+1)*block — q rows [i*b,(i+1)*b) attend keys
# [0,(i+1)*b) only, so the upper-triangle blocks are never computed (~45% of
# the matmul FLOPs and softmax VPU work at n=2). No loops, no VMEM scratch,
# no precomputed mask input; measured 0.76 ms vs 0.97 ms whole-row fwd and
# 2.69 ms vs 3.16 ms fused bwd at 16x8x1280x128 bf16 on v5e (dispatch
# amortized over 100 in-jit calls — see BENCH.md on the microbench floor).

WEDGE_MAX_BLOCK = 640  # largest per-call q-block (score row [block, S] fp32)

# Profile-guided block-size autotuning (autotune_attention.py): a JSON
# table {"wedge": {"<s128>,<itemsize>": max_block}} measured per chip
# generation. Loaded once from the file named by DALLE_TPU_ATTN_TUNE;
# the tuner and tests inject tables directly via set_tune_table(). The
# built-in WEDGE_MAX_BLOCK = 640 is the v5e-measured default — block size
# only changes perf (value/grad parity across block sizes is tested), so
# a missing/stale table is always safe.
_TUNE_TABLE: dict | None = None


def set_tune_table(table: dict | None) -> None:
    """Install an autotune table programmatically; None re-arms the lazy
    load from DALLE_TPU_ATTN_TUNE ({} disables tuning outright)."""
    global _TUNE_TABLE
    _TUNE_TABLE = table


def load_tune_table(path: str) -> None:
    """Install the autotune table from an explicit file path — the config
    key ``attn_tune`` (train_dalle.py / sample_dalle.py / serve_dalle.py);
    equivalent to pointing DALLE_TPU_ATTN_TUNE at the file, but carried by
    the model config so tuned deployments need no env plumbing. Unlike the
    lazy env load, a missing/broken file here raises — a config that names
    a table expects it."""
    import json  # noqa: PLC0415

    with open(path) as f:
        set_tune_table(json.load(f))


def _tune_table() -> dict:
    global _TUNE_TABLE
    if _TUNE_TABLE is None:
        import json  # noqa: PLC0415
        import os  # noqa: PLC0415
        import warnings  # noqa: PLC0415

        path = os.environ.get("DALLE_TPU_ATTN_TUNE", "")
        table = {}
        if path:
            try:
                with open(path) as f:
                    table = json.load(f)
            except (OSError, ValueError) as e:
                warnings.warn(
                    f"DALLE_TPU_ATTN_TUNE={path!r} unreadable ({e}); "
                    "using built-in block sizes", stacklevel=2,
                )
        _TUNE_TABLE = table
    return _TUNE_TABLE


def _wedge_layout(
    s: int, itemsize: int = 2, max_block: int | None = None
) -> tuple[int, int, int]:
    """(block, s_pad, n_calls): fewest ≤max-block-sized 128-multiple
    blocks covering round_up(s, 128).

    fp32 inputs (itemsize 4) double every operand on the kernel's VMEM
    stack — at e.g. S=2560 fp32 the two [640, S] score tiles plus fp32
    q/do/k/v would exceed the 16 MB budget — so the per-call block halves,
    mirroring _wr_pick_block's itemsize-aware budget. An explicit
    ``max_block`` (the hybrid long-S forward) bypasses both the tune table
    and the default cap."""
    s128 = _round_up(s, 128)
    if max_block is None:
        tuned = _tune_table().get("wedge", {}).get(f"{s128},{itemsize}")
        if tuned:
            max_block = _round_up(int(tuned), 128)
        else:
            max_block = (WEDGE_MAX_BLOCK if itemsize <= 2
                         else WEDGE_MAX_BLOCK // 2)
    n = -(-s128 // max_block)
    block = _round_up(-(-s128 // n), 128)
    return block, block * n, n


def _wedge_k0(i: int, block: int, window) -> int:
    """Static start of the key range for q-block i under a local window:
    key blocks wholly below the band (col <= i*block - window for every
    row) are skipped."""
    if window is None:
        return 0
    return max(0, (i * block - window + 1) // block) * block



def _dropout_keep(rows, cols, seed, rate: float):
    """Deterministic per-position keep mask for attention-weight dropout.

    A counter-based integer hash of (global row, global col, seed): any
    kernel tile — forward, dQ prefix, or the TRANSPOSED dK/dV suffix — can
    regenerate exactly the bits for its coordinates, so the mask is never
    stored (no [S, S] tensor anywhere). Two xorshift-multiply rounds are
    plenty for dropout-quality bits. rows/cols: i32 [m, n]; returns bool.
    """
    x = (rows.astype(jnp.uint32) * jnp.uint32(2654435761)
         + cols.astype(jnp.uint32) * jnp.uint32(97929647)
         + seed.astype(jnp.uint32))
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0x5BD1E995)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x27D4EB2F)
    x = x ^ (x >> jnp.uint32(16))
    # keep when hash < keep_prob in fixed point (24-bit threshold)
    thresh = jnp.uint32(int((1.0 - rate) * float(1 << 24)))
    return (x >> jnp.uint32(8)) < thresh


def _wedge_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                      *, i: int, block: int, k0: int, window, seq_len,
                      dropout_rate: float = 0.0):
    """q-block i against keys [k0, (i+1)*block): one-shot softmax over the
    causal wedge. bf16 into the MXU, fp32 accumulate. Attention-weight
    dropout (mtf attention's dropout_rate) applies a coordinate-hash keep
    mask to the normalized weights with inverted scaling — no [S, S] mask
    tensor exists anywhere (_dropout_keep)."""
    d = q_ref.shape[-1]
    scale = 1.0 / math.sqrt(d)
    s_k = k_ref.shape[0]
    s = jax.lax.dot_general(
        q_ref[...], k_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, (block, s_k), 0) + i * block
    col = jax.lax.broadcasted_iota(jnp.int32, (block, s_k), 1) + k0
    mask = col > row
    if seq_len is not None:
        mask = jnp.logical_or(mask, col >= seq_len)
    if window is not None:
        mask = jnp.logical_or(mask, row - col >= window)
    s = jnp.where(mask, NEG_INF, s)
    # m init is implicitly NEG_INF (finite): a fully-masked row yields
    # p == exp(0), finite lse, zero backward contribution (do rows are 0)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)  # normalizer of UNdropped weights
    l_safe = jnp.maximum(l, 1e-30)
    if dropout_rate > 0.0:
        # per-(batch*head) seed offset so heads draw independent masks
        seed = seed_ref[0, 0] + pl.program_id(0)
        keep = _dropout_keep(row, col, seed, dropout_rate)
        p_v = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
    else:
        p_v = p
    o = jax.lax.dot_general(
        p_v.astype(v_ref.dtype), v_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (o / l_safe).astype(o_ref.dtype)
    if lse_ref is not None:
        lse = m + jnp.log(l_safe)
        lse_ref[...] = jnp.broadcast_to(lse, (block, LSE_LANES))


def _wedge_forward(q, k, v, window, interpret: bool, with_lse: bool = False,
                   dropout_rate: float = 0.0, dropout_seed=None,
                   max_block: int | None = None):
    b, h, s, d = q.shape
    block, s_pad, n_q = _wedge_layout(s, q.dtype.itemsize, max_block)
    bh = b * h
    qf = _pad_seq(q, s_pad).reshape(bh, s_pad, d)
    kf = _pad_seq(k, s_pad).reshape(bh, s_pad, d)
    vf = _pad_seq(v, s_pad).reshape(bh, s_pad, d)
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1, 1), jnp.int32)
    seed = jnp.reshape(dropout_seed, (1, 1)).astype(jnp.int32)

    outs, lses = [], []
    seq_len = s if s != s_pad else None
    for i in range(n_q):
        k0 = _wedge_k0(i, block, window)
        s_k = (i + 1) * block - k0
        out_shapes = [jax.ShapeDtypeStruct((bh, block, d), q.dtype)]
        out_specs = [pl.BlockSpec((None, block, d), lambda b_: (b_, 0, 0))]
        if with_lse:
            out_shapes.append(
                jax.ShapeDtypeStruct((bh, block, LSE_LANES), jnp.float32))
            out_specs.append(
                pl.BlockSpec((None, block, LSE_LANES), lambda b_: (b_, 0, 0)))
        kern = functools.partial(_wedge_fwd_kernel, i=i, block=block, k0=k0,
                                 window=window, seq_len=seq_len,
                                 dropout_rate=dropout_rate)
        if not with_lse:
            kern = functools.partial(
                lambda s_, q_, k_, v_, o_, kk: kk(s_, q_, k_, v_, o_, None),
                kk=kern)
        res = pl.pallas_call(
            kern,
            grid=(bh,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((None, block, d), lambda b_, i=i: (b_, i, 0)),
                pl.BlockSpec((None, s_k, d), lambda b_: (b_, 0, 0)),
                pl.BlockSpec((None, s_k, d), lambda b_: (b_, 0, 0)),
            ],
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * bh * block * s_k * d,
                bytes_accessed=bh * (2 * s_k + 2 * block) * d
                * q.dtype.itemsize,
                transcendentals=bh * block * s_k,
            ),
            interpret=interpret,
        )(seed, qf, kf[:, k0:k0 + s_k], vf[:, k0:k0 + s_k])
        res = res if isinstance(res, (list, tuple)) else [res]
        outs.append(res[0])
        if with_lse:
            lses.append(res[1])
    out = jnp.concatenate(outs, axis=1).reshape(b, h, s_pad, d)
    if s_pad != s:
        out = out[:, :, :s, :]
    if with_lse:
        return out, jnp.concatenate(lses, axis=1)
    return out


def _wedge_bwd_kernel(seed_ref, k_ref, v_ref, q_ref, do_ref, lse_ref,
                      dsum_ref, lse_row_ref, dsum_row_ref,
                      dq_ref, dk_ref, dv_ref,
                      *, i: int, block: int, window, seq_len, s_pad: int,
                      dropout_rate: float = 0.0):
    """Block i's dQ (vs key prefix [0,(i+1)b)) and dK/dV (vs query suffix
    [i*b, S)) in ONE program. k/v arrive as prefix views [(i+1)b, d]; q/do
    arrive FULL and are sliced statically in-kernel (VMEM-resident — no
    HBM slice copies). Scores are rematerialized; masked entries zeroed
    after exp (select(inf) never yields NaN)."""
    d = q_ref.shape[-1]
    scale = 1.0 / math.sqrt(d)
    i0 = i * block
    s_pre = (i + 1) * block
    s_suf = s_pad - i0

    qb = q_ref[i0:s_pre, :]
    dob = do_ref[i0:s_pre, :]

    # ---- dQ half
    row = jax.lax.broadcasted_iota(jnp.int32, (block, s_pre), 0) + i0
    col = jax.lax.broadcasted_iota(jnp.int32, (block, s_pre), 1)
    mask = col > row
    if seq_len is not None:
        mask = jnp.logical_or(mask, col >= seq_len)
    if window is not None:
        mask = jnp.logical_or(mask, row - col >= window)
    s = jax.lax.dot_general(
        qb, k_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jnp.where(mask, 0.0, jnp.exp(s - lse_ref[:, :1]))
    dp = jax.lax.dot_general(
        dob, v_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0.0:
        # same coordinate-hash mask as the forward: out = c*(D o w) @ V with
        # c = 1/keep, so dw = c*D o (dO V^T) and ds = w o (dw - dsum)
        # (dsum = rowsum(dO o out) already equals rowsum(dw o w))
        seed = seed_ref[0, 0] + pl.program_id(0)
        keep = _dropout_keep(row, col, seed, dropout_rate)
        dp = jnp.where(keep, dp * (1.0 / (1.0 - dropout_rate)), 0.0)
    ds = (p * (dp - dsum_ref[:, :1])).astype(k_ref.dtype)
    dq = jax.lax.dot_general(
        ds, k_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[...] = (dq * scale).astype(dq_ref.dtype)

    # ---- dK/dV half (key block i vs query suffix)
    kb = k_ref[i0:s_pre, :]
    vb = v_ref[i0:s_pre, :]
    qsuf = q_ref[i0:, :]
    dosuf = do_ref[i0:, :]
    krow = jax.lax.broadcasted_iota(jnp.int32, (block, s_suf), 0) + i0
    qcol = jax.lax.broadcasted_iota(jnp.int32, (block, s_suf), 1) + i0
    maskT = krow > qcol
    if seq_len is not None:
        maskT = jnp.logical_or(maskT, krow >= seq_len)
    if window is not None:
        maskT = jnp.logical_or(maskT, qcol - krow >= window)
    sT = jax.lax.dot_general(
        kb, qsuf, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    pT = jnp.where(maskT, 0.0, jnp.exp(sT - lse_row_ref[0:1, i0:]))
    if dropout_rate > 0.0:
        # transposed tile of the SAME mask: hash(query=qcol, key=krow)
        seed = seed_ref[0, 0] + pl.program_id(0)
        keepT = _dropout_keep(qcol, krow, seed, dropout_rate)
        inv = 1.0 / (1.0 - dropout_rate)
        pT_v = jnp.where(keepT, pT * inv, 0.0)  # dropped weights for dV
    else:
        keepT = None
        pT_v = pT
    dv = jax.lax.dot_general(
        pT_v.astype(dosuf.dtype), dosuf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_ref[...] = dv.astype(dv_ref.dtype)
    dpT = jax.lax.dot_general(
        vb, dosuf, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if keepT is not None:
        dpT = jnp.where(keepT, dpT * inv, 0.0)
    dsT = (pT * (dpT - dsum_row_ref[0:1, i0:])).astype(qsuf.dtype)
    dk = jax.lax.dot_general(
        dsT, qsuf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_ref[...] = (dk * scale).astype(dk_ref.dtype)


def _wedge_backward(q, k, v, out, lse_flat, g, window, interpret: bool,
                    dropout_rate: float = 0.0, dropout_seed=None):
    b, h, s, d = q.shape
    bh = b * h
    block, s_pad, n_blk = _wedge_layout(s, q.dtype.itemsize)
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1, 1), jnp.int32)
    seed = jnp.reshape(dropout_seed, (1, 1)).astype(jnp.int32)

    # normalize the forward's lse padding to this pass's s_pad
    lse = lse_flat
    if lse.shape[1] < s_pad:
        lse = jnp.pad(lse, ((0, 0), (0, s_pad - lse.shape[1]), (0, 0)))
    elif lse.shape[1] > s_pad:
        lse = lse[:, :s_pad, :]

    dsum = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dsum = _pad_seq(dsum[..., None], s_pad).reshape(bh, s_pad, 1)
    dsum_flat = jnp.broadcast_to(dsum, (bh, s_pad, LSE_LANES))

    qf = _pad_seq(q, s_pad).reshape(bh, s_pad, d)
    kf = _pad_seq(k, s_pad).reshape(bh, s_pad, d)
    vf = _pad_seq(v, s_pad).reshape(bh, s_pad, d)
    gf = _pad_seq(g, s_pad).reshape(bh, s_pad, d)
    lse_row = jnp.broadcast_to(lse[:, :, 0][:, None, :], (bh, LSE_ROWS, s_pad))
    dsum_row = jnp.broadcast_to(dsum[:, :, 0][:, None, :],
                                (bh, LSE_ROWS, s_pad))

    dqs, dks, dvs = [], [], []
    seq_len = s if s != s_pad else None
    for i in range(n_blk):
        s_pre = (i + 1) * block
        dq, dk, dv = pl.pallas_call(
            functools.partial(_wedge_bwd_kernel, i=i, block=block,
                              window=window, seq_len=seq_len, s_pad=s_pad,
                              dropout_rate=dropout_rate),
            grid=(bh,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((None, s_pre, d), lambda b_: (b_, 0, 0)),
                pl.BlockSpec((None, s_pre, d), lambda b_: (b_, 0, 0)),
                pl.BlockSpec((None, s_pad, d), lambda b_: (b_, 0, 0)),
                pl.BlockSpec((None, s_pad, d), lambda b_: (b_, 0, 0)),
                pl.BlockSpec((None, block, LSE_LANES),
                             lambda b_, i=i: (b_, i, 0)),
                pl.BlockSpec((None, block, LSE_LANES),
                             lambda b_, i=i: (b_, i, 0)),
                pl.BlockSpec((None, LSE_ROWS, s_pad), lambda b_: (b_, 0, 0)),
                pl.BlockSpec((None, LSE_ROWS, s_pad), lambda b_: (b_, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((None, block, d), lambda b_: (b_, 0, 0))
            ] * 3,
            out_shape=[jax.ShapeDtypeStruct((bh, block, d), q.dtype)] * 3,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(seed, kf[:, :s_pre], vf[:, :s_pre], qf, gf, lse, dsum_flat,
          lse_row, dsum_row)
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)

    def unflat(parts):
        x = jnp.concatenate(parts, axis=1).reshape(b, h, s_pad, d)
        return x[:, :, :s, :] if s_pad != s else x

    return unflat(dqs), unflat(dks), unflat(dvs)


# Short-sequence kernel family: "wedge" (causal-skip, default) or "wr"
# (whole-row). Overridable per-deployment via DALLE_TPU_ATTN_SHORT.
import os as _os0  # noqa: E402

SHORT_IMPL = _os0.environ.get("DALLE_TPU_ATTN_SHORT", "wedge")


# ------------------------------------------------------------ loop dispatch

WEDGE_FWD_MAX_SEQ = 6144  # hybrid regime: wedge FORWARD + loop backward


def _wedge_long_cap(s128: int) -> int:
    """VMEM-safe q-block cap for the hybrid long-S wedge forward (bf16):
    one [cap, s_pad] fp32 score buffer (Mosaic reuses it for exp) plus the
    resident bf16 K/V prefix must fit a ~10 MB working budget. The cap is
    a 256-multiple so the loop backward's default 256 blocks always divide
    the forward's padded length (_flash_backward reads s_pad off lse)."""
    cap = (10 << 20) // (4 * s128) // 256 * 256
    return max(256, min(512, cap))


def _flash_forward(
    q, k, v, window, block_q: int, block_k: int, interpret: bool,
    with_lse: bool = False,
):
    b, h, s, d = q.shape
    s128 = _round_up(s, 128)
    if s128 <= WHOLE_ROW_MAX_SEQ:
        if SHORT_IMPL == "wedge":
            return _wedge_forward(q, k, v, window, interpret, with_lse)
        return _wr_forward(q, k, v, window, interpret, with_lse)
    if SHORT_IMPL == "wedge" and q.dtype.itemsize <= 2 and s128 <= WEDGE_FWD_MAX_SEQ:
        # Hybrid: the causal-skip wedge still wins the FORWARD here (the
        # loop kernels measured 50.4 TF/s fwd at S=4352 vs the wedge's
        # 88.1 at S=2560) with a reduced, VMEM-safe q-block; the backward
        # stays on the loop kernels, whose streaming K/V tiles are what
        # fits at these lengths. A tuned wedge cap (floored to a
        # 256-multiple for backward divisibility) overrides the analytic
        # one. fp32 falls through to the loop (debug arm; its doubled
        # operands don't fit the hybrid's budget).
        tuned = _tune_table().get("wedge", {}).get(f"{s128},{q.dtype.itemsize}")
        cap = (max(256, int(tuned) // 256 * 256) if tuned
               else _wedge_long_cap(s128))
        return _wedge_forward(q, k, v, window, interpret, with_lse,
                              max_block=cap)
    block_q = min(block_q, s)
    block_k = min(block_k, s)
    s_pad = ((s + block_q - 1) // block_q) * block_q
    # Pad seq to a block multiple; padded keys are masked by seq_len guard,
    # padded query rows are sliced off below.
    bh = b * h
    qf = _pad_seq(q, s_pad).reshape(bh, s_pad, d)
    kf = _pad_seq(k, s_pad).reshape(bh, s_pad, d)
    vf = _pad_seq(v, s_pad).reshape(bh, s_pad, d)

    grid = (bh, s_pad // block_q)
    out_shapes = [jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype)]
    out_specs = [pl.BlockSpec((None, block_q, d), lambda b_, i: (b_, i, 0))]
    if with_lse:
        out_shapes.append(
            jax.ShapeDtypeStruct((bh, s_pad, LSE_LANES), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((None, block_q, LSE_LANES), lambda b_, i: (b_, i, 0))
        )
    outs = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_k=block_k, window=window, seq_len=s,
            with_lse=with_lse,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, s_pad, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((None, s_pad, d), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * s_pad * s_pad * d // 2,  # ~causal half
            bytes_accessed=4 * bh * s_pad * d * q.dtype.itemsize,
            transcendentals=bh * s_pad * s_pad // 2,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    out = outs[0].reshape(b, h, s_pad, d)
    if s_pad != s:
        out = out[:, :, :s, :]
    if with_lse:
        return out, outs[1]  # lse stays padded+flat for the bwd kernels
    return out


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, dq_ref,
    *, block_k: int, window, seq_len: int,
):
    """dQ for one (batch*head, q-block): loop kv blocks on/below the diagonal.

    ds = p * (dO·Vᵀ − rowsum(dO∘O)); dQ = scale · ds·K.
    """
    block_q, d = q_ref.shape
    qi = pl.program_id(1)
    q_offset = qi * block_q
    scale = 1.0 / math.sqrt(d)

    # bf16 into the MXU, fp32 accumulate — see the forward kernel's note.
    q = q_ref[...]
    do = do_ref[...]
    lse = lse_ref[:, :1]
    dsum = dsum_ref[:, :1]
    row_ids = q_offset + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    num_kv_blocks = jax.lax.div(q_offset + block_q - 1, block_k) + 1

    def body(j, dq_acc):
        k_blk = k_ref[pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        col_ids = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = jnp.logical_or(col_ids > row_ids, col_ids >= seq_len)
        if window is not None:
            mask = jnp.logical_or(mask, row_ids - col_ids >= window)
        p = jnp.where(mask, 0.0, jnp.exp(s - lse))
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - dsum)).astype(k_blk.dtype)
        return dq_acc + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(
        0, num_kv_blocks, body, jnp.zeros((block_q, d), jnp.float32)
    )
    dq_ref[...] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, dk_ref, dv_ref,
    *, block_q: int, window, seq_len: int,
):
    """dK, dV for one (batch*head, kv-block): loop q blocks on/above the
    diagonal. dV = pᵀ·dO; dK = scale · dsᵀ·Q."""
    block_k, d = k_ref.shape
    kj = pl.program_id(1)
    k_offset = kj * block_k
    scale = 1.0 / math.sqrt(d)
    s_pad = q_ref.shape[0]
    num_q_blocks = s_pad // block_q

    # bf16 into the MXU, fp32 accumulate — see the forward kernel's note.
    k = k_ref[...]
    v = v_ref[...]
    col_ids = k_offset + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    start_i = jax.lax.div(k_offset, block_q)

    def body(i, carry):
        dk_acc, dv_acc = carry
        q_blk = q_ref[pl.ds(i * block_q, block_q), :]
        do_blk = do_ref[pl.ds(i * block_q, block_q), :]
        lse = lse_ref[pl.ds(i * block_q, block_q), :1]
        dsum = dsum_ref[pl.ds(i * block_q, block_q), :1]
        s = jax.lax.dot_general(
            q_blk, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        row_ids = i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        mask = jnp.logical_or(col_ids > row_ids, col_ids >= seq_len)
        if window is not None:
            mask = jnp.logical_or(mask, row_ids - col_ids >= window)
        p = jnp.where(mask, 0.0, jnp.exp(s - lse))
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(do_blk.dtype), do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_blk, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - dsum)).astype(q_blk.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_acc, dv_acc

    zero = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(start_i, num_q_blocks, body, (zero, zero))
    dk_ref[...] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _hybrid_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                       lse_row_ref, dsum_row_ref, dq_ref, dk_ref, dv_ref,
                       *, block: int, tile: int, window, seq_len,
                       s_pad: int):
    """Fused dQ + dK/dV for one (batch*head, block) at hybrid lengths
    (3072 < S <= WEDGE_FWD_MAX_SEQ): q/k/v/do stay FULLY VMEM-RESIDENT
    across the minor grid axis (their BlockSpecs are block-constant, so
    Pallas fetches each operand from HBM once per batch*head — the separate
    dq/dkv loop kernels of the long-S family stream them twice), and the
    score work runs in [block, tile] fp32 tiles through inner fori_loops
    whose bounds encode the causal skip in BOTH directions (dQ: key tiles
    up to the diagonal; dK/dV: query tiles from the diagonal). The wedge
    family's whole-row score buffers don't fit VMEM at these lengths —
    tiling the row is what extends its one-call fusion past S=3072."""
    d = q_ref.shape[-1]
    scale = 1.0 / math.sqrt(d)
    i0 = pl.program_id(1) * block

    qb = q_ref[pl.ds(i0, block), :]
    dob = do_ref[pl.ds(i0, block), :]
    lse_b = lse_ref[:, :1]
    dsum_b = dsum_ref[:, :1]

    # ---- dQ half: key tiles [j*tile, (j+1)*tile) intersecting [k0, i0+block)
    def dq_body(j, acc):
        kt = k_ref[pl.ds(j * tile, tile), :]
        vt = v_ref[pl.ds(j * tile, tile), :]
        s = jax.lax.dot_general(
            qb, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [block, tile]
        row = i0 + jax.lax.broadcasted_iota(jnp.int32, (block, tile), 0)
        col = j * tile + jax.lax.broadcasted_iota(jnp.int32, (block, tile), 1)
        mask = col > row
        if seq_len is not None:
            mask = jnp.logical_or(mask, col >= seq_len)
        if window is not None:
            mask = jnp.logical_or(mask, row - col >= window)
        p = jnp.where(mask, 0.0, jnp.exp(s - lse_b))
        dp = jax.lax.dot_general(
            dob, vt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - dsum_b)).astype(kt.dtype)
        return acc + jax.lax.dot_general(
            ds, kt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    n_kv = jax.lax.div(i0 + block - 1, tile) + 1
    if window is None:
        j_lo = 0
    else:  # key tiles wholly below the band are skipped
        j_lo = jnp.maximum(0, jax.lax.div(i0 - window + 1, tile))
    dq = jax.lax.fori_loop(
        j_lo, n_kv, dq_body, jnp.zeros((block, d), jnp.float32)
    )
    dq_ref[...] = (dq * scale).astype(dq_ref.dtype)

    # ---- dK/dV half: key block i vs query tiles from the diagonal up
    kb = k_ref[pl.ds(i0, block), :]
    vb = v_ref[pl.ds(i0, block), :]

    def dkv_body(j, carry):
        dk_acc, dv_acc = carry
        qt = q_ref[pl.ds(j * tile, tile), :]
        dot_ = do_ref[pl.ds(j * tile, tile), :]
        sT = jax.lax.dot_general(
            kb, qt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [block, tile]
        krow = i0 + jax.lax.broadcasted_iota(jnp.int32, (block, tile), 0)
        qcol = j * tile + jax.lax.broadcasted_iota(jnp.int32, (block, tile), 1)
        maskT = krow > qcol
        if seq_len is not None:
            maskT = jnp.logical_or(maskT, krow >= seq_len)
        if window is not None:
            maskT = jnp.logical_or(maskT, qcol - krow >= window)
        lse_t = lse_row_ref[0:1, pl.ds(j * tile, tile)]
        dsum_t = dsum_row_ref[0:1, pl.ds(j * tile, tile)]
        pT = jnp.where(maskT, 0.0, jnp.exp(sT - lse_t))
        dv_acc = dv_acc + jax.lax.dot_general(
            pT.astype(dot_.dtype), dot_, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpT = jax.lax.dot_general(
            vb, dot_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dsT = (pT * (dpT - dsum_t)).astype(qt.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            dsT, qt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_acc, dv_acc

    i_lo = jax.lax.div(i0, tile)
    n_q = s_pad // tile
    if window is not None:  # query tiles beyond the band contribute nothing
        n_q = jnp.minimum(n_q, jax.lax.div(i0 + block - 1 + window, tile) + 1)
    zero = jnp.zeros((block, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(i_lo, n_q, dkv_body, (zero, zero))
    dk_ref[...] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _hybrid_backward(q, k, v, out, lse_flat, g, window, interpret: bool):
    """One-pallas_call fused backward for the hybrid regime — pairs with
    the capped wedge forward (whose padded length lse carries). Measured
    S=4352 vs the two-call loop family in BENCH.md (r5 long-S section)."""
    b, h, s, d = q.shape
    bh = b * h
    s_pad = lse_flat.shape[1]  # the FORWARD's padded length
    tuned = _tune_table().get("hybrid_bwd", {}).get(
        f"{_round_up(s, 128)},{q.dtype.itemsize}"
    )
    if tuned and s_pad % int(tuned[0]) == 0 and s_pad % int(tuned[1]) == 0:
        block, tile = int(tuned[0]), int(tuned[1])
    else:
        block = 256 if s_pad % 256 == 0 else 128
        tile = next(t for t in (512, 256, 128) if s_pad % t == 0)

    dsum = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dsum = _pad_seq(dsum[..., None], s_pad).reshape(bh, s_pad, 1)
    dsum_flat = jnp.broadcast_to(dsum, (bh, s_pad, LSE_LANES))

    qf = _pad_seq(q, s_pad).reshape(bh, s_pad, d)
    kf = _pad_seq(k, s_pad).reshape(bh, s_pad, d)
    vf = _pad_seq(v, s_pad).reshape(bh, s_pad, d)
    gf = _pad_seq(g, s_pad).reshape(bh, s_pad, d)
    lse_row = jnp.broadcast_to(
        lse_flat[:, :, 0][:, None, :], (bh, LSE_ROWS, s_pad)
    )
    dsum_row = jnp.broadcast_to(
        dsum[:, :, 0][:, None, :], (bh, LSE_ROWS, s_pad)
    )

    n_blk = s_pad // block
    full = lambda: pl.BlockSpec((None, s_pad, d), lambda b_, i: (b_, 0, 0))  # noqa: E731
    blk = lambda: pl.BlockSpec((None, block, d), lambda b_, i: (b_, i, 0))  # noqa: E731
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _hybrid_bwd_kernel, block=block, tile=tile, window=window,
            seq_len=s if s != s_pad else None, s_pad=s_pad,
        ),
        grid=(bh, n_blk),
        in_specs=[
            full(), full(), full(), full(),
            pl.BlockSpec((None, block, LSE_LANES), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, block, LSE_LANES), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, LSE_ROWS, s_pad), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((None, LSE_ROWS, s_pad), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=[blk(), blk(), blk()],
        out_shape=[jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=7 * bh * s_pad * s_pad * d,  # ~7 matmuls over causal half
            bytes_accessed=7 * bh * s_pad * d * q.dtype.itemsize,
            transcendentals=bh * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lse_flat, dsum_flat, lse_row, dsum_row)

    def unflat(x):
        x = x.reshape(b, h, s_pad, d)
        return x[:, :, :s, :] if s_pad != s else x

    return unflat(dq), unflat(dk), unflat(dv)


# Long-S backward implementation above WHOLE_ROW_MAX_SEQ: "fused" (one
# pallas_call, VMEM-resident operands — default) or "loop" (the two-call
# dq/dkv streaming family, also the fp32 and >WEDGE_FWD_MAX_SEQ path).
LONG_BWD_IMPL = _os0.environ.get("DALLE_TPU_ATTN_LONG_BWD", "fused")


def _flash_backward(
    q, k, v, out, lse_flat, g, window, block_q, block_k, interpret
):
    b, h, s, d = q.shape
    if _round_up(s, 128) <= WHOLE_ROW_MAX_SEQ:
        if SHORT_IMPL == "wedge":
            return _wedge_backward(q, k, v, out, lse_flat, g, window,
                                   interpret)
        return _wr_backward(q, k, v, out, lse_flat, g, window, interpret)
    if (LONG_BWD_IMPL == "fused" and SHORT_IMPL == "wedge"
            and q.dtype.itemsize <= 2
            and _round_up(s, 128) <= WEDGE_FWD_MAX_SEQ):
        # pairs with the hybrid wedge forward (same gates) — under a
        # DALLE_TPU_ATTN_SHORT=wr override the loop family stays end to end
        return _hybrid_backward(q, k, v, out, lse_flat, g, window, interpret)
    block_q = min(block_q, s)
    block_k = min(block_k, s)
    s_pad = lse_flat.shape[1]
    # The grids tile s_pad — which the FORWARD chose (under the hybrid
    # wedge-fwd regime it is a multiple of the wedge block, not of s or of
    # DEFAULT_BWD_BLOCK) — so blocks that don't divide it fall back to the
    # largest power-of-two tile that does (256 by construction of
    # _wedge_long_cap; 128 is always valid, everything is 128-aligned).
    if s_pad % block_q:
        block_q = 256 if s_pad % 256 == 0 else 128
    if s_pad % block_k:
        block_k = 256 if s_pad % 256 == 0 else 128
    bh = b * h

    # rowsum(dO ∘ O), lane-replicated like lse
    dsum = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dsum = _pad_seq(dsum[..., None], s_pad).reshape(bh, s_pad, 1)
    dsum = jnp.broadcast_to(dsum, (bh, s_pad, LSE_LANES))

    qf = _pad_seq(q, s_pad).reshape(bh, s_pad, d)
    kf = _pad_seq(k, s_pad).reshape(bh, s_pad, d)
    vf = _pad_seq(v, s_pad).reshape(bh, s_pad, d)
    # padded do rows are zero -> padded rows contribute nothing to dk/dv
    gf = _pad_seq(g, s_pad).reshape(bh, s_pad, d)

    common = dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, block_k=block_k, window=window, seq_len=s
        ),
        grid=(bh, s_pad // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, s_pad, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((None, s_pad, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((None, block_q, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, block_q, LSE_LANES), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, block_q, LSE_LANES), lambda b_, i: (b_, i, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
        **common,
    )(qf, kf, vf, gf, lse_flat, dsum)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, block_q=block_q, window=window, seq_len=s
        ),
        grid=(bh, s_pad // block_k),
        in_specs=[
            pl.BlockSpec((None, s_pad, d), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((None, block_k, d), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((None, s_pad, d), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((None, s_pad, LSE_LANES), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((None, s_pad, LSE_LANES), lambda b_, j: (b_, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_k, d), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda b_, j: (b_, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
        ],
        **common,
    )(qf, kf, vf, gf, lse_flat, dsum)

    def unflat(x):
        x = x.reshape(b, h, s_pad, d)
        return x[:, :, :s, :] if s_pad != s else x

    return unflat(dq), unflat(dk), unflat(dv)


# Backward implementation: "pallas" (fused dq/dkv kernels, no [S, S]
# transients — fastest measured on v5e) or "xla" (rematerialize through the
# reference impl). Module-level switch, overridable per-deployment via the
# DALLE_TPU_ATTN_BWD env var.
import os as _os  # noqa: E402

BACKWARD_IMPL = _os.environ.get("DALLE_TPU_ATTN_BWD", "pallas")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _flash_attention(
    q, k, v, window, block_q, block_k, bwd_block_q, bwd_block_k, interpret,
    bwd_impl,
):
    return _flash_forward(q, k, v, window, block_q, block_k, interpret)


def _flash_fwd(
    q, k, v, window, block_q, block_k, bwd_block_q, bwd_block_k, interpret,
    bwd_impl,
):
    from jax.ad_checkpoint import checkpoint_name  # noqa: PLC0415

    if bwd_impl == "pallas":
        out, lse = _flash_forward(
            q, k, v, window, block_q, block_k, interpret, with_lse=True
        )
        # Name the kernel's outputs so jax.checkpoint policies can KEEP them
        # (save_only_these_names("attn_out", "attn_lse", ...)) — then the
        # flash forward is not re-run during the backward pass under remat,
        # unlike dot-based policies which cannot see inside a pallas_call.
        out = checkpoint_name(out, "attn_out")
        lse = checkpoint_name(lse, "attn_lse")
        return out, (q, k, v, out, lse)
    out = _flash_forward(q, k, v, window, block_q, block_k, interpret)
    out = checkpoint_name(out, "attn_out")
    return out, (q, k, v, None, None)


def _flash_bwd(
    window, block_q, block_k, bwd_block_q, bwd_block_k, interpret, bwd_impl,
    res, g,
):
    q, k, v, out, lse = res
    if bwd_impl == "pallas":
        return _flash_backward(
            q, k, v, out, lse, g, window, bwd_block_q, bwd_block_k, interpret
        )
    # Rematerialize attention with the XLA implementation and differentiate
    # it — no [S, S] tensors were saved by the forward.
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_reference(q_, k_, v_, True, window), q, k, v
    )
    return vjp(g)


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ---- attention-weight dropout path (wedge family only). A separate
# custom_vjp keeps the no-dropout fast path untouched; the seed is a traced
# int32 array (cotangent float0), so changing seeds never recompiles.

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _wedge_attention_dropout(q, k, v, seed, window, interpret, rate):
    out, _ = _wedge_forward(q, k, v, window, interpret, with_lse=True,
                            dropout_rate=rate, dropout_seed=seed)
    return out


def _wedge_dropout_fwd(q, k, v, seed, window, interpret, rate):
    from jax.ad_checkpoint import checkpoint_name  # noqa: PLC0415

    out, lse = _wedge_forward(q, k, v, window, interpret, with_lse=True,
                              dropout_rate=rate, dropout_seed=seed)
    out = checkpoint_name(out, "attn_out")
    lse = checkpoint_name(lse, "attn_lse")
    return out, (q, k, v, seed, out, lse)


def _wedge_dropout_bwd(window, interpret, rate, res, g):
    import numpy as _np  # noqa: PLC0415

    q, k, v, seed, out, lse = res
    dq, dk, dv = _wedge_backward(q, k, v, out, lse, g, window, interpret,
                                 dropout_rate=rate, dropout_seed=seed)
    dseed = _np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dseed


_wedge_attention_dropout.defvjp(_wedge_dropout_fwd, _wedge_dropout_bwd)



def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    window: int | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    bwd_block_q: int | None = None,
    bwd_block_k: int | None = None,
    use_pallas: bool | None = None,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """Causal (optionally banded/local) multi-head attention.

    q, k, v: [batch, heads, seq, head_dim]. ``window=r`` reproduces the
    reference's ``local_attention_1d(radius=r)`` capability
    (models.py:257-273) as a band mask. Dispatches to the Pallas kernel on
    TPU, to the XLA reference elsewhere.

    ``dropout_rate`` drops attention WEIGHTS with inverted scaling (mtf
    attention's dropout_rate arg). In the wedge regime it runs INSIDE the
    kernel via a coordinate-hash keep mask — no [S, S] tensor anywhere;
    outside it (long sequences, non-pallas backends) it falls back to the
    dense XLA reference.
    """
    if use_pallas is None:
        use_pallas = _on_tpu() or interpret
    d = q.shape[-1]
    if use_pallas and d % 128 == 0:
        s = q.shape[-2]
        if dropout_rate > 0.0 and dropout_rng is not None:
            # the in-kernel dropout exists only in the wedge family: under a
            # DALLE_TPU_ATTN_SHORT=wr override fall back to the dense
            # reference instead of silently switching kernel families
            if _round_up(s, 128) <= WHOLE_ROW_MAX_SEQ and SHORT_IMPL == "wedge":
                seed = jax.random.randint(
                    dropout_rng, (1, 1), 0, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32,
                )
                return _wedge_attention_dropout(
                    q, k, v, seed, window, interpret, float(dropout_rate)
                )
            return attention_reference(
                q, k, v, True, window, dropout_rate, dropout_rng
            )
        # loop-family autotune: {"loop": {"<s128>,<itemsize>": [bq, bk,
        # bwd_q, bwd_k]}} — applied only where the caller left the
        # defaults. The backward reuses the FORWARD's padded length
        # (s_pad = round_up(s, bq); _flash_backward pads to
        # lse.shape[1]), so bwd entries apply only if they divide s_pad.
        if _round_up(s, 128) > WHOLE_ROW_MAX_SEQ:
            tuned = _tune_table().get("loop", {}).get(
                f"{_round_up(s, 128)},{q.dtype.itemsize}"
            )
            if tuned and block_q == DEFAULT_BLOCK_Q and block_k == DEFAULT_BLOCK_K:
                block_q, block_k = int(tuned[0]), int(tuned[1])
                s_pad = -(-s // block_q) * block_q
                if (bwd_block_q is None and len(tuned) > 2
                        and s_pad % int(tuned[2]) == 0):
                    bwd_block_q = int(tuned[2])
                if (bwd_block_k is None and len(tuned) > 3
                        and s_pad % int(tuned[3]) == 0):
                    bwd_block_k = int(tuned[3])
        if bwd_block_q is None:
            bwd_block_q = DEFAULT_BWD_BLOCK if s % DEFAULT_BWD_BLOCK == 0 else block_q
        if bwd_block_k is None:
            bwd_block_k = DEFAULT_BWD_BLOCK if s % DEFAULT_BWD_BLOCK == 0 else block_k
        return _flash_attention(
            q, k, v, window, block_q, block_k, bwd_block_q, bwd_block_k,
            interpret, BACKWARD_IMPL,
        )
    return attention_reference(
        q, k, v, True, window, dropout_rate, dropout_rng
    )


def _axis_is_manual(ax: str) -> bool:
    """True when ``ax`` is already a bound (manual/shard_map) axis in the
    current trace — nesting another shard_map over it would be invalid."""
    try:
        jax.lax.axis_index(ax)
        return True
    except Exception:
        return False


def _resolve_tp_mesh(batch_axis: str | None, heads_axis: str | None):
    """THE shared wrap policy for running Mosaic kernels under DP/TP
    (used by both causal_attention_tp and the packed family — keep the
    rules here so the two arms cannot drift).

    Returns ``(mesh, ba, ha)`` where ba/ha are the batch/heads mesh axes
    a shard_map should map over, or ``(None, None, None)`` when no wrap
    applies: no ambient mesh, neither axis present with size > 1, or the
    trace is already inside a manual region (nesting would be invalid)."""
    from dalle_mtf_tpu.ops.ring_attention import ambient_mesh  # noqa: PLC0415

    mesh = ambient_mesh()
    if mesh is None:
        return None, None, None
    ba = (batch_axis if batch_axis in mesh.axis_names
          and mesh.shape[batch_axis] > 1 else None)
    ha = (heads_axis if heads_axis in mesh.axis_names
          and mesh.shape[heads_axis] > 1 else None)
    if ba is None and ha is None:
        return None, None, None
    if any(_axis_is_manual(ax) for ax in mesh.axis_names):
        return None, None, None
    return mesh, ba, ha


def _fold_shard_rng(rng: jax.Array, ba: str | None, ha: str | None,
                    nh: int) -> jax.Array:
    """Decorrelate dropout across shards: fold the base rng with the
    device's global (batch, heads) shard index (batch-major), the same
    scheme ring_attention_auto uses. ``nh`` = heads-axis size (1 if
    unsharded)."""
    ix = jnp.zeros((), jnp.int32)
    if ba is not None:
        ix = ix + jax.lax.axis_index(ba) * nh
    if ha is not None:
        ix = ix + jax.lax.axis_index(ha)
    return jax.random.fold_in(rng, ix)


def causal_attention_tp(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    window: int | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    batch_axis: str | None = None,
    heads_axis: str | None = None,
    interpret: bool = False,
) -> jax.Array:
    """``causal_attention`` under data/tensor parallelism.

    GSPMD cannot auto-partition Mosaic custom calls ("Mosaic kernels
    cannot be automatically partitioned") — a fact the CPU multichip
    dryruns never see because off-TPU attention falls back to the XLA
    reference, and single-chip runs never partition. Discovered by the r5
    AOT compile of dalle_12B against a real v5e:8x16 topology
    (tools/aot_12b.py). The fix is the same shape as ring_attention_auto:
    when the ambient mesh shards the batch dim over ``batch_axis`` (DP)
    and/or heads over ``heads_axis`` (TP), run the kernel inside a
    shard_map over exactly those axes — attention is independent per
    (batch, head), so each device executes the unmodified kernel on its
    local shard and the result is bitwise the unsharded computation.

    Dropout stays decorrelated across shards: the base rng is folded with
    the device's (batch, heads) axis index before the kernel derives its
    coordinate-hash seed (same scheme as ring_attention_auto).

    Degrades to plain ``causal_attention`` when no mesh/axis applies, an
    axis is already manual (inside an outer shard_map — e.g. a pipeline
    stage), or a dim is not divisible by its axis (GSPMD pads XLA ops but
    shard_map cannot; the dense reference handles that rare case).
    """
    plain = functools.partial(
        causal_attention, window=window, dropout_rate=dropout_rate,
        dropout_rng=dropout_rng, interpret=interpret,
    )
    if not (_on_tpu() or interpret):
        return plain(q, k, v)
    mesh, ba, ha = _resolve_tp_mesh(batch_axis, heads_axis)
    if mesh is None:
        return plain(q, k, v)
    b, h = q.shape[0], q.shape[1]
    if (ba and b % mesh.shape[ba]) or (ha and h % mesh.shape[ha]):
        # non-dividing shard: shard_map cannot pad, the dense reference
        # partitions fine under GSPMD
        return attention_reference(
            q, k, v, True, window, dropout_rate, dropout_rng
        )
    from jax import shard_map  # noqa: PLC0415
    from jax.sharding import PartitionSpec as P  # noqa: PLC0415

    if dropout_rng is None:
        dropout_rng = jax.random.PRNGKey(0)  # unused (rate 0 inside)
        rate = 0.0
    else:
        rate = float(dropout_rate)
    nh = mesh.shape[ha] if ha is not None else 1

    def body(q_, k_, v_, rng_):
        if rate > 0.0:
            rng_ = _fold_shard_rng(rng_, ba, ha, nh)
        return causal_attention(
            q_, k_, v_, window=window,
            dropout_rate=rate, dropout_rng=rng_ if rate > 0.0 else None,
            interpret=interpret,
        )

    spec = P(ba, ha, None, None)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec, P()),
        out_specs=spec,
        check_vma=False,  # pallas outputs opaque to vma inference (ring)
    )
    return fn(q, k, v, dropout_rng)


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    position: jax.Array,
    window: int | None = None,
) -> jax.Array:
    """Single-position attention against a KV cache.

    q: [B, H, 1, D]; k_cache/v_cache: [B, H, S, D] with valid entries in
    [0, position]. ``window`` applies the same local band as training-time
    attention so local models decode from the distribution they trained on.
    Completes the incremental-inference path the reference only scaffolded
    (models.py:246-254). Small enough that XLA's fused matmul+softmax is at
    speed-of-light; no kernel needed.
    """
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k_cache, preferred_element_type=jnp.float32
    ) * scale
    s = k_cache.shape[-2]
    j = jnp.arange(s)[None, None, None, :]
    mask = j > position
    if window is not None:
        mask = jnp.logical_or(mask, position - j >= window)
    scores = jnp.where(mask, NEG_INF, scores)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v_cache.dtype), v_cache,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)
