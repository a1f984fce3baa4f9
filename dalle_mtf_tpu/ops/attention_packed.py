"""Packed-layout fused wedge attention: [B, S, H*D] in, [B, S, H*D] out.

The r1-r3 kernel families (ops/attention.py) take q/k/v as [B, H, S, D].
Producing that layout from the QKV projections costs a materialized
transpose-copy per tensor (the einsum ``bse,ehd->bhsd`` lowers to matmul +
copy), the scan-over-layers remat stack then saves the transposed layout
(more fixup copies on the backward reads), and the per-q-block pallas
calls add host-side prefix slices, output concatenates, and two 94 MB
broadcast-materialized lse/dsum operands. The r4 trace decomposition
(BENCH.md "Step profile") measured ~15-20 ms/step of such scaffolding at
the dalle_coco bench shape — pure data movement XLA cannot elide because
the layout changes and pallas operand shapes force it.

This module removes the scaffolding structurally instead of nudging XLA:

- **Packed layout.** Kernels consume the projections' NATURAL output
  layout [B, S, H*D]: each grid program slices its head's 128-lane column
  block via the BlockSpec index map (head_dim is a lane multiple, so the
  column slice is tile-aligned — clean DMA, no transpose anywhere). The
  output is written back packed, so the out-projection consumes it as a
  plain [B*S, E] x [E, E] matmul. The remat stack saves natural-layout
  dot outputs; the backward's stacked reads need no layout fixup.
- **In-kernel wedge unroll.** One pallas_call per direction with the
  per-q-block wedge loop UNROLLED INSIDE the kernel (full q/k/v/do for
  one (batch, head) are VMEM-resident at these shapes): no host prefix
  slices, no output concatenates, no cross-call accumulators. Causal
  block-skip is preserved — section i computes scores only against keys
  [k0, (i+1)*block).
- **Compact lse/dsum.** Per-row scalars travel as [B*H, 1, S_pad] f32
  row vectors (~6 MB physical) instead of 128-lane-replicated
  [B*H, S_pad, 128] tensors (94 MB each, broadcast-materialized by XLA
  before every backward call). The dQ half reads its [block, 1] column
  view via an in-kernel sublane<->lane ``swapaxes`` of the row slice
  (Mosaic-supported, measured bit-exact); the dK/dV half reads row
  slices directly, as the per-call kernels already did. A welcome side
  effect: the row form is block-size-agnostic, so forward and backward
  may pick different wedge blocks without renormalizing lse.

Numerics are identical to the per-call wedge family: same block math,
same mask construction, same one-shot softmax, same coordinate-hash
dropout keyed on global (row, col, seed + program_id) coordinates (the
flat B*H grid ordering matches, so masks are bit-identical).

Reference parity note: this implements the same capability as mtf's
``mtf_transformer.attention.attention`` with the additive causal mask
(reference src/dalle_mtf/models.py:221-227, 287-299) and the
``local_attention_1d`` radius (models.py:257-273) via ``window``; the
layout is an implementation detail invisible at the model surface.

Dispatch: `causal_attention_packed` runs the fused kernels when the
shape qualifies (TPU or interpret, head_dim a lane multiple, wedge
regime, bf16-or-narrower, VMEM model passes); anything else unpacks to
[B, H, S, D] and defers to ops.attention's dispatcher — costing exactly
the transposes the caller would have paid anyway.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dalle_mtf_tpu.ops.attention import (
    NEG_INF,
    SHORT_IMPL,
    WHOLE_ROW_MAX_SEQ,
    _dropout_keep,
    _on_tpu,
    _round_up,
    _tune_table,
    _wedge_k0,
    causal_attention,
)

# VMEM working-set budget for the fused kernels (bytes), charging THREE
# [block, s_pad] fp32 score-class tiles (scores + exp'd weights + one
# fusion temporary — a 2-tile charge let the S=2560 forward pick block
# 512, which Mosaic measured at 17.02 MB stack and refused). Calibrated
# so the proven dalle_coco layout survives: at s_pad 1280 the 3-tile
# model still yields block 640 (12.1 MB backward), while S=2560 drops to
# block 256 with NO row padding (the 11 MB/2-tile model of the first cut
# instead padded 1280 -> 1536, +8 ms/step — see BENCH.md r4 study).
# DALLE_TPU_FUSED_VMEM_MB overrides per chip generation: the v5e-calibrated
# 13 MB landed a 16.32 MB Mosaic stack that v5p's 16.00 MB scoped limit
# refused by 2% (r5 dalle_12B AOT, tools/aot_12b.py) — 12 MB compiles there.
import os as _os_ap  # noqa: E402

_FUSED_VMEM_BUDGET = int(
    float(_os_ap.environ.get("DALLE_TPU_FUSED_VMEM_MB", "13")) * (1 << 20)
)


def _fused_block(s_pad: int, d: int, itemsize: int, bwd: bool) -> int:
    """Largest 128-multiple wedge block the fused kernel can run at, or 0
    if even a 128 block overflows the budget (-> caller falls back to the
    per-call family)."""
    operands = (7 if bwd else 4) * s_pad * d * itemsize
    score_bufs = 3
    avail = _FUSED_VMEM_BUDGET - operands
    if avail <= 0:
        return 0
    cap = avail // (score_bufs * 4 * s_pad) // 128 * 128
    return max(0, cap)


def _packed_layout(s: int, itemsize: int, bwd: bool, d: int):
    """(block, s_pad, n_blk) for the fused kernels: the per-call wedge's
    tuned/default cap, further clamped by the fused VMEM model. Returns
    (0, s_pad, 0) when the fused kernel cannot fit.

    An autotune-table entry ``{"packed": {"<s128>,<itemsize>,<d>": {"fwd":
    b, "bwd": b}}}`` overrides BOTH the wedge cap and the VMEM clamp — the
    autotuner only records candidates that compiled and ran on the
    tuning chip, which is strictly better evidence than the analytic
    model (the model exists to pick safe defaults untuned). But that
    evidence is only valid at the head_dim it was gathered at (the
    operand charge is s_pad*d): legacy d-less keys were tuned at d=128
    and are honored only for d <= 128, where the working set is no
    larger than what the tuning chip proved — a bigger d falls back to
    the analytic model instead of risking a Mosaic scoped-VMEM crash."""
    from dalle_mtf_tpu.ops.attention import _wedge_layout  # noqa: PLC0415

    s128 = _round_up(s, 128)
    packed_table = _tune_table().get("packed", {})
    tuned = packed_table.get(f"{s128},{itemsize},{d}")
    if tuned is None and d <= 128:
        tuned = packed_table.get(f"{s128},{itemsize}")
    if tuned:
        blk = _round_up(int(tuned["bwd" if bwd else "fwd"]), 128)
        n = -(-s128 // blk)
        blk = _round_up(-(-s128 // n), 128)
        return blk, blk * n, n
    block, s_pad, n = _wedge_layout(s, itemsize)
    cap = _fused_block(s_pad, d, itemsize, bwd)
    if cap == 0:
        return 0, s_pad, 0
    if block > cap:
        n = -(-s_pad // cap)
        block = _round_up(-(-s_pad // n), 128)
        if block > cap:
            return 0, s_pad, 0
        s_pad = block * n
    return block, s_pad, n


def _pad_rows(x, s_pad):
    s = x.shape[1]
    if s_pad == s:
        return x
    return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))


# ------------------------------------------------------------------ kernels


def _fused_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                      block: int, n_blk: int, window, seq_len,
                      dropout_rate: float):
    """All wedge q-blocks for one (batch, head), unrolled. Refs are
    [s_pad, d]; lse_ref (optional) is [1, s_pad]."""
    d = q_ref.shape[-1]
    scale = 1.0 / math.sqrt(d)
    for i in range(n_blk):
        i0, s_pre = i * block, (i + 1) * block
        k0 = _wedge_k0(i, block, window)
        s_k = s_pre - k0
        qb = q_ref[i0:s_pre, :]
        s = jax.lax.dot_general(
            qb, k_ref[k0:s_pre, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        row = jax.lax.broadcasted_iota(jnp.int32, (block, s_k), 0) + i0
        col = jax.lax.broadcasted_iota(jnp.int32, (block, s_k), 1) + k0
        mask = col > row
        if seq_len is not None:
            mask = jnp.logical_or(mask, col >= seq_len)
        if window is not None:
            mask = jnp.logical_or(mask, row - col >= window)
        s = jnp.where(mask, NEG_INF, s)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        l_safe = jnp.maximum(l, 1e-30)
        if dropout_rate > 0.0:
            seed = seed_ref[0, 0] + pl.program_id(0)
            keep = _dropout_keep(row, col, seed, dropout_rate)
            p_v = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
        else:
            p_v = p
        o = jax.lax.dot_general(
            p_v.astype(v_ref.dtype), v_ref[k0:s_pre, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[i0:s_pre, :] = (o / l_safe).astype(o_ref.dtype)
        if lse_ref is not None:
            lse = m + jnp.log(l_safe)  # [block, 1]
            lse_ref[0:1, i0:s_pre] = jnp.swapaxes(lse, 0, 1)


def _fused_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                      dsum_ref, dq_ref, dk_ref, dv_ref, *,
                      block: int, n_blk: int, s_pad: int, window, seq_len,
                      dropout_rate: float):
    """dQ(block i) + dK/dV(block i) for every wedge block, unrolled.
    q/k/v/do/dq/dk/dv refs: [s_pad, d]; lse_ref/dsum_ref: [1, s_pad]
    (compact row form — the dQ half transposes its column view
    in-kernel). Same section math as attention._wedge_bwd_kernel."""
    d = q_ref.shape[-1]
    scale = 1.0 / math.sqrt(d)
    inv = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
    for i in range(n_blk):
        i0, s_pre = i * block, (i + 1) * block
        s_suf = s_pad - i0
        qb = q_ref[i0:s_pre, :]
        dob = do_ref[i0:s_pre, :]
        lse_col = jnp.swapaxes(lse_ref[0:1, i0:s_pre], 0, 1)   # [block, 1]
        dsum_col = jnp.swapaxes(dsum_ref[0:1, i0:s_pre], 0, 1)

        # ---- dQ half: q rows [i0, s_pre) vs key prefix [0, s_pre)
        row = jax.lax.broadcasted_iota(jnp.int32, (block, s_pre), 0) + i0
        col = jax.lax.broadcasted_iota(jnp.int32, (block, s_pre), 1)
        mask = col > row
        if seq_len is not None:
            mask = jnp.logical_or(mask, col >= seq_len)
        if window is not None:
            mask = jnp.logical_or(mask, row - col >= window)
        kpre = k_ref[0:s_pre, :]
        s = jax.lax.dot_general(
            qb, kpre, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        p = jnp.where(mask, 0.0, jnp.exp(s - lse_col))
        dp = jax.lax.dot_general(
            dob, v_ref[0:s_pre, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_rate > 0.0:
            seed = seed_ref[0, 0] + pl.program_id(0)
            keep = _dropout_keep(row, col, seed, dropout_rate)
            dp = jnp.where(keep, dp * inv, 0.0)
        ds = (p * (dp - dsum_col)).astype(k_ref.dtype)
        dq = jax.lax.dot_general(
            ds, kpre, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[i0:s_pre, :] = (dq * scale).astype(dq_ref.dtype)

        # ---- dK/dV half: key rows [i0, s_pre) vs query suffix [i0, s_pad)
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
        pT = jnp.where(maskT, 0.0, jnp.exp(sT - lse_ref[0:1, i0:]))
        if dropout_rate > 0.0:
            seed = seed_ref[0, 0] + pl.program_id(0)
            keepT = _dropout_keep(qcol, krow, seed, dropout_rate)
            pT_v = jnp.where(keepT, pT * inv, 0.0)
        else:
            keepT = None
            pT_v = pT
        dv = jax.lax.dot_general(
            pT_v.astype(dosuf.dtype), dosuf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv_ref[i0:s_pre, :] = dv.astype(dv_ref.dtype)
        dpT = jax.lax.dot_general(
            vb, dosuf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if keepT is not None:
            dpT = jnp.where(keepT, dpT * inv, 0.0)
        dsT = (pT * (dpT - dsum_ref[0:1, i0:])).astype(qsuf.dtype)
        dk = jax.lax.dot_general(
            dsT, qsuf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_ref[i0:s_pre, :] = (dk * scale).astype(dk_ref.dtype)


# ----------------------------------------------------------------- wrappers


def _head_spec(s_pad, d, h):
    """BlockSpec slicing one head's [s_pad, d] column block out of a
    packed [b, s_pad, h*d] array for flat grid point g = b*h + head."""
    return pl.BlockSpec((None, s_pad, d), lambda g, h=h: (g // h, 0, g % h))


def _fused_forward(q, k, v, n_heads, window, interpret, with_lse=False,
                   dropout_rate=0.0, dropout_seed=None):
    b, s, e = q.shape
    h = n_heads
    d = e // h
    bh = b * h
    block, s_pad, n_blk = _packed_layout(s, q.dtype.itemsize, False, d)
    assert block > 0, "caller must check packed eligibility"
    qf, kf, vf = (_pad_rows(t, s_pad) for t in (q, k, v))
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1, 1), jnp.int32)
    seed = jnp.reshape(dropout_seed, (1, 1)).astype(jnp.int32)
    seq_len = s if s != s_pad else None

    out_shapes = [jax.ShapeDtypeStruct((b, s_pad, e), q.dtype)]
    out_specs = [_head_spec(s_pad, d, h)]
    if with_lse:
        out_shapes.append(jax.ShapeDtypeStruct((bh, 1, s_pad), jnp.float32))
        out_specs.append(pl.BlockSpec((None, 1, s_pad), lambda g: (g, 0, 0)))

    kern = functools.partial(_fused_fwd_kernel, block=block, n_blk=n_blk,
                             window=window, seq_len=seq_len,
                             dropout_rate=dropout_rate)
    if not with_lse:
        kern = functools.partial(
            lambda s_, q_, k_, v_, o_, kk: kk(s_, q_, k_, v_, o_, None),
            kk=kern)
    # causal wedge FLOPs: sum_i 2 matmuls over [block, (i+1)block] tiles
    tiles = n_blk * (n_blk + 1) // 2
    res = pl.pallas_call(
        kern,
        grid=(bh,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_head_spec(s_pad, d, h)] * 3,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * tiles * block * block * d,
            bytes_accessed=bh * 4 * s_pad * d * q.dtype.itemsize,
            transcendentals=bh * tiles * block * block,
        ),
        interpret=interpret,
    )(seed, qf, kf, vf)
    res = res if isinstance(res, (list, tuple)) else [res]
    out = res[0][:, :s, :] if s_pad != s else res[0]
    if with_lse:
        return out, res[1]
    return out


def _fused_backward(q, k, v, out, lse_row, g, n_heads, window, interpret,
                    dropout_rate=0.0, dropout_seed=None):
    b, s, e = q.shape
    h = n_heads
    d = e // h
    bh = b * h
    block, s_pad, n_blk = _packed_layout(s, q.dtype.itemsize, True, d)
    assert block > 0, "caller must check packed eligibility"
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1, 1), jnp.int32)
    seed = jnp.reshape(dropout_seed, (1, 1)).astype(jnp.int32)
    seq_len = s if s != s_pad else None

    # per-head d(out)·out row sums, in the compact [bh, 1, s_pad] row
    # form. One fused einsum over the bf16 operands with f32 accumulation
    # — numerically identical to upcast-then-multiply (bf16 products are
    # exact in f32) without materializing a 94 MB f32 copy of the
    # cotangent (measured 9 ms/step as astype + multiply + relayout).
    dsum = jnp.einsum(
        "bshd,bshd->bhs",
        g.reshape(b, s, h, d),
        out.reshape(b, s, h, d),
        preferred_element_type=jnp.float32,
    )
    dsum_row = dsum.reshape(bh, 1, s)
    if s_pad != s:
        dsum_row = jnp.pad(dsum_row, ((0, 0), (0, 0), (0, s_pad - s)))
    # forward may have padded to a different s_pad (its own block choice)
    if lse_row.shape[-1] < s_pad:
        lse_row = jnp.pad(
            lse_row, ((0, 0), (0, 0), (0, s_pad - lse_row.shape[-1])))
    elif lse_row.shape[-1] > s_pad:
        lse_row = lse_row[..., :s_pad]

    qf, kf, vf, gf = (_pad_rows(t, s_pad) for t in (q, k, v, g))
    row_spec = pl.BlockSpec((None, 1, s_pad), lambda g_: (g_, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, block=block, n_blk=n_blk,
                          s_pad=s_pad, window=window, seq_len=seq_len,
                          dropout_rate=dropout_rate),
        grid=(bh,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_head_spec(s_pad, d, h)] * 4 + [row_spec, row_spec],
        out_specs=[_head_spec(s_pad, d, h)] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, s_pad, e), q.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(seed, qf, kf, vf, gf, lse_row, dsum_row)

    if s_pad != s:
        dq, dk, dv = (t[:, :s, :] for t in (dq, dk, dv))
    return dq, dk, dv


# --------------------------------------------------------------- custom_vjp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _packed_attention(q, k, v, seed, n_heads, window, interpret, rate):
    out, _ = _fused_forward(q, k, v, n_heads, window, interpret,
                            with_lse=True, dropout_rate=rate,
                            dropout_seed=seed)
    return out


def _packed_fwd(q, k, v, seed, n_heads, window, interpret, rate):
    from jax.ad_checkpoint import checkpoint_name  # noqa: PLC0415

    out, lse = _fused_forward(q, k, v, n_heads, window, interpret,
                              with_lse=True, dropout_rate=rate,
                              dropout_seed=seed)
    out = checkpoint_name(out, "attn_out")
    lse = checkpoint_name(lse, "attn_lse")
    return out, (q, k, v, seed, out, lse)


def _packed_bwd(n_heads, window, interpret, rate, res, g):
    import numpy as _np  # noqa: PLC0415

    q, k, v, seed, out, lse = res
    dq, dk, dv = _fused_backward(q, k, v, out, lse, g, n_heads, window,
                                 interpret, dropout_rate=rate,
                                 dropout_seed=seed)
    dseed = _np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dseed


_packed_attention.defvjp(_packed_fwd, _packed_bwd)


# ----------------------------------------------------------------- dispatch


def packed_kernel_eligible(s: int, e: int, n_heads: int,
                           itemsize: int = 2) -> bool:
    """True when causal_attention_packed will run the fused kernels for
    this shape (vs unpacking to the [B, H, S, D] dispatcher)."""
    if e % n_heads:
        return False
    d = e // n_heads
    if d % 128 or itemsize > 2 or SHORT_IMPL != "wedge":
        return False
    s128 = _round_up(s, 128)
    if s128 > WHOLE_ROW_MAX_SEQ:
        return False
    fwd = _packed_layout(s, itemsize, False, d)[0]
    bwd = _packed_layout(s, itemsize, True, d)[0]
    return fwd > 0 and bwd > 0


def causal_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    n_heads: int,
    window: int | None = None,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    batch_axis: str | None = None,
    heads_axis: str | None = None,
) -> jax.Array:
    """Causal multi-head attention over packed [B, S, H*D] tensors.

    Same semantics as ops.attention.causal_attention (scores scaled by
    head_dim^-0.5, additive -1e10 causal/window mask, attention-weight
    dropout with inverted scaling — reference models.py:221-227, 287-299)
    with heads folded into the last axis. Runs the fused packed kernels
    when the shape qualifies; otherwise unpacks and defers.

    ``batch_axis``/``heads_axis``: mesh axes the batch dim / folded heads
    dim shard over. Mosaic custom calls cannot be auto-partitioned by
    GSPMD (see ops.attention.causal_attention_tp) — when the ambient mesh
    actually shards those axes, the packed kernel runs inside a shard_map
    over them, each device on its local (batch, heads) shard.
    """
    b, s, e = q.shape
    use_pallas = _on_tpu() or interpret
    if use_pallas and (batch_axis or heads_axis):
        # mesh/axis resolution + manual-region guard + per-shard rng fold
        # are THE shared policy in ops.attention (_resolve_tp_mesh /
        # _fold_shard_rng) — only the packed [B, S, H*D] specs and the
        # divisibility rule for the folded heads dim live here
        from dalle_mtf_tpu.ops.attention import (  # noqa: PLC0415
            _fold_shard_rng,
            _resolve_tp_mesh,
        )

        mesh, ba, ha = _resolve_tp_mesh(batch_axis, heads_axis)
        if mesh is not None:
            nb = mesh.shape[ba] if ba else 1
            nh = mesh.shape[ha] if ha else 1
            if b % nb == 0 and n_heads % nh == 0:
                from jax import shard_map  # noqa: PLC0415
                from jax.sharding import PartitionSpec as P  # noqa: PLC0415

                rate = (float(dropout_rate)
                        if dropout_rng is not None else 0.0)
                rng = (dropout_rng if dropout_rng is not None
                       else jax.random.PRNGKey(0))

                def body(q_, k_, v_, rng_):
                    if rate > 0.0:
                        rng_ = _fold_shard_rng(rng_, ba, ha, nh)
                    return causal_attention_packed(
                        q_, k_, v_, n_heads // nh, window=window,
                        interpret=interpret, dropout_rate=rate,
                        dropout_rng=rng_ if rate > 0.0 else None,
                    )

                spec = P(ba, None, ha)
                fn = shard_map(
                    body, mesh=mesh,
                    in_specs=(spec, spec, spec, P()),
                    out_specs=spec,
                    check_vma=False,
                )
                return fn(q, k, v, rng)
            # non-dividing shard: the dense reference partitions fine
            from dalle_mtf_tpu.ops.attention import (  # noqa: PLC0415
                attention_reference,
            )

            d = e // n_heads
            qh, kh, vh = (
                t.reshape(b, s, n_heads, d).transpose(0, 2, 1, 3)
                for t in (q, k, v)
            )
            out = attention_reference(
                qh, kh, vh, True, window, dropout_rate, dropout_rng
            )
            return out.transpose(0, 2, 1, 3).reshape(b, s, e)
    if use_pallas and packed_kernel_eligible(s, e, n_heads,
                                             q.dtype.itemsize):
        if dropout_rate > 0.0 and dropout_rng is not None:
            seed = jax.random.randint(
                dropout_rng, (1, 1), 0, jnp.iinfo(jnp.int32).max,
                dtype=jnp.int32,
            )
            return _packed_attention(q, k, v, seed, n_heads, window,
                                     interpret, float(dropout_rate))
        seed = jnp.zeros((1, 1), jnp.int32)
        return _packed_attention(q, k, v, seed, n_heads, window, interpret,
                                 0.0)
    d = e // n_heads
    qh, kh, vh = (
        t.reshape(b, s, n_heads, d).transpose(0, 2, 1, 3) for t in (q, k, v)
    )
    out = causal_attention(qh, kh, vh, window=window, interpret=interpret,
                           dropout_rate=dropout_rate,
                           dropout_rng=dropout_rng)
    return out.transpose(0, 2, 1, 3).reshape(b, s, e)
