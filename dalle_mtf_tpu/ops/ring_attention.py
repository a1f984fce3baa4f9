"""Ring attention: causal attention with the sequence sharded over a mesh axis.

Sequence/context parallelism is absent from the reference (SURVEY §2.3 —
max sequence is ~1.3k tokens and mtf never splits the memory dim,
models.py:268); this op is the capability stretch for the 12B north-star
config (2.3k tokens) and beyond.

Algorithm (causal ring attention / blockwise attention over devices):
every device holds one sequence shard of q, k, v. Over ``n`` ring steps,
k/v shards rotate around the mesh axis via ``ppermute`` (ICI
neighbor-to-neighbor — no all-gather, memory stays O(S/n) per device), and
each device folds the visiting shard into a running flash-attention state
(m, l, acc). Causality at shard granularity: a visiting k/v shard that is
entirely in this device's future contributes nothing; the diagonal shard is
masked triangularly; past shards attend fully.

Two block-math paths:

- **Pallas** (TPU default): per ring step a fused kernel computes the
  partial-softmax triple (num = exp(s−m)·V, m, l) for the visiting shard —
  bf16 into the MXU, fp32 accumulate, no [Sq, Sk] tensor in HBM — and the
  fp32 fold runs as O(S·D) XLA vector math. The backward is a full custom-
  VJP ring: (k, v, dk, dv) rotate TOGETHER, each device adding its local
  q-block's gradient contribution to the visiting shard's dk/dv via a
  5-matmul fused kernel (s, dp, dq = ds·K, dk = dsᵀ·Q, dv = pᵀ·dO), so
  dk/dv arrive home fully accumulated after n hops. The shard-causality
  mask is one branchless compare against the (row0−col0) offset delivered
  via SMEM, and fully-masked (future) steps skip compute via ``lax.cond``.
- **XLA** (CPU/debug): the round-1 einsum fold, kept as the reference the
  Pallas path is tested against (tests/test_ring_attention.py,
  tests/test_ring_pallas.py).
"""

from __future__ import annotations

import functools
import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e10
LSE_LANES = 128


def _block_scores(q, k, scale):
    # q: [B, H, Sq, D], k: [B, H, Sk, D] -> [B, H, Sq, Sk] f32
    return jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    causal: bool = True,
    use_pallas: bool | None = None,
    interpret: bool = False,
    window: int | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | None = None,
    heads_total: int | None = None,
) -> jax.Array:
    """Causal attention over a sequence sharded on ``axis_name``.

    Must run inside shard_map/pjit manual context where ``axis_name`` is a
    mesh axis. q, k, v: per-device shards [B, H, S_local, D], where shard i
    holds global positions [i*S_local, (i+1)*S_local). Returns the local
    output shard [B, H, S_local, D]. Dispatches to the Pallas block kernels
    on TPU (or under ``interpret``), to the XLA fold elsewhere.

    ``window`` applies the same local band as causal_attention (masks ride
    the per-hop shard offset). ``dropout_rate`` drops attention WEIGHTS via
    the coordinate-hash keep mask of ops/attention.py keyed on GLOBAL
    (row, col) positions — every ring hop regenerates exactly its tile's
    bits, so SP composes with attention_dropout without any [S, S] tensor
    or cross-shard mask traffic. ``dropout_seed``: traced i32 scalar,
    pre-offset per (batch, head) by the caller (see ring_attention_auto).
    """
    if use_pallas is None:
        use_pallas = _on_tpu() or interpret
    rate = float(dropout_rate) if dropout_seed is not None else 0.0
    if use_pallas and causal and q.shape[-1] % 128 == 0:
        if dropout_seed is None:
            dropout_seed = jnp.zeros((), jnp.int32)
        return _ring_attention_pallas(
            q, k, v, dropout_seed, axis_name, interpret, window, rate,
            heads_total,
        )
    return _ring_attention_xla(
        q, k, v, axis_name, causal, window, rate, dropout_seed, heads_total
    )


def _ring_attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    causal: bool = True,
    window: int | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | None = None,
    heads_total: int | None = None,
) -> jax.Array:
    """Reference XLA fold (round-1 path; differentiable by tracing).

    Same semantics as the Pallas path, including hash dropout: the
    numerator uses dropped weights, the normalizer the undropped sum —
    matching the wedge kernels' convention (attention.py)."""
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, h, s_local, d = q.shape
    scale = 1.0 / math.sqrt(d)

    q32 = q.astype(jnp.float32)
    local_rows = jnp.arange(s_local)

    def fold(carry, kv_and_src):
        acc, m_prev, l_prev = carry
        k_blk, v_blk, src_idx = kv_and_src
        s = _block_scores(q32, k_blk.astype(jnp.float32), scale)
        # global row = my_idx*s_local + r, global col = src_idx*s_local + c
        rows = my_idx * s_local + local_rows[:, None]
        cols = src_idx * s_local + local_rows[None, :]
        if causal:
            s = jnp.where(cols > rows, NEG_INF, s)
        if window is not None:
            s = jnp.where(rows - cols >= window, NEG_INF, s)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        if dropout_rate > 0.0 and dropout_seed is not None:
            from dalle_mtf_tpu.ops.attention import _dropout_keep  # noqa: PLC0415

            ht = heads_total if heads_total is not None else h
            seeds = dropout_seed + (
                jnp.arange(b, dtype=jnp.int32)[:, None] * ht
                + jnp.arange(h, dtype=jnp.int32)[None, :]
            ).reshape(-1)
            keep = jax.vmap(
                lambda sd: _dropout_keep(rows, cols, sd, dropout_rate)
            )(seeds).reshape(b, h, s_local, s_local)
            p_v = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
        else:
            p_v = p
        acc_new = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p_v.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        return (acc_new, m_new, l_new), None

    # ring schedule: at step r this device sees the shard of (my_idx - r) % n.
    # k/v rotate one hop per step (neighbor ppermute -> ICI ring traffic).
    perm = [(i, (i + 1) % n) for i in range(n)]

    def ring_step(r, state):
        carry, k_cur, v_cur = state
        src_idx = (my_idx - r) % n
        carry, _ = fold(carry, (k_cur, v_cur, src_idx))
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return carry, k_nxt, v_nxt

    # derive the initial carry from q so it inherits q's device-varying type
    # over every manual mesh axis (the carry becomes varying after the first
    # fold, and scan requires carry-in/carry-out types to match)
    acc0 = q32 * 0.0
    m0 = q32[..., :1] * 0.0 - jnp.inf
    l0 = q32[..., :1] * 0.0
    (acc, m, l), _k, _v = jax.lax.fori_loop(
        0, n, ring_step, ((acc0, m0, l0), k, v)
    )
    # fully-masked rows (possible under a window at shard granularity) and
    # zero-l protection
    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


from dalle_mtf_tpu.ops.attention import _on_tpu  # noqa: E402


def _pick_row_block(s_local: int) -> int:
    """q-row block tiling s_local exactly: whole shard when small, else the
    largest ≥16-multiple divisor chunking near 640 rows (row/sublane tiling
    only needs multiples of 16; the lane dim is D=128)."""
    if s_local <= 1024:
        return s_local
    n = -(-s_local // 640)
    while n <= s_local // 16:
        if s_local % n == 0 and (s_local // n) % 16 == 0:
            return s_local // n
        n += 1
    return s_local



def _vma_of(x):
    """Varying-across-mesh-axes set of a traced value (needed on pallas_call
    out_shapes under shard_map's check_vma); None outside shard_map."""
    try:
        vma = jax.typeof(x).vma
        return vma if vma else None
    except Exception:  # pragma: no cover - API drift
        return None


def _sds(shape, dtype, vma):
    if vma is None:
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _ring_seed_eff(info_ref, h_local: int, h_total: int):
    """Per-program dropout seed: base (already offset by the device's
    global batch/head position, ring_attention_auto) + the local (b, h)
    flattened GLOBALLY — so seed_eff = base + global_b * H_total +
    global_h, reproducible by a dense reference."""
    pid = pl.program_id(0)
    return info_ref[0, 3] + (pid // h_local) * h_total + pid % h_local


def _ring_fwd_kernel(info_ref, q_ref, k_ref, v_ref, num_ref, m_ref, l_ref,
                     *, block: int, window, rate: float, h_local: int,
                     h_total: int):
    """Partial softmax of one visiting kv shard against a local q block.

    info_ref (SMEM, i32[1, 4]): (diff, row0, col0, seed).
    diff = row0 - col0 = (my_idx - src_idx) * S_local. The shard-causality
    mask is one compare: global col > global row  ⇔  (c - r) > diff —
    diff ≥ S_k means a past shard (nothing masked), diff == 0 the diagonal
    shard (triangle), diff < 0 a future shard (everything masked; the
    caller cond-skips that case). A local ``window`` band rides the same
    offset: global row - col = (r - c) + diff. Hash dropout (rate > 0)
    regenerates the wedge kernels' coordinate-hash keep mask at GLOBAL
    (row0 + r, col0 + c) — identical bits every hop, fwd and bwd.
    Emits num = exp(s - m)·V (fp32; dropped weights), and m, l (undropped
    normalizer) lane-replicated for the fold.
    """
    d = q_ref.shape[-1]
    s_k = k_ref.shape[0]
    scale = 1.0 / math.sqrt(d)
    i = pl.program_id(1)
    s = jax.lax.dot_general(
        q_ref[...], k_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    r = jax.lax.broadcasted_iota(jnp.int32, (block, s_k), 0) + i * block
    c = jax.lax.broadcasted_iota(jnp.int32, (block, s_k), 1)
    diff = info_ref[0, 0]
    mask = c - r > diff
    if window is not None:
        mask = jnp.logical_or(mask, (r - c) + diff >= window)
    s = jnp.where(mask, NEG_INF, s)
    m = jnp.max(s, axis=-1, keepdims=True)  # ≥ NEG_INF, finite
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if rate > 0.0:
        from dalle_mtf_tpu.ops.attention import _dropout_keep  # noqa: PLC0415

        keep = _dropout_keep(
            r + info_ref[0, 1], c + info_ref[0, 2],
            _ring_seed_eff(info_ref, h_local, h_total), rate,
        )
        p_v = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    else:
        p_v = p
    num_ref[...] = jax.lax.dot_general(
        p_v.astype(v_ref.dtype), v_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = jnp.broadcast_to(m, (block, LSE_LANES))
    l_ref[...] = jnp.broadcast_to(l, (block, LSE_LANES))


def _ring_info(diff, row0, col0, seed):
    return jnp.stack(
        [diff.astype(jnp.int32), row0.astype(jnp.int32),
         col0.astype(jnp.int32), seed.astype(jnp.int32)]
    ).reshape(1, 4)


def _ring_partial(q, k, v, info, interpret: bool, window, rate: float,
                  h_total: int):
    """(num, m, l) of the visiting shard. q: [B,H,Sq,D]; k/v: [B,H,Sk,D];
    info: i32[1, 4] (diff, row0, col0, seed)."""
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    bh = b * h
    block = _pick_row_block(s_q)
    qf = q.reshape(bh, s_q, d)
    kf = k.reshape(bh, s_k, d)
    vf = v.reshape(bh, s_k, d)
    n_q = s_q // block
    vma = _vma_of(q)
    num, m, l = pl.pallas_call(
        functools.partial(_ring_fwd_kernel, block=block, window=window,
                          rate=rate, h_local=h, h_total=h_total),
        grid=(bh, n_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, block, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, s_k, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((None, s_k, d), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, block, LSE_LANES), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, block, LSE_LANES), lambda b_, i: (b_, i, 0)),
        ],
        out_shape=[
            _sds((bh, s_q, d), jnp.float32, vma),
            _sds((bh, s_q, LSE_LANES), jnp.float32, vma),
            _sds((bh, s_q, LSE_LANES), jnp.float32, vma),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(info, qf, kf, vf)
    shape4 = (b, h, s_q, 1)
    return (num.reshape(b, h, s_q, d), m[:, :, :1].reshape(shape4),
            l[:, :, :1].reshape(shape4))


def _ring_bwd_kernel(info_ref, q_ref, do_ref, lse_ref, dsum_ref,
                     k_ref, v_ref, dq_ref, dk_ref, dv_ref, *, block: int,
                     window, rate: float, h_local: int, h_total: int):
    """Fused block gradients for one (local q, visiting kv) pair.

    p = exp(s − lse);  ds = p∘(dO·Vᵀ − dsum)
    dq += scale·ds·K   dk += scale·dsᵀ·Q   dv += p_vᵀ·dO
    With hash dropout: dO·Vᵀ gets the same keep/scale mask as the forward
    weights (dsum already equals rowsum(dw ∘ w)), and dv uses the DROPPED
    p_v — mirroring the wedge backward (attention.py). dk/dv accumulate
    across q-block grid steps (same output block revisited under the
    sequential 'arbitrary' dimension)."""
    d = q_ref.shape[-1]
    s_k = k_ref.shape[0]
    scale = 1.0 / math.sqrt(d)
    i = pl.program_id(1)
    qb = q_ref[...]
    dob = do_ref[...]
    s = jax.lax.dot_general(
        qb, k_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    r = jax.lax.broadcasted_iota(jnp.int32, (block, s_k), 0) + i * block
    c = jax.lax.broadcasted_iota(jnp.int32, (block, s_k), 1)
    diff = info_ref[0, 0]
    mask = c - r > diff
    if window is not None:
        mask = jnp.logical_or(mask, (r - c) + diff >= window)
    p = jnp.where(mask, 0.0, jnp.exp(s - lse_ref[:, :1]))
    dp = jax.lax.dot_general(
        dob, v_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        from dalle_mtf_tpu.ops.attention import _dropout_keep  # noqa: PLC0415

        keep = _dropout_keep(
            r + info_ref[0, 1], c + info_ref[0, 2],
            _ring_seed_eff(info_ref, h_local, h_total), rate,
        )
        inv = 1.0 / (1.0 - rate)
        dp = jnp.where(keep, dp * inv, 0.0)
        p_v = jnp.where(keep, p * inv, 0.0)
    else:
        p_v = p
    ds = (p * (dp - dsum_ref[:, :1])).astype(k_ref.dtype)
    dq = jax.lax.dot_general(
        ds, k_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[...] = (dq * scale).astype(dq_ref.dtype)
    dk = jax.lax.dot_general(
        ds, qb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dv = jax.lax.dot_general(
        p_v.astype(dob.dtype), dob, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _init():
        dk_ref[...] = dk.astype(dk_ref.dtype)
        dv_ref[...] = dv.astype(dv_ref.dtype)

    @pl.when(i > 0)
    def _acc():
        dk_ref[...] = (dk_ref[...].astype(jnp.float32) + dk).astype(dk_ref.dtype)
        dv_ref[...] = (dv_ref[...].astype(jnp.float32) + dv).astype(dv_ref.dtype)


def _ring_block_grads(q, do, lse, dsum, k, v, info, interpret: bool,
                      window, rate: float, h_total: int):
    """(dq_contrib, dk_vis, dv_vis) for one ring step. dk/dv are fp32 (they
    keep accumulating across hops)."""
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    bh = b * h
    block = _pick_row_block(s_q)
    n_q = s_q // block
    vma = _vma_of(q)
    lse_flat = jnp.broadcast_to(lse, (b, h, s_q, LSE_LANES)).reshape(
        bh, s_q, LSE_LANES)
    dsum_flat = jnp.broadcast_to(dsum, (b, h, s_q, LSE_LANES)).reshape(
        bh, s_q, LSE_LANES)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_ring_bwd_kernel, block=block, window=window,
                          rate=rate, h_local=h, h_total=h_total),
        grid=(bh, n_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, block, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, block, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, block, LSE_LANES), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, block, LSE_LANES), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, s_k, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((None, s_k, d), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((None, s_k, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((None, s_k, d), lambda b_, i: (b_, 0, 0)),
        ],
        out_shape=[
            _sds((bh, s_q, d), q.dtype, vma),
            _sds((bh, s_k, d), jnp.float32, vma),
            _sds((bh, s_k, d), jnp.float32, vma),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(info,
      q.reshape(bh, s_q, d), do.reshape(bh, s_q, d), lse_flat, dsum_flat,
      k.reshape(bh, s_k, d), v.reshape(bh, s_k, d))
    return (dq.reshape(b, h, s_q, d), dk.reshape(b, h, s_k, d),
            dv.reshape(b, h, s_k, d))


def _live_shard(src, my_idx, s_local, window):
    """False when the visiting shard contributes nothing: strictly future
    (src > my_idx), or — under a local window — wholly below the band
    (min global row-col over the tile = diff - S_local + 1 ≥ window)."""
    live = src <= my_idx
    if window is not None:
        diff = (my_idx - src) * s_local
        live = jnp.logical_and(live, diff - s_local + 1 < window)
    return live


def _ring_fwd_impl(q, k, v, seed, axis_name, interpret, window, rate,
                   h_total):
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, h, s_local, d = q.shape
    if h_total is None:
        h_total = h
    perm_fwd = [(i, (i + 1) % n) for i in range(n)]

    def zeros_partial(_):
        # derive from q so the outputs carry the same varying-across-mesh
        # type as the pallas branch (cond requires matching types)
        z = q.astype(jnp.float32) * 0.0
        z1 = z[..., :1]
        return (z, z1 + NEG_INF, z1)

    def ring_step(r, state):
        (acc, m_prev, l_prev), k_cur, v_cur = state
        src = (my_idx - r) % n
        diff = (my_idx - src) * s_local
        info = _ring_info(diff, my_idx * s_local, src * s_local, seed)
        num, m_cur, l_cur = jax.lax.cond(
            _live_shard(src, my_idx, s_local, window),
            lambda kv: _ring_partial(q, kv[0], kv[1], info, interpret,
                                     window, rate, h_total),
            zeros_partial,
            (k_cur, v_cur),
        )
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        beta = jnp.exp(m_cur - m_new)
        acc = acc * alpha + num * beta
        l_new = l_prev * alpha + l_cur * beta
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm_fwd)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm_fwd)
        return (acc, m_new, l_new), k_nxt, v_nxt

    acc0 = jnp.zeros((b, h, s_local, d), jnp.float32)
    m0 = jnp.full((b, h, s_local, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, s_local, 1), jnp.float32)
    # fold carries derive from q so they inherit its device-varying type
    acc0 = acc0 + q.astype(jnp.float32) * 0.0
    m0 = m0 + q[..., :1].astype(jnp.float32) * 0.0
    l0 = l0 + q[..., :1].astype(jnp.float32) * 0.0
    (acc, m, l), _k, _v = jax.lax.fori_loop(
        0, n, ring_step, ((acc0, m0, l0), k, v)
    )
    l_safe = jnp.maximum(l, 1e-30)
    out = (acc / l_safe).astype(q.dtype)
    lse = m + jnp.log(l_safe)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _ring_attention_pallas(q, k, v, seed, axis_name, interpret, window,
                           rate, h_total=None):
    return _ring_fwd_impl(
        q, k, v, seed, axis_name, interpret, window, rate, h_total
    )[0]


def _ring_pallas_fwd(q, k, v, seed, axis_name, interpret, window, rate,
                     h_total=None):
    out, lse = _ring_fwd_impl(
        q, k, v, seed, axis_name, interpret, window, rate, h_total
    )
    return out, (q, k, v, seed, out, lse)


def _ring_pallas_bwd(axis_name, interpret, window, rate, h_total, res, g):
    import numpy as _np  # noqa: PLC0415

    q, k, v, seed, out, lse = res
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, h, s_local, d = q.shape
    if h_total is None:
        h_total = h
    perm_fwd = [(i, (i + 1) % n) for i in range(n)]
    dsum = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                   axis=-1, keepdims=True)

    def zeros_grads(kv):
        k_cur, v_cur = kv
        return (q * 0, k_cur.astype(jnp.float32) * 0.0,
                v_cur.astype(jnp.float32) * 0.0)

    def ring_step(r, state):
        dq_acc, k_cur, v_cur, dk_cur, dv_cur = state
        src = (my_idx - r) % n
        diff = (my_idx - src) * s_local
        info = _ring_info(diff, my_idx * s_local, src * s_local, seed)
        dq_c, dk_c, dv_c = jax.lax.cond(
            _live_shard(src, my_idx, s_local, window),
            lambda kv: _ring_block_grads(q, g, lse, dsum, kv[0], kv[1],
                                         info, interpret, window, rate,
                                         h_total),
            zeros_grads,
            (k_cur, v_cur),
        )
        dq_acc = dq_acc + dq_c.astype(jnp.float32)
        dk_cur = dk_cur + dk_c
        dv_cur = dv_cur + dv_c
        # rotate kv AND its accumulating grads together: after n hops the
        # shard and its fully-summed dk/dv are back on the home device
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm_fwd)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm_fwd)
        dk_nxt = jax.lax.ppermute(dk_cur, axis_name, perm_fwd)
        dv_nxt = jax.lax.ppermute(dv_cur, axis_name, perm_fwd)
        return dq_acc, k_nxt, v_nxt, dk_nxt, dv_nxt

    dq0 = jnp.zeros((b, h, s_local, d), jnp.float32)
    dq0 = dq0 + q.astype(jnp.float32) * 0.0
    dk0 = jnp.zeros((b, h, s_local, d), jnp.float32) + k.astype(jnp.float32) * 0.0
    dv0 = jnp.zeros((b, h, s_local, d), jnp.float32) + v.astype(jnp.float32) * 0.0
    dq, _k, _v, dk, dv = jax.lax.fori_loop(
        0, n, ring_step, (dq0, k, v, dk0, dv0)
    )
    dseed = _np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dseed


_ring_attention_pallas.defvjp(_ring_pallas_fwd, _ring_pallas_bwd)


def ambient_mesh():
    """The mesh currently in scope, or None.

    Checks the new-style context mesh (``jax.set_mesh``) first, then the
    legacy ``with mesh:`` context the Trainer uses around its jitted steps.
    """
    try:
        am = jax.sharding.get_abstract_mesh()
        if am is not None and am.axis_names:
            return am
    except Exception:  # pragma: no cover - API drift
        pass
    try:
        from jax._src.mesh import thread_resources  # noqa: PLC0415

        m = thread_resources.env.physical_mesh
        if m.axis_names:
            return m
    except Exception:  # pragma: no cover - API drift
        pass
    return None


def ring_attention_auto(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    seq_axis: str = "seq",
    batch_axis: str | None = "data",
    heads_axis: str | None = None,
    causal: bool = True,
    window: int | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """Ring attention resolved against the ambient mesh.

    This is the model-facing entry (``attention_type: "ring"`` routes DALLE
    blocks here): q/k/v arrive as ordinary [B, H, S, D] arrays inside the
    jitted step; the ring runs in a ``shard_map`` whose specs put the batch
    dim on ``batch_axis`` (DP), heads on ``heads_axis`` (TP) and the
    sequence on ``seq_axis`` (SP) — so DPxTPxSP compose in one step. When no
    mesh with ``seq_axis`` is in scope (single-device tests, sampling), it
    degrades to the fused single-device kernel, which computes the identical
    function.

    ``window`` (local band) and ``dropout_rate`` (attention-weight hash
    dropout) compose with the ring: masks and keep bits are keyed on GLOBAL
    coordinates, and the seed is offset by each device's global (batch,
    head) position so DP/TP shards draw independent masks.
    """
    mesh = ambient_mesh()
    rate = float(dropout_rate) if dropout_rng is not None else 0.0
    if (
        mesh is None
        or seq_axis not in mesh.axis_names
        or mesh.shape[seq_axis] == 1
    ):
        from dalle_mtf_tpu.ops.attention import (  # noqa: PLC0415
            attention_reference,
            causal_attention,
        )

        if not causal:  # no fused non-causal kernel; use the XLA reference
            return attention_reference(q, k, v, causal=False)
        return causal_attention(
            q, k, v, window=window,
            dropout_rate=rate, dropout_rng=dropout_rng,
        )
    s = q.shape[2]
    n = mesh.shape[seq_axis]
    if s % n != 0:
        raise ValueError(
            f"ring attention: seq len {s} not divisible by mesh axis "
            f"{seq_axis!r} of size {n}"
        )
    from jax import shard_map  # noqa: PLC0415
    from jax.sharding import PartitionSpec as P  # noqa: PLC0415

    ba = batch_axis if batch_axis in mesh.axis_names else None
    ha = heads_axis if heads_axis in mesh.axis_names else None
    h_total = q.shape[1]
    if rate > 0.0:
        seed = jax.random.randint(
            dropout_rng, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
    else:
        seed = jnp.zeros((), jnp.int32)

    def body(q_, k_, v_, seed_):
        sd = seed_.astype(jnp.int32)
        if rate > 0.0:
            # offset to this device's global (batch0, head0) so seed_eff =
            # base + global_b * H_total + global_h — decorrelated across
            # DP/TP shards and reproducible by a dense reference
            bl, hl = q_.shape[0], q_.shape[1]
            if ba is not None:
                sd = sd + jax.lax.axis_index(ba) * bl * h_total
            if ha is not None:
                sd = sd + jax.lax.axis_index(ha) * hl
        return ring_attention(
            q_, k_, v_, axis_name=seq_axis, causal=causal, window=window,
            dropout_rate=rate, dropout_seed=sd, heads_total=h_total,
        )

    spec = P(ba, ha, seq_axis, None)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec, P()),
        out_specs=spec,
        # the pallas block kernels create fresh values inside the manual
        # region; vma inference can't see through them (see test_ring_pallas)
        check_vma=False,
    )
    return fn(q, k, v, seed)


def ring_attention_sharded(q, k, v, mesh, seq_axis: str = "seq", causal: bool = True):
    """Convenience wrapper: shard_map ring_attention over ``mesh[seq_axis]``.

    q, k, v: global [B, H, S, D] arrays (S divisible by the axis size).
    Other mesh axes (e.g. "data" on batch) pass through unsharded here;
    integrate with the model's constrain() machinery for combined DP+SP.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(None, None, seq_axis, None)
    fn = shard_map(
        partial(ring_attention, axis_name=seq_axis, causal=causal),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
