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

The local block computation is the XLA path for clarity; swapping in the
Pallas kernel per block is a planned optimization (ROADMAP.md). Exposed as
a pure function to be called inside ``shard_map`` — see
tests/test_ring_attention.py for the mesh wiring.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e10


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
) -> jax.Array:
    """Causal attention over a sequence sharded on ``axis_name``.

    Must run inside shard_map/pjit manual context where ``axis_name`` is a
    mesh axis. q, k, v: per-device shards [B, H, S_local, D], where shard i
    holds global positions [i*S_local, (i+1)*S_local). Returns the local
    output shard [B, H, S_local, D].
    """
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
        if causal:
            # shard-level causality: global row = my_idx*s_local + r,
            # global col = src_idx*s_local + c
            rows = my_idx * s_local + local_rows[:, None]
            cols = src_idx * s_local + local_rows[None, :]
            s = jnp.where(cols > rows, NEG_INF, s)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
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
    # fully-masked rows (can't happen for causal row>=0, but guard) and
    # zero-l protection
    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


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
    """
    mesh = ambient_mesh()
    if (
        mesh is None
        or seq_axis not in mesh.axis_names
        or mesh.shape[seq_axis] == 1
    ):
        from dalle_mtf_tpu.ops.attention import causal_attention  # noqa: PLC0415

        return causal_attention(q, k, v)
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
    spec = P(ba, ha, seq_axis, None)
    fn = shard_map(
        partial(ring_attention, axis_name=seq_axis, causal=causal),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)


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
    )
    return fn(q, k, v)
