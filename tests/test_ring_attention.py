"""Ring attention (sequence parallelism) vs the dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle_mtf_tpu.ops.attention import attention_reference
from dalle_mtf_tpu.ops.ring_attention import ring_attention_sharded
from dalle_mtf_tpu.parallel.mesh import build_mesh

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_ring_matches_reference(n_shards):
    mesh = build_mesh(f"seq:{n_shards}", devices=jax.devices()[:n_shards])
    b, h, s, d = 2, 2, 64, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks)
    ref = attention_reference(q, k, v, causal=True)
    out = ring_attention_sharded(q, k, v, mesh, seq_axis="seq")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_gradients_match_reference():
    mesh = build_mesh("seq:4", devices=jax.devices()[:4])
    b, h, s, d = 1, 2, 32, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks[:3])
    g = jax.random.normal(ks[3], (b, h, s, d), jnp.float32)

    def loss_ring(q_, k_, v_):
        return (ring_attention_sharded(q_, k_, v_, mesh, "seq") * g).sum()

    def loss_ref(q_, k_, v_):
        return (attention_reference(q_, k_, v_, causal=True) * g).sum()

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    ge = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gr, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def _dense_hash_attention(q, k, v, seed, rate, window, h_total=None):
    """Dense reference of the ring's exact dropout semantics: numerator
    uses hash-dropped weights (seed_eff = seed + global_b*H + global_h over
    GLOBAL coordinates), normalizer the undropped sum — the wedge/ring
    kernel convention."""
    import math

    from dalle_mtf_tpu.ops.attention import NEG_INF, _dropout_keep

    b, h, s, d = q.shape
    ht = h_total if h_total is not None else h
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    rows = jnp.arange(s)[:, None]
    cols = jnp.arange(s)[None, :]
    mask = cols > rows
    if window is not None:
        mask = jnp.logical_or(mask, rows - cols >= window)
    scores = jnp.where(mask, NEG_INF, scores)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    seeds = seed + (
        jnp.arange(b, dtype=jnp.int32)[:, None] * ht
        + jnp.arange(h, dtype=jnp.int32)[None, :]
    )
    keep = jax.vmap(jax.vmap(
        lambda sd: _dropout_keep(
            jnp.broadcast_to(rows, (s, s)), jnp.broadcast_to(cols, (s, s)),
            sd, rate,
        )
    ))(seeds)
    p_v = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p_v.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ) / l
    return out.astype(q.dtype)


@pytest.mark.parametrize("window", [None, 24])
def test_ring_dropout_window_matches_dense_hash(window):
    """Ring attention with in-kernel hash dropout (+ local window) must
    equal the dense formula with the same hash mask — values AND grads
    (VERDICT r2 item 3: SP now composes with attention_dropout)."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from dalle_mtf_tpu.ops.ring_attention import ring_attention

    mesh = build_mesh("data:2,seq:4")
    b, h, s, d = 2, 2, 64, 16
    rate = 0.3
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks[:3])
    g = jax.random.normal(ks[3], (b, h, s, d), jnp.float32)
    seed = jnp.asarray(1234, jnp.int32)
    spec = P("data", None, "seq", None)

    def body(q_, k_, v_):
        bl = q_.shape[0]
        sd = seed + jax.lax.axis_index("data") * bl * h
        return ring_attention(
            q_, k_, v_, axis_name="seq", causal=True, window=window,
            dropout_rate=rate, dropout_seed=sd,
        )

    fn = shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec)

    def loss_ring(q_, k_, v_):
        return (fn(q_, k_, v_) * g).sum()

    def loss_dense(q_, k_, v_):
        return (_dense_hash_attention(q_, k_, v_, seed, rate, window) * g).sum()

    out = jax.jit(fn)(q, k, v)
    ref = _dense_hash_attention(q, k, v, seed, rate, window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    ge = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gr, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_ring_window_only_matches_reference():
    """local_ring semantics: banded causal attention through the ring."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from dalle_mtf_tpu.ops.ring_attention import ring_attention

    mesh = build_mesh("seq:4", devices=jax.devices()[:4])
    b, h, s, d = 2, 2, 64, 16
    window = 16  # band narrower than a shard: whole hops get skipped
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks)
    spec = P(None, None, "seq", None)
    fn = shard_map(
        partial(ring_attention, axis_name="seq", causal=True, window=window),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    out = jax.jit(fn)(q, k, v)
    ref = attention_reference(q, k, v, causal=True, window=window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_with_data_parallel_mesh():
    """SP composes with DP: batch over 'data', sequence over 'seq'."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from dalle_mtf_tpu.ops.ring_attention import ring_attention

    mesh = build_mesh("data:2,seq:4")
    b, h, s, d = 4, 2, 32, 16
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks)
    spec = P("data", None, "seq", None)
    fn = shard_map(
        partial(ring_attention, axis_name="seq", causal=True),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    out = jax.jit(fn)(q, k, v)
    ref = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
