"""Ring attention (sequence parallelism) vs the dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle_mtf_tpu.ops.attention import attention_reference
from dalle_mtf_tpu.ops.ring_attention import ring_attention_sharded
from dalle_mtf_tpu.parallel.mesh import build_mesh


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
