"""Pallas ring attention (value + custom-VJP grads) vs the XLA ring fold
and the dense reference, on the suite's 8-CPU-device mesh (interpret mode).

Covers: shard sizes that are/aren't 128-multiples, ring sizes 2 and 4, and
the rotating-(dk,dv) backward ring.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dalle_mtf_tpu.ops.attention import attention_reference
from dalle_mtf_tpu.ops.ring_attention import ring_attention

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _mesh(n):
    devs = np.array(jax.devices()[:n]).reshape(n)
    return Mesh(devs, ("seq",))


def _ring_fn(mesh, **kw):
    return shard_map(
        partial(ring_attention, axis_name="seq", causal=True, **kw),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None),
        check_vma=False,
    )


@pytest.mark.parametrize("n,s", [(2, 256), (4, 512), (4, 1280)])
def test_pallas_ring_matches_dense_and_xla(n, s):
    # s=1280, n=4 -> s_local=320: NOT a 128-multiple (row tiling is 16)
    mesh = _mesh(n)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (1, 2, s, 128), jnp.float32)
               for kk in ks)
    dense = attention_reference(q, k, v, causal=True)
    got = jax.jit(_ring_fn(mesh, use_pallas=True, interpret=True))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense), atol=3e-5)
    xla = jax.jit(_ring_fn(mesh, use_pallas=False))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(xla), atol=3e-5)


@pytest.mark.parametrize("window,rate", [(None, 0.25), (96, 0.0), (96, 0.25)])
def test_pallas_ring_dropout_window_matches_xla(window, rate):
    """The Pallas kernels' in-kernel hash dropout + window must equal the
    XLA ring fold (same hash, same global coordinates) — values and the
    custom-VJP grads."""
    n, s = 4, 512
    mesh = _mesh(n)
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q, k, v = (jax.random.normal(kk, (1, 2, s, 128), jnp.float32)
               for kk in ks[:3])
    g = jax.random.normal(ks[3], (1, 2, s, 128), jnp.float32)
    seed = jnp.asarray(77, jnp.int32)
    kw = dict(window=window, dropout_rate=rate, dropout_seed=seed)
    pallas = _ring_fn(mesh, use_pallas=True, interpret=True, **kw)
    xla = _ring_fn(mesh, use_pallas=False, **kw)
    np.testing.assert_allclose(
        np.asarray(jax.jit(pallas)(q, k, v)),
        np.asarray(jax.jit(xla)(q, k, v)), atol=3e-5,
    )
    gp = jax.jit(jax.grad(
        lambda *a: (pallas(*a) * g).sum(), argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(
        lambda *a: (xla(*a) * g).sum(), argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name
        )


@pytest.mark.parametrize("n,s", [(2, 256), (4, 1280)])
def test_pallas_ring_grads_match_dense(n, s):
    mesh = _mesh(n)
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q, k, v = (jax.random.normal(kk, (1, 2, s, 128), jnp.float32)
               for kk in ks[:3])
    g = jax.random.normal(ks[3], (1, 2, s, 128), jnp.float32)

    ring = _ring_fn(mesh, use_pallas=True, interpret=True)
    gp = jax.jit(jax.grad(
        lambda *a: (ring(*a) * g).sum(), argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(
        lambda *a: (attention_reference(*a, causal=True) * g).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name
        )
