"""Real-TPU compile/execute check for the Pallas ring-attention kernels.

The test suite validates the ring kernels under ``interpret=True`` on the
CPU mesh (tests/test_ring_pallas.py) — faithful to the kernel semantics but
not a Mosaic compile. This script runs the SAME kernels on the real chip
via a 1-device ``seq`` mesh: the ring degenerates to one diagonal hop, but
``_ring_partial`` (fwd) and ``_ring_block_grads`` (bwd) still compile and
execute as TPU kernels. Values and grads are checked against the fused
causal kernel, plus the hash-dropout/window variants against the XLA ring
fold. Exits 0 with one OK line per case.

Run on the TPU host: ``python check_ring_tpu.py``
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dalle_mtf_tpu.ops.attention import attention_reference, causal_attention
from dalle_mtf_tpu.ops.ring_attention import ring_attention


def ring_fn(mesh, **kw):
    return shard_map(
        partial(ring_attention, axis_name="seq", causal=True,
                use_pallas=True, **kw),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None),
        check_vma=False,
    )


def main():
    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} device={dev}")
    mesh = Mesh(np.array([dev]).reshape(1), ("seq",))
    b, h, s, d = 2, 4, 1280, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
               for kk in ks[:3])
    g = jax.random.normal(ks[3], (b, h, s, d), jnp.bfloat16)

    # --- plain causal: ring pallas vs the fused kernel
    ring = jax.jit(ring_fn(mesh))
    out = ring(q, k, v)
    ref = causal_attention(q, k, v)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert err < 3e-2, f"ring fwd mismatch {err}"
    print(f"ring pallas fwd OK (max|err| {err:.2e} vs fused kernel)")

    gp = jax.jit(jax.grad(
        lambda *a: jnp.sum((ring_fn(mesh)(*a) * g).astype(jnp.float32)),
        argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(
        lambda *a: jnp.sum((causal_attention(*a) * g).astype(jnp.float32)),
        argnums=(0, 1, 2))(q, k, v)
    for name, a_, b_ in zip(("dq", "dk", "dv"), gp, gr):
        e = float(jnp.max(jnp.abs(a_.astype(jnp.float32) - b_.astype(jnp.float32))))
        assert e < 2.0, f"{name} mismatch {e}"  # bf16 grads, S=1280 sums
        print(f"ring pallas bwd {name} OK (max|err| {e:.2e})")

    # --- window + hash dropout: pallas ring vs XLA ring fold (same hash)
    seed = jnp.asarray(42, jnp.int32)
    for window, rate in ((256, 0.0), (None, 0.2), (256, 0.2)):
        kw = dict(window=window, dropout_rate=rate, dropout_seed=seed)
        o_p = jax.jit(ring_fn(mesh, **kw))(q, k, v)
        o_x = jax.jit(shard_map(
            partial(ring_attention, axis_name="seq", causal=True,
                    use_pallas=False, **kw),
            mesh=mesh,
            in_specs=(P(None, None, "seq", None),) * 3,
            out_specs=P(None, None, "seq", None),
            check_vma=False,
        ))(q, k, v)
        e = float(jnp.max(jnp.abs(o_p.astype(jnp.float32) - o_x.astype(jnp.float32))))
        assert e < 3e-2, f"window={window} rate={rate} mismatch {e}"
        print(f"ring pallas window={window} dropout={rate} OK (max|err| {e:.2e})")

    print("check_ring_tpu: ALL OK")


if __name__ == "__main__":
    main()
