"""dalle_12B evidence: one transformer layer at the PER-DEVICE TP=8 shard
proportions, fwd+bwd and decode-step, on a real chip.

configs/dalle_12B.json runs 38L/40H/d=5120 at S = 256 + 2304 = 2560 on a
mesh `data:16,model:8` (layout shards heads, intermediate, vocab over
`model`). One device of that mesh therefore executes, per layer:

  qkv   [B, S, 5120] @ [5120, 3*5*128]   (40 heads / 8 = 5 local heads)
  attn  5 heads, S=2560, d=128           (wedge-family Pallas kernels)
  out   [B, S, 640] @ [640, 5120]
  mlp   [B, S, 5120] @ [5120, 2560] -> relu -> [2560, 5120]   (20480 / 8)

with B = tokens_per_mb_per_replica / S = 20480 / 2560 = 8 rows per
microbatch per replica. This probe times exactly that computation — the
real kernels at the real shard shapes — so the per-layer step cost of the
12B config stops being a compile-only extrapolation. Collectives are NOT
included (single chip): on the pod each layer adds two all-reduces over
`model` (attn-out + mlp-out reduce-scatter/all-gather pairs under GSPMD),
overlappable with the next layer's compute.

Methodology: N_CHAIN calls chained inside one jit (see bench_attention.py
on the tunneled runtime's dispatch floor), host fetch to synchronize.

Usage: python tools/bench_12b_layer.py  -> one JSON line per phase.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dalle_mtf_tpu.ops.attention import causal_attention, decode_attention

E = 5120            # d_model (replicated under TP)
H_LOC = 5           # 40 heads / model:8
DH = 128
I_LOC = 2560        # 4*E / model:8
S = 2560            # 256 text + 2304 image tokens (384px VAE)
B = int(os.environ.get("B", "8"))       # 20480 tokens_per_mb / S
DECODE_B = int(os.environ.get("DECODE_B", "8"))
N_CHAIN = int(os.environ.get("N_CHAIN", "20"))
ITERS = 2


def init_params(key):
    ks = jax.random.split(key, 6)
    s = 0.02
    return {
        "ln1": jnp.ones((E,), jnp.float32),
        "ln2": jnp.ones((E,), jnp.float32),
        "wqkv": (jax.random.normal(ks[0], (E, 3 * H_LOC * DH)) * s).astype(jnp.bfloat16),
        "wo": (jax.random.normal(ks[1], (H_LOC * DH, E)) * s).astype(jnp.bfloat16),
        "w1": (jax.random.normal(ks[2], (E, I_LOC)) * s).astype(jnp.bfloat16),
        "w2": (jax.random.normal(ks[3], (I_LOC, E)) * s).astype(jnp.bfloat16),
    }


def ln(x, g):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g).astype(x.dtype)


def layer(p, x):
    a_in = ln(x, p["ln1"])
    qkv = jnp.einsum("bse,ef->bsf", a_in, p["wqkv"],
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (t.reshape(B, S, H_LOC, DH).transpose(0, 2, 1, 3)
               for t in (q, k, v))
    a = causal_attention(q, k, v)
    a = a.transpose(0, 2, 1, 3).reshape(B, S, H_LOC * DH)
    x = x + jnp.einsum("bsf,fe->bse", a, p["wo"],
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    m_in = ln(x, p["ln2"])
    h = jnp.einsum("bse,ei->bsi", m_in, p["w1"],
                   preferred_element_type=jnp.float32)
    h = jax.nn.relu(h).astype(jnp.bfloat16)
    x = x + jnp.einsum("bsi,ie->bse", h, p["w2"],
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return x


def flops_per_layer() -> float:
    mm = 2 * B * S * E * (3 * H_LOC * DH + H_LOC * DH + 2 * I_LOC)
    attn = 2 * 2 * B * H_LOC * S * S * DH / 2  # causal half
    return mm + attn


def time_chained(step, init):
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step(c), None), c, None,
                            length=N_CHAIN)[0]

    c = run(init)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), c)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        c = run(init)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), c)
    return (time.perf_counter() - t0) / (ITERS * N_CHAIN)


def main():
    p = init_params(jax.random.PRNGKey(0))
    x0 = (jax.random.normal(jax.random.PRNGKey(1), (B, S, E)) * 0.1).astype(
        jnp.bfloat16
    )

    # fwd
    dt = time_chained(lambda x: layer(p, x) * 0.999, x0)
    fl = flops_per_layer()
    print(json.dumps({
        "metric": "dalle_12B_layer_shard_fwd_ms", "value": round(dt * 1e3, 3),
        "unit": "ms", "tflops_per_sec": round(fl / dt / 1e12, 1),
        "shapes": f"B={B} S={S} E={E} Hloc={H_LOC} Iloc={I_LOC}",
    }))

    # fwd+bwd w.r.t. params AND input (remat-free; the 12B config remats,
    # adding ~one fwd). Differentiating only x would let XLA delete every
    # dw matmul and flatter the number.
    def step(x):
        gx, gp = jax.grad(
            lambda x_, p_: (layer(p_, x_).astype(jnp.float32) ** 2).sum(),
            argnums=(0, 1),
        )(x, p)
        bump = sum(
            jnp.sum(g).astype(jnp.float32)
            for g in jax.tree_util.tree_leaves(gp)
        )
        return (x + 1e-12 * (gx.astype(jnp.float32) + bump)).astype(x.dtype)

    dt = time_chained(step, x0)
    print(json.dumps({
        "metric": "dalle_12B_layer_shard_fwd_bwd_ms",
        "value": round(dt * 1e3, 3), "unit": "ms",
        "tflops_per_sec": round(3 * fl / dt / 1e12, 1),
    }))

    # decode step: one token against a full KV cache at the shard shapes
    kcache = (jax.random.normal(jax.random.PRNGKey(2),
                                (DECODE_B, H_LOC, S, DH)) * 0.1).astype(jnp.bfloat16)
    vcache = (jax.random.normal(jax.random.PRNGKey(3),
                                (DECODE_B, H_LOC, S, DH)) * 0.1).astype(jnp.bfloat16)
    pos = jnp.full((DECODE_B, 1, 1, 1), S - 1, jnp.int32)

    def dec(x):
        a_in = ln(x, p["ln1"])
        qkv = (a_in @ p["wqkv"]).astype(jnp.bfloat16)
        q = qkv[:, : H_LOC * DH].reshape(DECODE_B, H_LOC, 1, DH)
        a = decode_attention(q, kcache, vcache, pos)
        a = a.reshape(DECODE_B, H_LOC * DH)
        x = x + (a @ p["wo"]).astype(jnp.bfloat16)
        h = jax.nn.relu((ln(x, p["ln2"]) @ p["w1"])).astype(jnp.bfloat16)
        return (x + (h @ p["w2"]).astype(jnp.bfloat16)) * 0.999

    xd = (jax.random.normal(jax.random.PRNGKey(4), (DECODE_B, E)) * 0.1).astype(
        jnp.bfloat16
    )
    dt = time_chained(dec, xd)
    print(json.dumps({
        "metric": "dalle_12B_layer_shard_decode_step_ms",
        "value": round(dt * 1e3, 3), "unit": "ms",
        "note": f"B={DECODE_B}, KV cache S={S}; x38 layers + collectives "
                "= per-token lower bound on the pod",
    }))


if __name__ == "__main__":
    main()
