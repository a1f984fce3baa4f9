"""Attention kernel microbench at dalle_coco shapes (16x8x1280x128 bf16).

Times forward and forward+backward for the Pallas kernels vs the XLA dense
reference, printing ms per call and achieved TFLOP/s (causal FLOPs).

Timing methodology: the tunneled axon runtime has a multi-ms per-dispatch
overhead, so single-call timing measures dispatch, not the kernel. Each
measurement therefore chains N_CHAIN calls inside ONE jit via lax.scan
(carrying a value-preserving q + out*1e-30 perturbation so nothing is CSE'd
away and inputs stay numerically healthy), and fetches once at the end.

N_CHAIN must be LARGE: at N_CHAIN=10 the residual dispatch overhead still
adds ~1.3 ms/call (a copy-only kernel "measured" 1.32 ms; the harness step
alone 0.18 ms at N_CHAIN=100) — every round-1 kernel number carried that
floor. N_CHAIN=100 amortizes it to ~0.13 ms; numbers below are true kernel
costs to ~0.05 ms.

Usage: python bench_attention.py [--impl pallas|xla|both] [--fwd-only]
                                 [--b B] [--h H] [--s S] [--d D]
(--s 2560 --b 4 measures the dalle_12B shape; --s 4352 the loop-kernel
regime dalle_4k runs in)
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

B, H, S, D = 16, 8, 1280, 128
N_CHAIN = 100
ITERS = 2


def causal_flops(bwd: bool) -> float:
    fwd = 2 * 2 * B * H * S * S * D / 2
    return fwd * (1 + 2.5) if bwd else fwd


def _fetch(c):
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), c)


def time_chained(step, init) -> float:
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step(c), None), c, None, length=N_CHAIN)[0]

    c = run(init)
    c = run(init)
    _fetch(c)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        c = run(init)
    _fetch(c)
    return (time.perf_counter() - t0) / (ITERS * N_CHAIN)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="pallas",
                    choices=["pallas", "xla", "packed", "both", "all"])
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--b", type=int, default=None)
    ap.add_argument("--h", type=int, default=None)
    ap.add_argument("--s", type=int, default=None)
    ap.add_argument("--d", type=int, default=None)
    args = ap.parse_args()
    global B, H, S, D
    B = args.b or B
    H = args.h or H
    S = args.s or S
    D = args.d or D
    print(f"shape B={B} H={H} S={S} D={D} bf16, N_CHAIN={N_CHAIN}")

    from dalle_mtf_tpu.ops import attention as A

    kq = jax.random.PRNGKey(0)
    q = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(kq, 1), (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(kq, 2), (B, H, S, D), jnp.bfloat16)

    impls = {"both": ["pallas", "xla"],
             "all": ["packed", "pallas", "xla"]}.get(args.impl, [args.impl])
    qp = q.transpose(0, 2, 1, 3).reshape(B, S, H * D)
    kp = k.transpose(0, 2, 1, 3).reshape(B, S, H * D)
    vp = v.transpose(0, 2, 1, 3).reshape(B, S, H * D)
    for impl in impls:
        if impl == "packed":
            # the packed family times on [B, S, H*D] operands (its whole
            # point is never materializing the [B,H,S,D] layout)
            from dalle_mtf_tpu.ops.attention_packed import (
                causal_attention_packed,
            )

            f = lambda q_, k_, v_: causal_attention_packed(q_, k_, v_, H)
            qi, ki, vi = qp, kp, vp
        elif impl == "pallas":
            f = lambda q_, k_, v_: A.causal_attention(q_, k_, v_)
            qi, ki, vi = q, k, v
        else:
            f = lambda q_, k_, v_: A.attention_reference(q_, k_, v_, True)
            qi, ki, vi = q, k, v

        def fwd_step(c, f=f, ki=ki, vi=vi):
            q_, = c
            o = f(q_, ki, vi)
            return (q_ + o * 1e-30,)

        dt = time_chained(fwd_step, (qi,))
        tf = causal_flops(False) / dt / 1e12
        print(f"{impl:8s} fwd      {dt*1e3:7.3f} ms  {tf:6.1f} TF/s")

        if not args.fwd_only:
            g = jax.grad(
                lambda q_, k_, v_, f=f: jnp.sum(f(q_, k_, v_).astype(jnp.float32)),
                argnums=(0, 1, 2),
            )

            def bwd_step(c, g=g):
                q_, k_, v_ = c
                dq, dk, dv = g(q_, k_, v_)
                return (q_ + dq * 1e-30, k_ + dk * 1e-30, v_ + dv * 1e-30)

            dt = time_chained(bwd_step, (qi, ki, vi))
            tf = causal_flops(True) / dt / 1e12
            print(f"{impl:8s} fwd+bwd  {dt*1e3:7.3f} ms  {tf:6.1f} TF/s")


if __name__ == "__main__":
    main()
