"""Profile-guided autotuner for the wedge attention block size.

The wedge family's one free parameter is the per-call q-block cap
(WEDGE_MAX_BLOCK, attention.py) — 640 was measured on v5e at S=1280. Other
chip generations (different VMEM, MXU latency, DMA overlap) and other
sequence lengths can prefer different blocks, so this script measures the
fused fwd+bwd train cost for each candidate cap at the requested shapes on
the LOCAL chip and writes the winners to a JSON table that
DALLE_TPU_ATTN_TUNE points the runtime at:

    python autotune_attention.py --s 1280 2560 --out runs/attn_tune.json
    DALLE_TPU_ATTN_TUNE=runs/attn_tune.json python train_dalle.py ...

Block size only changes performance — value/grad parity across block sizes
is covered by tests/test_ops.py — so a stale table is safe. Timing chains
N_CHAIN calls in one jit (the tunneled runtime's ~13 ms dispatch floor
makes single-call timing meaningless; BENCH.md).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

N_CHAIN = 50
ITERS = 2
CANDIDATES = (256, 384, 512, 640, 768, 896)


def _time_fused(s: int, b: int, h: int, d: int, dtype) -> float:
    """ms per fused value+grad call at the CURRENT tune table."""
    from dalle_mtf_tpu.ops.attention import causal_attention

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), dtype) for kk in ks)

    def step(c):
        qq, kk, vv = c

        def f(q_, k_, v_):
            return (causal_attention(q_, k_, v_, use_pallas=True) ** 2).sum()

        dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(qq, kk, vv)
        # value-preserving perturbation so the chain is not CSE'd away
        return (qq + dq * 1e-30, kk + dk * 1e-30, vv + dv * 1e-30)

    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step(c), None), c, None,
                            length=N_CHAIN)[0]

    c = run((q, k, v))
    c = run((q, k, v))
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), c)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        c = run((q, k, v))
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), c)
    return (time.perf_counter() - t0) / (ITERS * N_CHAIN) * 1e3



def _time_fused_safe(s, b, h, d, dtype):
    """_time_fused, with per-candidate compile failures (e.g. a cap whose
    backward tile overflows the 16 MB scoped-VMEM budget on this chip
    generation) treated as a skip, not a crash — the sweep must survive
    probing past the feasible region."""
    import jax.errors as jerr  # noqa: PLC0415

    try:
        return _time_fused(s, b, h, d, dtype)
    except (jerr.JaxRuntimeError, RuntimeError, ValueError) as e:
        msg = str(e).splitlines()[0][:160]
        print(f"  candidate failed to compile/run (skipped): {msg}",
              flush=True)
        return float("inf")


def _time_packed(s: int, b: int, h: int, d: int, dtype) -> float:
    """ms per fused value+grad call of the PACKED family at the current
    tune table ([B, S, H*D] layout, ops/attention_packed.py)."""
    from dalle_mtf_tpu.ops.attention_packed import causal_attention_packed

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, s, h * d), dtype) for kk in ks)

    def step(c):
        qq, kk, vv = c

        def f(q_, k_, v_):
            return (causal_attention_packed(q_, k_, v_, h) ** 2).sum()

        dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(qq, kk, vv)
        return (qq + dq * 1e-30, kk + dk * 1e-30, vv + dv * 1e-30)

    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step(c), None), c, None,
                            length=N_CHAIN)[0]

    c = run((q, k, v))
    c = run((q, k, v))
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), c)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        c = run((q, k, v))
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), c)
    return (time.perf_counter() - t0) / (ITERS * N_CHAIN) * 1e3


def _time_packed_safe(s, b, h, d, dtype):
    import jax.errors as jerr  # noqa: PLC0415

    try:
        return _time_packed(s, b, h, d, dtype)
    except (jerr.JaxRuntimeError, RuntimeError, ValueError) as e:
        msg = str(e).splitlines()[0][:160]
        print(f"  packed candidate failed (skipped): {msg}", flush=True)
        return float("inf")


def tune_packed(args, attn, table, measurements, dtype, itemsize):
    """Sweep the packed fused family's fwd x bwd block caps. Entries land
    under table["packed"]["<s128>,<itemsize>,<d>"] = {"fwd": b, "bwd": b}
    and override both the wedge cap and the VMEM clamp at runtime (the
    candidate demonstrably compiled here — but only at this head_dim,
    hence d in the key; see ops/attention_packed.py::_packed_layout)."""
    from dalle_mtf_tpu.ops import attention_packed as ap_mod

    for s in args.s:
        s128 = -(-s // 128) * 128
        key = f"{s128},{itemsize},{args.d}"
        if itemsize > 2 or s128 > attn.WHOLE_ROW_MAX_SEQ:
            print(f"S={s}: outside the packed fused regime; skipping")
            continue
        base_fwd = ap_mod._packed_layout(s, itemsize, False, args.d)[0]
        base_bwd = ap_mod._packed_layout(s, itemsize, True, args.d)[0]
        rows = {}
        for fw in CANDIDATES:
            for bw in CANDIDATES:
                # only sweep around the analytic picks — the grid is
                # quadratic and far-off candidates either OOM or lose
                if abs(fw - base_fwd) > 256 or abs(bw - base_bwd) > 256:
                    continue
                attn.set_tune_table(
                    {"packed": {key: {"fwd": fw, "bwd": bw}}})
                ms = _time_packed_safe(s, args.b, args.h, args.d, dtype)
                if ms == float("inf"):
                    continue
                rows[(fw, bw)] = round(ms, 4)
                print(f"S={s} packed fwd={fw} bwd={bw}: {ms:.3f} ms",
                      flush=True)
        attn.set_tune_table(None)
        if not rows:
            print(f"S={s} ({key}): every packed candidate failed; skipping")
            continue
        best = min(rows, key=rows.get)
        table.setdefault("packed", {})[key] = {
            "fwd": best[0], "bwd": best[1]}
        measurements[f"packed {key}"] = {str(list(k)): v
                                         for k, v in rows.items()}
        print(f"S={s} ({key}): best packed fwd={best[0]} bwd={best[1]} "
              f"({rows[best]:.3f} ms)")


def main():
    from dalle_mtf_tpu.ops import attention as attn

    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, nargs="+", default=[1280])
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--packed", action="store_true",
                    help="sweep the packed fused family instead of the "
                    "per-call wedge/loop families")
    ap.add_argument("--out", default="runs/attn_tune.json")
    args = ap.parse_args()
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    itemsize = 4 if args.fp32 else 2

    table = {"wedge": {}}
    if os.path.exists(args.out):
        with open(args.out) as f:
            table = json.load(f)
        table.setdefault("wedge", {})
    measurements = table.setdefault("_measurements", {})

    if args.packed:
        tune_packed(args, attn, table, measurements, dtype, itemsize)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(table, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}")
        return

    for s in args.s:
        s128 = -(-s // 128) * 128
        key = f"{s128},{itemsize}"
        if s128 <= attn.WHOLE_ROW_MAX_SEQ:
            rows = {}
            for cand in CANDIDATES:
                if args.fp32 and cand > attn.WEDGE_MAX_BLOCK // 2 + 128:
                    continue  # fp32 VMEM budget — mirror _wedge_layout
                attn.set_tune_table({"wedge": {key: cand}})
                ms = _time_fused_safe(s, args.b, args.h, args.d, dtype)
                if ms == float("inf"):
                    continue
                rows[cand] = round(ms, 4)
                print(f"S={s} wedge cap={cand}: {ms:.3f} ms", flush=True)
            attn.set_tune_table(None)
            if not rows:
                print(f"S={s} ({key}): every candidate failed; skipping")
                continue
            best = min(rows, key=rows.get)
            table["wedge"][key] = best
            measurements[f"wedge {key}"] = {str(k): v for k, v in rows.items()}
            print(f"S={s} ({key}): best wedge cap {best} ({rows[best]:.3f} ms)")
        elif not args.fp32 and s128 <= attn.WEDGE_FWD_MAX_SEQ:
            # hybrid regime (bf16, S ≤ WEDGE_FWD_MAX_SEQ): the forward is
            # the capped wedge, the backward the FUSED one-call kernel
            # (r5; _hybrid_backward) — sweep wedge cap × fused (block,
            # tile), both of which must divide the wedge's padded length.
            # bf16 S > WEDGE_FWD_MAX_SEQ (like fp32 long-S) runs the pure
            # loop family and takes the loop sweep below.
            rows = {}
            for cap in (256, 512):
                _, s_pad, _ = attn._wedge_layout(s, itemsize, cap)
                for blk in (128, 256, 512):
                    if s_pad % blk:
                        continue
                    for tile in (128, 256, 512):
                        if s_pad % tile:
                            continue
                        attn.set_tune_table({
                            "wedge": {key: cap},
                            "hybrid_bwd": {key: [blk, tile]},
                        })
                        ms = _time_fused_safe(s, args.b, args.h, args.d,
                                              dtype)
                        if ms == float("inf"):
                            continue
                        rows[(cap, blk, tile)] = round(ms, 4)
                        print(f"S={s} cap={cap} fused blk={blk} tile={tile}:"
                              f" {ms:.3f} ms", flush=True)
            attn.set_tune_table(None)
            if not rows:
                print(f"S={s} ({key}): every candidate failed; skipping")
                continue
            best = min(rows, key=rows.get)
            cap, blk, tile = best
            table["wedge"][key] = cap
            table.setdefault("hybrid_bwd", {})[key] = [blk, tile]
            measurements[f"hybrid_fused {key}"] = {str(list(k)): v
                                                   for k, v in rows.items()}
            print(f"S={s} ({key}): best cap={cap} fused blk={blk} "
                  f"tile={tile} ({rows[best]:.3f} ms)")
        else:
            # loop-family regimes (fp32 long-S, and bf16 beyond
            # WEDGE_FWD_MAX_SEQ): [bq=bk, bwd_q=bwd_k] grid.
            # The backward pads to the forward's s_pad = round_up(s, bq),
            # so bwd candidates must divide THAT; entries without an
            # explicit bwd fall back to the dispatch default (bq, valid
            # because bq | s_pad).
            rows = {}
            for c in (128, 256, 512):
                s_pad = -(-s // c) * c
                bwds = [bw for bw in (128, 256, 512, 640, 1088, 2176)
                        if s_pad % bw == 0 and bw != c]
                for entry in [[c, c]] + [[c, c, bw, bw] for bw in bwds]:
                    attn.set_tune_table({"loop": {key: entry}})
                    ms = _time_fused_safe(s, args.b, args.h, args.d, dtype)
                    if ms == float("inf"):
                        continue
                    rows[tuple(entry)] = round(ms, 4)
                    print(f"S={s} loop {entry}: {ms:.3f} ms", flush=True)
            attn.set_tune_table(None)
            if not rows:
                print(f"S={s} ({key}): every candidate failed; skipping")
                continue
            best = min(rows, key=rows.get)
            table.setdefault("loop", {})[key] = list(best)
            measurements[f"loop {key}"] = {str(list(k)): v
                                           for k, v in rows.items()}
            print(f"S={s} ({key}): best loop {list(best)} "
                  f"({rows[best]:.3f} ms)")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
