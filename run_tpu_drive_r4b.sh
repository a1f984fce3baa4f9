#!/bin/bash
# Round-4b measurement drive: packed-attention follow-ups on the real chip.
# Run when the TPU relay is healthy (probe: python -c "import jax,
# jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))").
set -x
cd /root/repo

# 1. headline at the new defaults (packed + dots_and_attn + batch 22)
python bench.py

# 2. corroboration: the REAL Trainer step at dalle_coco config (now picks
#    up attn_packed default + the config's dots_and_attn); sweep per-chip
#    batch — the e2e step also holds the frozen VAE, so bench.py's 22 may
#    not fit
for b in 16 18 20; do BENCH_E2E_BATCH=$b python bench_e2e_step.py; done

# 3. kernel-level: packed vs per-call vs XLA at the two wedge shapes
python bench_attention.py --impl all --b 18 --s 1280
python bench_attention.py --impl all --b 4 --s 2560

# 4. packed-family autotune sweep -> committed table
python autotune_attention.py --packed --s 1280 --b 18 --out runs/attn_tune.json
python autotune_attention.py --packed --s 2560 --b 4 --out runs/attn_tune.json

# 5. tuned-table headline re-check
DALLE_TPU_ATTN_TUNE=runs/attn_tune.json python bench.py

# 6. scan-unroll re-ask: the r3 unroll study predates packed attention +
#    dots_and_attn (different copy landscape — the DUS stacks now carry
#    out/lse saves and no transposed layouts)
BENCH_SCAN_UNROLL=12 python bench.py
BENCH_SCAN_UNROLL=4 python bench.py

# 7. profile capture at the final defaults -> exclusive-time decomposition
#    (tools/bucket_trace.py) for the next-lever analysis
BENCH_PROFILE=/tmp/bench_prof_r4b python bench.py
python tools/dump_bench_hlo.py || true   # writes /tmp/bench_step_hlo.txt
