#!/bin/bash
# Round-3 session-D TPU drive: the r3b queue, trimmed and priority-ordered
# so the highest-value results land first if the TPU tunnel drops.
# Run alone (ONE cpu core; concurrent work starves XLA compiles).
set -x
cd /root/repo

echo "=== probe ==="
timeout 300 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones((8,8)).sum()))" || exit 41

echo "=== bench.py current default (sanity re-run) ==="
timeout 900 python bench.py 2>&1 | tail -1

echo "=== bench.py ln_dtype=activation ==="
BENCH_LN_DTYPE=activation timeout 900 python bench.py 2>&1 | tail -1

echo "=== ln_dtype precision check (matched-params) ==="
timeout 1200 python check_ln_dtype.py 2>&1 | tail -2

echo "=== smoke stages (verify skill) ==="
timeout 900 python train_vae.py --model vae_smoke2 --new --yes 2>&1 | tail -2
timeout 900 python train_dalle.py --model dalle_long --new --yes 2>&1 | tail -2
timeout 900 python sample_dalle.py --model dalle_long --text "time year people" --n 2 --top_k 8 2>&1 | tail -2

echo "=== autotune wedge caps (S=1280 bench shape) ==="
mkdir -p runs
timeout 1800 python autotune_attention.py --s 1280 --out runs/attn_tune.json 2>&1 | tail -8

echo "=== bench.py with tuned caps ==="
DALLE_TPU_ATTN_TUNE=runs/attn_tune.json timeout 900 python bench.py 2>&1 | tail -1

echo "=== bench.py combined: tuned caps + ln_dtype=activation ==="
DALLE_TPU_ATTN_TUNE=runs/attn_tune.json BENCH_LN_DTYPE=activation \
  timeout 900 python bench.py 2>&1 | tail -1

echo "=== vae sweep: no-remat batch 40 ==="
BENCH_VAE_RECOMPUTE=0 BENCH_VAE_BATCH=40 timeout 900 python bench_vae.py 2>&1 | tail -1
echo "=== vae sweep: no-remat batch 48 ==="
BENCH_VAE_RECOMPUTE=0 BENCH_VAE_BATCH=48 timeout 900 python bench_vae.py 2>&1 | tail -1
echo "=== vae sweep: remat batch 64 ==="
BENCH_VAE_RECOMPUTE=1 BENCH_VAE_BATCH=64 timeout 900 python bench_vae.py 2>&1 | tail -1

echo "=== attention S=4352 with the hybrid (dalle_4k regime) ==="
timeout 900 python bench_attention.py --s 4352 --b 2 2>&1 | tail -3

echo "=== autotune S=2560 (dalle_12B shape) ==="
timeout 1800 python autotune_attention.py --s 2560 --out runs/attn_tune.json 2>&1 | tail -8

echo "=== decode per-row (continuous path) overhead vs whole-scan ==="
BENCH_DECODE_ROWS=1 timeout 1200 python bench_decode.py 2>&1 | tail -1

echo "=== serve CONTINUOUS vs whole-batch, staggered 300ms arrivals ==="
BENCH_SERVE_CONTINUOUS=1 BENCH_SERVE_ARRIVAL_MS=300 timeout 2400 python bench_serve.py 2>&1 | tail -1
BENCH_SERVE_ARRIVAL_MS=300 timeout 2400 python bench_serve.py 2>&1 | tail -1

echo "=== drive r3c done ==="
