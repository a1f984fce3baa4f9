#!/bin/bash
# Round-3 session-B TPU drive: verify smoke + LN-dtype experiment +
# VAE remat/batch sweep + wedge-cap autotune.
# Run alone (ONE cpu core; concurrent work starves XLA compiles).
set -x
cd /root/repo

echo "=== probe ==="
timeout 300 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones((8,8)).sum()))" || exit 41

echo "=== smoke stages (verify skill) ==="
timeout 900 python train_vae.py --model vae_smoke2 --new --yes 2>&1 | tail -2
timeout 900 python train_dalle.py --model dalle_long --new --yes 2>&1 | tail -2
timeout 900 python sample_dalle.py --model dalle_long --text "time year people" --n 2 --top_k 8 2>&1 | tail -2

echo "=== bench.py current default (sanity re-run) ==="
timeout 900 python bench.py 2>&1 | tail -1

echo "=== bench.py ln_dtype=activation ==="
BENCH_LN_DTYPE=activation timeout 900 python bench.py 2>&1 | tail -1

echo "=== ln_dtype precision check (matched-params) ==="
timeout 1200 python check_ln_dtype.py 2>&1 | tail -1

echo "=== vae sweep: no-remat batch 32 (confirm 147.3) ==="
BENCH_VAE_RECOMPUTE=0 BENCH_VAE_BATCH=32 timeout 900 python bench_vae.py 2>&1 | tail -1
echo "=== vae sweep: no-remat batch 40 ==="
BENCH_VAE_RECOMPUTE=0 BENCH_VAE_BATCH=40 timeout 900 python bench_vae.py 2>&1 | tail -1
echo "=== vae sweep: no-remat batch 48 ==="
BENCH_VAE_RECOMPUTE=0 BENCH_VAE_BATCH=48 timeout 900 python bench_vae.py 2>&1 | tail -1
echo "=== vae sweep: remat batch 64 ==="
BENCH_VAE_RECOMPUTE=1 BENCH_VAE_BATCH=64 timeout 900 python bench_vae.py 2>&1 | tail -1

echo "=== attention S=4352 with the hybrid (was 1.539/5.937 ms pure-loop) ==="
timeout 900 python bench_attention.py --s 4352 --b 2 2>&1 | tail -3

echo "=== autotune wedge caps (S=1280, 2560) ==="
timeout 1800 python autotune_attention.py --s 1280 2560 --out runs/attn_tune.json 2>&1 | tail -8
echo "=== autotune loop blocks (S=4352, dalle_4k) ==="
timeout 2400 python autotune_attention.py --s 4352 --b 2 --out runs/attn_tune.json 2>&1 | tail -14
echo "=== bench.py with tuned caps (if any change) ==="
DALLE_TPU_ATTN_TUNE=runs/attn_tune.json timeout 900 python bench.py 2>&1 | tail -1

echo "=== bench.py combined: tuned caps + ln_dtype=activation ==="
DALLE_TPU_ATTN_TUNE=runs/attn_tune.json BENCH_LN_DTYPE=activation \
  timeout 900 python bench.py 2>&1 | tail -1

echo "=== predict-hook artifacts from the dalle_long smoke stage ==="
ls runs/dalle_long/predict/*/ 2>&1 | head -6

echo "=== serve under load: int4, device batch 4, 24 requests ==="
timeout 2400 python bench_serve.py 2>&1 | tail -1
echo "=== serve under load: int4, device batch 8 ==="
BENCH_SERVE_BATCH=8 BENCH_SERVE_REQUESTS=32 timeout 2400 python bench_serve.py 2>&1 | tail -1

echo "=== serve CONTINUOUS vs whole-batch, staggered 300ms Poisson arrivals ==="
BENCH_SERVE_CONTINUOUS=1 BENCH_SERVE_ARRIVAL_MS=300 timeout 2400 python bench_serve.py 2>&1 | tail -1
BENCH_SERVE_ARRIVAL_MS=300 timeout 2400 python bench_serve.py 2>&1 | tail -1
echo "=== serve CONTINUOUS burst (all at once) ==="
BENCH_SERVE_CONTINUOUS=1 timeout 2400 python bench_serve.py 2>&1 | tail -1

echo "=== decode per-row (continuous path) overhead vs whole-scan ==="
BENCH_DECODE_ROWS=1 timeout 1200 python bench_decode.py 2>&1 | tail -1
BENCH_DECODE_ROWS=1 BENCH_DECODE_CHUNK=256 timeout 1200 python bench_decode.py 2>&1 | tail -1

echo "=== drive r3b done ==="
