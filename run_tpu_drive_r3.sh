#!/bin/bash
# Round-3 TPU drive: verify smoke stages + benches + perf sweeps.
# Run alone (the host has ONE cpu core; anything concurrent starves XLA
# compiles). Appends everything to /tmp/tpu_drive_r3.log.
set -x
cd /root/repo

echo "=== probe ==="
timeout 300 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones((8,8)).sum()))" || exit 41

echo "=== stage 1: vae_smoke2 ==="
timeout 900 python train_vae.py --model vae_smoke2 --new --yes 2>&1 | tail -6

echo "=== stage 2: dalle_long ==="
timeout 900 python train_dalle.py --model dalle_long --new --yes 2>&1 | tail -6

echo "=== stage 3: sampling ==="
timeout 900 python sample_dalle.py --model dalle_long --text "time year people" --n 2 --top_k 8 2>&1 | tail -4

echo "=== ring kernels on real TPU ==="
timeout 900 python check_ring_tpu.py 2>&1 | tail -10

echo "=== bench.py baseline (dots_saveable@16) ==="
timeout 900 python bench.py 2>&1 | tail -2

echo "=== bench_vae ==="
timeout 900 python bench_vae.py 2>&1 | tail -2

echo "=== attention S=2560 (dalle_12B true shape) wedge ==="
timeout 900 python bench_attention.py --s 2560 --b 4 2>&1 | tail -3
echo "=== attention S=2560 whole-row (comparison) ==="
DALLE_TPU_ATTN_SHORT=wr timeout 900 python bench_attention.py --s 2560 --b 4 2>&1 | tail -3
echo "=== attention S=4352 loop regime (dalle_4k) ==="
timeout 900 python bench_attention.py --s 4352 --b 2 2>&1 | tail -3

echo "=== decode p50 int8 ==="
BENCH_DECODE_QUANT=int8 timeout 900 python bench_decode.py 2>&1 | tail -2
echo "=== decode p50 int4 ==="
BENCH_DECODE_QUANT=int4 timeout 900 python bench_decode.py 2>&1 | tail -2

echo "=== perf sweep: fused_xent chunks ==="
BENCH_FUSED_XENT=1 BENCH_XENT_CHUNKS=2 timeout 900 python bench.py 2>&1 | tail -2
BENCH_FUSED_XENT=1 BENCH_XENT_CHUNKS=4 timeout 900 python bench.py 2>&1 | tail -2
echo "=== perf sweep: batch ==="
BENCH_BATCH=20 timeout 900 python bench.py 2>&1 | tail -2
BENCH_BATCH=24 BENCH_FUSED_XENT=1 BENCH_XENT_CHUNKS=2 timeout 900 python bench.py 2>&1 | tail -2

echo "=== drive done ==="
