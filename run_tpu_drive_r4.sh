#!/bin/bash
# Round-4 TPU drive (VERDICT r3 items #2-#4): post-hybrid long-S
# measurements + committed autotune table, decode re-measure across
# quant x unroll after the cache-carry rework, and coco-scale serving
# under load. Run alone (ONE cpu core; concurrent work starves compiles).
set -x
cd /root/repo

echo "=== probe ==="
timeout 300 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones((8,8)).sum()))" || exit 41

echo "=== [#2] attention S=4352 b=2 with the hybrid (pre-hybrid: 1.539/5.937 ms) ==="
timeout 900 python bench_attention.py --s 4352 --b 2 2>&1 | tail -3

echo "=== [#2] autotune wedge caps (S=1280, 2560) -> runs/attn_tune.json ==="
timeout 1800 python autotune_attention.py --s 1280 2560 --out runs/attn_tune.json 2>&1 | tail -8
echo "=== [#2] autotune hybrid/loop blocks (S=4352, b=2) ==="
timeout 2400 python autotune_attention.py --s 4352 --b 2 --out runs/attn_tune.json 2>&1 | tail -14

echo "=== [#2] bench.py with the committed tune table (attn_tune key path) ==="
DALLE_TPU_ATTN_TUNE=runs/attn_tune.json timeout 900 python bench.py 2>&1 | tail -1

echo "=== [#2] dalle_4k END-TO-END trainer step (S=4352, hybrid regime) ==="
BENCH_E2E_CONFIG=dalle_4k BENCH_E2E_BATCH=8 timeout 1800 python bench_e2e_step.py 2>&1 | tail -1

echo "=== corroboration: dalle_coco e2e trainer step after the r4 head fix ==="
timeout 1800 python bench_e2e_step.py 2>&1 | tail -1

echo "=== [#3] decode matrix: quant x unroll (post cache-carry rework) ==="
for q in none int8 int4; do
  for u in 1 full; do
    echo "--- decode quant=$q unroll=$u"
    BENCH_DECODE_QUANT=$q DALLE_TPU_DECODE_UNROLL=$u timeout 1200 python bench_decode.py 2>&1 | tail -1
  done
done

echo "=== [#3] continuous-path decode overhead (per-row scatter) ==="
BENCH_DECODE_ROWS=1 timeout 1200 python bench_decode.py 2>&1 | tail -1
BENCH_DECODE_ROWS=1 BENCH_DECODE_CHUNK=256 timeout 1200 python bench_decode.py 2>&1 | tail -1

echo "=== [#4] serving at dalle_coco scale under load ==="
echo "--- whole-batch int4, device batch 4, 24 reqs (burst)"
timeout 2400 python bench_serve.py 2>&1 | tail -1
echo "--- whole-batch int4, device batch 8, 32 reqs (burst)"
BENCH_SERVE_BATCH=8 BENCH_SERVE_REQUESTS=32 timeout 2400 python bench_serve.py 2>&1 | tail -1
echo "--- whole-batch int4, device batch 16, 64 reqs (burst)"
BENCH_SERVE_BATCH=16 BENCH_SERVE_REQUESTS=64 timeout 3000 python bench_serve.py 2>&1 | tail -1
echo "--- continuous int4, batch 4, 24 reqs (burst)"
BENCH_SERVE_CONTINUOUS=1 timeout 2400 python bench_serve.py 2>&1 | tail -1
echo "--- continuous vs whole-batch, staggered 300ms Poisson arrivals"
BENCH_SERVE_CONTINUOUS=1 BENCH_SERVE_ARRIVAL_MS=300 timeout 2400 python bench_serve.py 2>&1 | tail -1
BENCH_SERVE_ARRIVAL_MS=300 timeout 2400 python bench_serve.py 2>&1 | tail -1
echo "--- int8 arm, batch 8, 32 reqs"
BENCH_SERVE_QUANT=int8 BENCH_SERVE_BATCH=8 BENCH_SERVE_REQUESTS=32 timeout 2400 python bench_serve.py 2>&1 | tail -1

echo "=== drive r4 done ==="
