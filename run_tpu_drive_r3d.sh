#!/bin/bash
# Round-3 session-D decode-latency drive: layer-scan unroll experiments +
# scan-floor probe (targets the VERDICT r2 "decode p50 <= 0.8 s" stretch;
# current int4 p50 0.929 s is op-overhead bound, BENCH.md "Decode latency").
set -x
cd /root/repo

echo "=== probe ==="
timeout 300 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones((8,8)).sum()))" || exit 41

echo "=== smoke stages (verify skill; r3c's ran before smoke data existed) ==="
timeout 900 python train_vae.py --model vae_smoke2 --new --yes 2>&1 | tail -2
timeout 900 python train_dalle.py --model dalle_long --new --yes 2>&1 | tail -2
timeout 900 python sample_dalle.py --model dalle_long --text "time year people" --n 2 --top_k 8 2>&1 | tail -3

echo "=== scan-floor probe: 1024-step scan, trivial body ==="
timeout 600 python - << 'EOF'
import time, jax, jax.numpy as jnp
# floor A: pure scan carry (loop machinery only)
def f(x):
    def body(c, _):
        return c + 1.0, ()
    c, _ = jax.lax.scan(body, x, None, length=1024)
    return c
g = jax.jit(f); x = jnp.float32(0.0)
float(g(x)); t0=time.perf_counter(); float(g(x)); t1=time.perf_counter()
print(f"floor_carry_1024steps_s={t1-t0:.4f}")
# floor B: one DUS + one [1,1024]x[1024,1024] matvec per step (the minimal
# "real" decode-ish body) x 12 layers rolled
w = jnp.zeros((12, 1024, 1024), jnp.bfloat16)
cache = jnp.zeros((12, 1, 1280, 8), jnp.bfloat16)
def h(x, w, cache):
    def step(carry, pos):
        x_, cache_ = carry
        def layer(xx, sc):
            wl, cl = sc
            y = (xx @ wl)
            cl = jax.lax.dynamic_update_slice(cl, y[:, :8][None], (0, pos, 0))
            return y, cl
        x_, cache_ = jax.lax.scan(layer, x_, (w, cache_))
        return (x_, cache_), ()
    (x, cache), _ = jax.lax.scan(step, (x, cache), jnp.arange(1024))
    return x.sum()
hj = jax.jit(h); xx = jnp.zeros((1, 1024), jnp.bfloat16)
float(hj(xx, w, cache)); t0=time.perf_counter(); float(hj(xx, w, cache)); t1=time.perf_counter()
print(f"floor_matvec_dus_12L_1024steps_s={t1-t0:.4f}")
EOF

echo "=== decode int4 unroll=1 (control, fresh process) ==="
BENCH_DECODE_QUANT=int4 timeout 1200 python bench_decode.py 2>&1 | tail -1
echo "=== decode int4 unroll=full ==="
DALLE_TPU_DECODE_UNROLL=full BENCH_DECODE_QUANT=int4 timeout 1200 python bench_decode.py 2>&1 | tail -1
echo "=== decode int4 unroll=4 ==="
DALLE_TPU_DECODE_UNROLL=4 BENCH_DECODE_QUANT=int4 timeout 1200 python bench_decode.py 2>&1 | tail -1
echo "=== decode int8 unroll=full ==="
DALLE_TPU_DECODE_UNROLL=full BENCH_DECODE_QUANT=int8 timeout 1200 python bench_decode.py 2>&1 | tail -1
echo "=== decode bf16 unroll=full ==="
DALLE_TPU_DECODE_UNROLL=full BENCH_DECODE_QUANT=none timeout 1200 python bench_decode.py 2>&1 | tail -1

echo "=== continuous rows path, int4 unroll=full ==="
DALLE_TPU_DECODE_UNROLL=full BENCH_DECODE_ROWS=1 timeout 1200 python bench_decode.py 2>&1 | tail -1

echo "=== drive r3d done ==="
