"""Benchmark: image decode latency (p50) at dalle_coco scale.

One text prompt -> 1024 image tokens through the compiled KV-cache scan
(sample.py) on the flagship model shape. Prints one JSON line like bench.py.
Target (BASELINE.md): < 2 s per image.

BENCH_DECODE_QUANT selects the weight format: int8 (default), int4, none.
BENCH_DECODE_ROWS=1 measures the CONTINUOUS-batching decode path instead
(sample.decode_chunk: per-row positions via vmapped cache scatter +
chunked dispatch) on the same single-prompt workload — the delta vs the
default whole-scan metric is continuous batching's per-token overhead.
BENCH_DECODE_CHUNK sets its chunk length (default 128).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

TRIALS = 5
TARGET_S = 2.0
QUANT = os.environ.get("BENCH_DECODE_QUANT", "int8")
ROWS = bool(int(os.environ.get("BENCH_DECODE_ROWS", "0")))
CHUNK = int(os.environ.get("BENCH_DECODE_CHUNK", "128"))


def main():
    from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
    from dalle_mtf_tpu.sample import generate_image_tokens

    cfg = DalleConfig(
        n_embd=1024,
        text_vocab_size=50258,
        image_vocab_size=512,
        text_seq_len=256,
        image_seq_len=1024,
        n_layers=12,
        n_heads=8,
        bf_16=True,
    )
    model = DALLE(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    # serving configuration: quantized decode weights (quantize.py) —
    # decoding is weight-bandwidth bound (int8 ~20% faster than bf16,
    # BENCH.md); int4 halves the stream again
    if QUANT == "int8":
        from dalle_mtf_tpu.quantize import quantize_layers_int8

        params = quantize_layers_int8(params)
    elif QUANT == "int4":
        from dalle_mtf_tpu.quantize import quantize_layers_int4

        params = quantize_layers_int4(params)
    else:
        from dalle_mtf_tpu.quantize import cast_decode_weights

        params = cast_decode_weights(params)
    text = jax.random.randint(
        jax.random.PRNGKey(1), (1, cfg.text_seq_len), 0, cfg.text_vocab_size,
        jnp.int32,
    )

    def run_whole(i: int):
        toks = generate_image_tokens(
            model, params, text, jax.random.fold_in(jax.random.PRNGKey(3), i),
            top_k=64,
        )
        jax.device_get(toks)  # host fetch = real sync (see bench.py)

    def run_rows(i: int):
        from dalle_mtf_tpu.sample import admit_rows, decode_chunk

        end = cfg.text_seq_len + cfg.image_seq_len
        cache = model.init_cache(1)
        # the continuous engine's logits ride banded to the image vocab
        # (serve.py:456, sample.admit_rows)
        logits = jnp.zeros((1, cfg.image_vocab_size), jnp.float32)
        positions = jnp.full((1,), end, jnp.int32)
        cache, logits, positions = admit_rows(
            model, params, cache, logits, positions, text,
            jnp.ones((1,), bool),
        )
        rng = jax.random.fold_in(jax.random.PRNGKey(3), i)
        temps = jnp.ones((1,), jnp.float32)
        topks = jnp.full((1,), 64, jnp.int32)
        out = None
        for _ in range((cfg.image_seq_len + CHUNK - 1) // CHUNK):
            cache, logits, positions, rng, out, _act = decode_chunk(
                model, params, cache, logits, positions, rng, temps, topks,
                chunk=CHUNK, k_max=256,
            )
        jax.device_get(out)

    run = run_rows if ROWS else run_whole
    run(99)  # compile

    times = []
    for i in range(TRIALS):
        t0 = time.perf_counter()
        run(i)
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]
    suffix = f"_rows_c{CHUNK}" if ROWS else ""
    print(
        json.dumps(
            {
                "metric": f"dalle_coco_image_decode_p50_latency_{QUANT}{suffix}",
                "value": round(p50, 3),
                "unit": "seconds/1024-token-image",
                "vs_baseline": round(TARGET_S / p50, 3),  # >1 = faster than target
            }
        )
    )


if __name__ == "__main__":
    main()
