"""Benchmark: image decode latency (p50) at dalle_coco scale.

One text prompt -> 1024 image tokens through the compiled KV-cache scan
(sample.py) on the flagship model shape. Prints one JSON line like bench.py.
Target (BASELINE.md): < 2 s per image.

BENCH_DECODE_QUANT selects the weight format: int8 (default), int4, none.
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

    # compile
    toks = generate_image_tokens(model, params, text, jax.random.PRNGKey(2), top_k=64)
    jax.device_get(toks)

    times = []
    for i in range(TRIALS):
        t0 = time.perf_counter()
        toks = generate_image_tokens(
            model, params, text, jax.random.fold_in(jax.random.PRNGKey(3), i),
            top_k=64,
        )
        jax.device_get(toks)  # host fetch = real sync (see bench.py)
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]
    print(
        json.dumps(
            {
                "metric": f"dalle_coco_image_decode_p50_latency_{QUANT}",
                "value": round(p50, 3),
                "unit": "seconds/1024-token-image",
                "vs_baseline": round(TARGET_S / p50, 3),  # >1 = faster than target
            }
        )
    )


if __name__ == "__main__":
    main()
