"""Benchmark: serving under concurrent load at dalle_coco scale.

Drives the production BatchingSampler (serve.py — queue, linger batching,
per-request temperature, bucketed top_k) with concurrent mixed-parameter
requests and reports sustained throughput plus request-latency p50/p99.
Complements bench_decode.py (single-stream p50): batching amortizes the
weight stream across rows, so throughput should approach
batch_size / single-stream-latency.

Prints ONE JSON line like bench.py. vs_baseline: BASELINE.md's <2 s/image
target = 0.5 images/sec single-stream; >1 means the batched server beats
the single-stream target rate.

Env: BENCH_SERVE_QUANT (int4 default | int8 | none), BENCH_SERVE_BATCH
(device batch, default 4), BENCH_SERVE_REQUESTS (default 24),
BENCH_SERVE_TINY=1 (CPU-sized smoke of the harness itself),
BENCH_SERVE_CONTINUOUS=1 (slot-level continuous batching engine;
per-request top_k needs no buckets there), BENCH_SERVE_CHUNK (decode
steps per dispatch in continuous mode, default 128),
BENCH_SERVE_ARRIVAL_MS (mean exponential inter-arrival gap; default 0 =
all at once — set it to expose the convoy effect continuous batching
removes).
"""

from __future__ import annotations

import json
import os
import threading
import time

import jax
import numpy as np

QUANT = os.environ.get("BENCH_SERVE_QUANT", "int4")
BATCH = int(os.environ.get("BENCH_SERVE_BATCH", 4))
N_REQUESTS = int(os.environ.get("BENCH_SERVE_REQUESTS", 24))
TINY = bool(int(os.environ.get("BENCH_SERVE_TINY", "0")))
CONTINUOUS = bool(int(os.environ.get("BENCH_SERVE_CONTINUOUS", "0")))
CHUNK = int(os.environ.get("BENCH_SERVE_CHUNK", 128))
ARRIVAL_MS = float(os.environ.get("BENCH_SERVE_ARRIVAL_MS", 0))
TARGET_IMAGES_PER_SEC = 0.5  # BASELINE.md: <2 s per image, single stream


def main():
    from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
    from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig
    from dalle_mtf_tpu.serve import BatchingSampler

    if TINY:
        cfg = DalleConfig(
            n_embd=64, text_vocab_size=256, image_vocab_size=32,
            text_seq_len=8, image_seq_len=16, n_layers=2, n_heads=2,
        )
        vae_cfg = VAEConfig(
            num_tokens=32, n_channels=3, convblocks=((1, 8), (1, 16)),
            image_size=16,
        )
    else:
        # dalle_coco scale (bench.py shape) with the matching 256px VAE
        cfg = DalleConfig(
            n_embd=1024, text_vocab_size=50258, image_vocab_size=512,
            text_seq_len=256, image_seq_len=1024, n_layers=12, n_heads=8,
            bf_16=True,
        )
        vae_cfg = VAEConfig(
            num_tokens=512, n_channels=3,
            convblocks=((2, 128), (3, 256), (5, 512)), image_size=256,
        )
    dalle = DALLE(cfg)
    params = jax.jit(dalle.init)(jax.random.PRNGKey(0))
    vae = DiscreteVAE(vae_cfg)
    vae_params = jax.jit(vae.init)(jax.random.PRNGKey(1))

    if QUANT == "int8":
        from dalle_mtf_tpu.quantize import quantize_layers_int8

        params = quantize_layers_int8(params)
    elif QUANT == "int4":
        from dalle_mtf_tpu.quantize import quantize_layers_int4

        params = quantize_layers_int4(params)
    else:
        from dalle_mtf_tpu.quantize import cast_decode_weights

        params = cast_decode_weights(params)

    if CONTINUOUS:
        from dalle_mtf_tpu.serve import ContinuousBatchingSampler

        sampler = ContinuousBatchingSampler(
            dalle, params, vae, vae_params,
            batch_size=BATCH, top_k=64 if not TINY else 8, chunk=CHUNK,
        )
    else:
        sampler = BatchingSampler(
            dalle, params, vae, vae_params,
            batch_size=BATCH, top_k=64 if not TINY else 8, linger_ms=5.0,
        )
    rng = np.random.RandomState(0)
    prompts = [
        rng.randint(0, cfg.text_vocab_size, cfg.text_seq_len).tolist()
        for _ in range(N_REQUESTS)
    ]
    # mixed per-request params: two temperatures, two top_k buckets —
    # the realistic worst case for batch grouping
    temps = [0.7 if i % 2 else 1.0 for i in range(N_REQUESTS)]
    top_ks = [(16 if i % 3 == 0 else (64 if not TINY else 8))
              for i in range(N_REQUESTS)]

    # warmup: compile every executable before timing (continuous mode has
    # one executable regardless of top_k; warm once)
    for k in sorted(set(top_ks)) if not CONTINUOUS else [top_ks[0]]:
        sampler.submit(prompts[0], n=1, temperature=1.0, top_k=k).result(
            timeout=1800
        )

    latencies = [0.0] * N_REQUESTS
    results = [None] * N_REQUESTS

    def fire(i: int):
        t0 = time.perf_counter()
        results[i] = sampler.submit(
            prompts[i], n=1, temperature=temps[i], top_k=top_ks[i]
        ).result(timeout=1800)
        latencies[i] = time.perf_counter() - t0

    t_start = time.perf_counter()
    threads = [
        threading.Thread(target=fire, args=(i,)) for i in range(N_REQUESTS)
    ]
    arrival_rng = np.random.RandomState(1)
    for t in threads:
        t.start()
        if ARRIVAL_MS > 0:  # open-loop Poisson arrivals
            time.sleep(arrival_rng.exponential(ARRIVAL_MS / 1e3))
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    sampler.close()

    assert all(r is not None for r in results)
    lat = sorted(latencies)
    p50 = lat[len(lat) // 2]
    p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))]
    throughput = N_REQUESTS / wall
    print(
        json.dumps(
            {
                "metric": (
                    f"dalle_coco_serve_images_per_sec_{QUANT}_b{BATCH}"
                    + ("_continuous" if CONTINUOUS else "")
                ),
                "value": round(throughput, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(throughput / TARGET_IMAGES_PER_SEC, 3),
                "latency_p50_s": round(p50, 3),
                "latency_p99_s": round(p99, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
