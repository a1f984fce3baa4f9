"""Batching HTTP inference server for a trained DALLE + VAE.

Production serving the reference never had (its PREDICT paths raise
NotImplementedError). One compiled fixed-batch sampler executable serves a
request queue with short-linger batching (dalle_mtf_tpu/serve.py).

    python serve_dalle.py --model dalle_example --port 8000 \
        --batch-size 4 --top_k 64 [--int8]

    curl -s localhost:8000/generate -d '{"text": "a red cube", "n": 2}'
    # -> {"images": ["<base64 png>", ...], "latency_s": 1.9}
"""

from __future__ import annotations

import argparse
import logging

import jax

from dalle_mtf_tpu.data.tokenizer import get_tokenizer
from dalle_mtf_tpu.serve import BatchingSampler, make_server
from dalle_mtf_tpu.train.tasks import make_dalle_task
from dalle_mtf_tpu.utils.config import fetch_model_params
from dalle_mtf_tpu.utils.logging_utils import setup_logging
from sample_dalle import load_dalle_params
from train_dalle import load_vae_params

logger = logging.getLogger(__name__)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch-size", type=int, default=None,
                   help="server batch rows (default: config "
                        "predict_batch_size, else 4)")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=64)
    p.add_argument("--linger-ms", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--continuous", action="store_true",
                   help="continuous batching: requests join the live batch "
                        "at --chunk-token boundaries instead of waiting out "
                        "the in-flight generation (per-request top_k needs "
                        "no buckets in this mode)")
    p.add_argument("--chunk", type=int, default=128,
                   help="decode steps per device dispatch in --continuous "
                        "mode (admission latency ~= chunk * step time)")
    p.add_argument("--int8", action="store_true",
                   help="int8 decode weights (~1.5x faster decode)")
    p.add_argument("--quantize", choices=("none", "int8", "int4"),
                   default=None,
                   help="decode-weight quantization (int4 packs two values "
                        "per byte: 4x less weight stream than bf16)")
    return p.parse_args()


def main():
    args = parse_args()
    params = fetch_model_params(args.model)
    from dalle_mtf_tpu.utils.distributed import maybe_enable_compilation_cache

    maybe_enable_compilation_cache(params)
    assert params["model_type"] == "dalle"
    setup_logging(params["config_name"] or args.model)

    tokenizer = get_tokenizer()
    params["padding_id"] = tokenizer.pad_token_id
    dalle, vae, _init, _loss, _eval, axes = make_dalle_task(params)
    dalle_params = load_dalle_params(params, dalle)
    vae_params = load_vae_params(params, vae)

    from dalle_mtf_tpu.parallel.mesh import build_mesh, parse_layout, shard_params

    mesh = build_mesh(params.get("mesh_shape"))
    rules = parse_layout(params.get("layout"))
    dalle_params = shard_params(dalle_params, mesh, rules, axes)
    if mesh.devices.size > 1:
        # sharded serving keeps the einsum forms — GSPMD cannot partition
        # the Pallas streaming dequant kernels (dalle.py::_streaming_eligible)
        import dataclasses

        from dalle_mtf_tpu.models.dalle import DALLE

        dalle = DALLE(dataclasses.replace(dalle.cfg, decode_kernels=False))
    quant = args.quantize or ("int8" if args.int8 else "none")
    if quant != "none":
        from dalle_mtf_tpu.quantize import (
            quantize_layers_int4,
            quantize_layers_int8,
        )

        fn = quantize_layers_int4 if quant == "int4" else quantize_layers_int8
        dalle_params = fn(dalle_params)
    else:
        # unquantized serving still casts the fp32 masters to bf16 ONCE —
        # a convert left inside the decode scan streams fp32 (quantize.py)
        from dalle_mtf_tpu.quantize import cast_decode_weights

        dalle_params = cast_decode_weights(dalle_params)

    batch = args.batch_size or params["predict_batch_size"] or 4
    if args.continuous:
        from dalle_mtf_tpu.serve import ContinuousBatchingSampler

        sampler = ContinuousBatchingSampler(
            dalle, dalle_params, vae, vae_params,
            batch_size=batch, temperature=args.temperature,
            top_k=args.top_k, seed=args.seed, chunk=args.chunk,
        )
    else:
        sampler = BatchingSampler(
            dalle, dalle_params, vae, vae_params,
            batch_size=batch, temperature=args.temperature, top_k=args.top_k,
            linger_ms=args.linger_ms, seed=args.seed,
        )
    # warm the executable so the first request doesn't pay the compile
    warm = sampler.submit([params["padding_id"]] * dalle.cfg.text_seq_len, 1)
    warm.result()
    logger.info("sampler warm; %d device(s), batch=%d", jax.device_count(), batch)

    server = make_server(
        sampler, tokenizer, dalle.cfg.text_seq_len,
        host=args.host, port=args.port,
    )
    logger.info("serving on %s:%d", args.host, args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        # graceful: resolve every already-accepted request before exiting
        sampler.drain(timeout=300)


if __name__ == "__main__":
    main()
