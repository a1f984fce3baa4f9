"""Generate images from text with a trained DALLE + VAE.

New capability vs the reference (whose PREDICT paths all raise
NotImplementedError). Usage:

    python sample_dalle.py --model dalle_example --text "a red square" \
        --out samples/ --n 4 --temperature 1.0 --top_k 64
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from dalle_mtf_tpu.data.tokenizer import get_tokenizer, pad_or_truncate
from dalle_mtf_tpu.sample import generate_images
from dalle_mtf_tpu.train.tasks import make_dalle_task
from dalle_mtf_tpu.utils.config import fetch_model_params
from dalle_mtf_tpu.utils.logging_utils import setup_logging
from train_dalle import _ckpt_dir, load_vae_params


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--text", type=str, required=True)
    parser.add_argument(
        "--n", type=int, default=None,
        help="images to generate (default: config predict_batch_size, else 1)",
    )
    parser.add_argument("--out", type=str, default="samples")
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--top_k", type=int, default=0)
    parser.add_argument("--top_p", type=float, default=None,
                        help="nucleus sampling: keep the smallest candidate "
                             "set with cumulative probability >= top_p")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--quantize", choices=("none", "int8", "int4"), default=None,
        help="decode-weight quantization (int4 = 4x less weight stream)",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="quantize decode weights to int8 (~1.5x faster decode, "
             "per-column scales)",
    )
    return parser.parse_args()


def load_dalle_params(params, dalle):
    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(
        _ckpt_dir(params["model_path"]),
        options=ocp.CheckpointManagerOptions(create=False),
    )
    latest = mngr.latest_step()
    if latest is None:
        raise FileNotFoundError(
            f"no DALLE checkpoint under {params['model_path']}"
        )
    return mngr.restore(latest)["params"]


def main():
    args = parse_args()
    params = fetch_model_params(args.model)
    from dalle_mtf_tpu.utils.distributed import maybe_enable_compilation_cache

    maybe_enable_compilation_cache(params)
    assert params["model_type"] == "dalle"
    setup_logging(params["config_name"] or args.model)

    n = args.n if args.n is not None else (params["predict_batch_size"] or 1)
    tokenizer = get_tokenizer()
    params["padding_id"] = tokenizer.pad_token_id
    ids = pad_or_truncate(
        tokenizer.encode(args.text), params["text_seq_len"], tokenizer.pad_token_id
    )
    text = jnp.asarray([ids] * n, jnp.int32)

    dalle, vae, _init, _loss, _eval, axes = make_dalle_task(params)
    dalle_params = load_dalle_params(params, dalle)
    vae_params = load_vae_params(params, vae)

    # shard over the config's mesh (12B-scale sampling needs TP; on one chip
    # this is a no-op). GSPMD propagates the sharding through prefill/decode.
    from dalle_mtf_tpu.parallel.mesh import build_mesh, parse_layout, shard_params

    mesh = build_mesh(params.get("mesh_shape"))
    rules = parse_layout(params.get("layout"))
    dalle_params = shard_params(dalle_params, mesh, rules, axes)
    if mesh.devices.size > 1:
        # sharded sampling keeps the einsum forms — GSPMD cannot partition
        # the Pallas streaming dequant kernels (dalle.py::_streaming_eligible)
        import dataclasses

        from dalle_mtf_tpu.models.dalle import DALLE

        dalle = DALLE(dataclasses.replace(dalle.cfg, decode_kernels=False))
    quant = args.quantize or ("int8" if args.int8 else "none")
    if quant != "none":
        # Quantize AFTER sharding: the elementwise quantize preserves each
        # leaf's NamedSharding (scales keepdims along the contracted axis),
        # so TP-scale configs stay sharded; quantizing first would both skip
        # sharding and misalign the <name>_scale leaves against the
        # logical-axes tree that shard_params zips over.
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

    t0 = time.time()
    imgs = generate_images(
        dalle, dalle_params, vae, vae_params, text,
        jax.random.PRNGKey(args.seed),
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
    )
    imgs = np.asarray(jax.device_get(imgs))
    dt = time.time() - t0

    os.makedirs(args.out, exist_ok=True)
    from PIL import Image

    for i, img in enumerate(imgs):
        arr = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(args.out, f"sample_{i}.png"))
    print(
        f"wrote {len(imgs)} images to {args.out} "
        f"({dt:.2f}s total incl. compile, {dalle.cfg.image_seq_len} tokens each)"
    )


if __name__ == "__main__":
    main()
