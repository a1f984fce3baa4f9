"""Host data-path benchmark: images/sec through the full input pipeline
(io_uring shard reads -> Example parse -> fused JPEG decode/crop/resize ->
shuffle -> batch), at dalle_coco's 256px decode shape.

The reference leaned on tf.data's C++ runtime for this (input_fns.py:24-29);
our pipeline must keep a TPU chip fed: dalle_coco at ~80k tok/s/chip consumes
~64 images/sec/chip, so a v4-8 host (4 chips) needs ~256 img/s and the
round-3 target is >1k img/s/host of decode headroom.

Usage: python bench_host_data.py [--images 2000] [--px 512] [--size 256]
Prints one JSON line {"metric": "host_data_images_per_sec", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def _make_shards(tmp: str, n_images: int, px: int, shards: int) -> str:
    """Synthesize realistic jpeg tfrecord shards (random photos compress to
    roughly real-world sizes at quality 90)."""
    import io

    from PIL import Image

    from dalle_mtf_tpu.data.tfrecord import TFRecordWriter, serialize_example

    rng = np.random.RandomState(0)
    per = n_images // shards
    # smooth noise -> jpeg sizes closer to photos than white noise
    base = rng.uniform(0, 255, (px // 8, px // 8, 3)).astype(np.uint8)
    img = np.asarray(
        Image.fromarray(base).resize((px, px), Image.BILINEAR), np.uint8
    )
    bufs = []
    for i in range(8):  # 8 distinct payloads, reused round-robin
        jit = np.clip(
            img.astype(np.int16) + rng.randint(-20, 20, img.shape), 0, 255
        ).astype(np.uint8)
        b = io.BytesIO()
        Image.fromarray(jit).save(b, format="JPEG", quality=90)
        bufs.append(b.getvalue())
    cap = list(rng.randint(0, 50_000, size=24))
    for s in range(shards):
        with TFRecordWriter(os.path.join(tmp, f"bench-{s:03d}.tfrecords")) as w:
            for i in range(per):
                w.write(
                    serialize_example(
                        {"image": bufs[(s * per + i) % len(bufs)], "caption": cap}
                    )
                )
    return os.path.join(tmp, "*.tfrecords")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=2000)
    ap.add_argument("--px", type=int, default=512)  # stored resolution
    ap.add_argument("--size", type=int, default=256)  # decode target
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--uint8", action="store_true",
                    help="dataset.uint8_images transfer mode (native pool "
                         "output rounded back to uint8)")
    args = ap.parse_args()

    from dalle_mtf_tpu.data.pipeline import dalle_input_fn
    from dalle_mtf_tpu.utils.config import Config

    with tempfile.TemporaryDirectory() as tmp:
        pattern = _make_shards(tmp, args.images, args.px, args.shards)
        params = Config.from_mapping(
            {
                "dataset": {"train_path": pattern, "image_size": args.size,
                            "uint8_images": bool(args.uint8)},
                "train_batch_size": args.batch,
                "text_seq_len": 24,
                "padding_id": 50257,
            }
        )
        n_batches = args.images // args.batch

        def run_epoch():
            it = iter(
                dalle_input_fn(params, eval=False, shard=(0, 1), repeat=True)
            )
            # warmup: one batch spins up pools and opens shards
            b = next(it)
            assert b["image"].shape == (args.batch, args.size, args.size, 3)
            t0 = time.perf_counter()
            for _ in range(n_batches):
                next(it)
            return args.batch * n_batches / (time.perf_counter() - t0)

        rate = max(run_epoch() for _ in range(2))
        fmt = "uint8" if args.uint8 else "f32"
        print(
            json.dumps(
                {
                    "metric": "host_data_images_per_sec"
                    + ("_uint8" if args.uint8 else ""),
                    "value": round(rate, 1),
                    "unit": f"img/s ({args.px}px jpeg -> {args.size}px {fmt})",
                }
            )
        )


if __name__ == "__main__":
    main()
