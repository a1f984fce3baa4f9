"""Dataset builder — TFRecord shards of {image: jpeg bytes, caption: token ids}.

Parity with src/data/create_tfrecords.py: jsonl in/out helpers (:16-35),
Example serialization (:38-56), ``create_random_dataset`` fabricating random
captions over an image glob for smoke tests (:59-97), and
``create_paired_dataset`` sharding a captions jsonl into .tfrecords files
(:100-178). Two reference bugs are fixed rather than ported (SURVEY.md §7):
- captions were tokenized as ``item["caption"][0]`` — the first *character*
  only (create_tfrecords.py:171); we tokenize the whole caption;
- the shard counter reopened the same filename before incrementing
  (:160-163), silently overwriting the first rollover shard.
"""

from __future__ import annotations

import glob as globlib
import io
import json
import os
import random
from pathlib import Path
from typing import Iterable

from dalle_mtf_tpu.data.tfrecord import TFRecordWriter, serialize_example
from dalle_mtf_tpu.data.tokenizer import get_tokenizer

# Small embedded word pool for create_random_dataset (the reference fetched
# a 10k word list over HTTP, create_tfrecords.py:70-73 — not possible in
# offline environments, and determinism is better for smoke tests anyway).
_WORDS = (
    "time year people way day man thing woman life child world school state "
    "family student group country problem hand part place case week company "
    "system program question work government number night point home water "
    "room mother area money story fact month lot right study book eye job "
    "word business issue side kind head house service friend father power "
    "hour game line end member law car city community name president team "
    "minute idea body information back parent face others level office door "
    "health person art war history party result change morning reason "
    "research girl guy moment air teacher force education"
).split()


def dump_jsonl(data: Iterable[dict], path: str | Path, append: bool = False):
    mode = "a" if append else "w"
    with open(path, mode) as f:
        for item in data:
            f.write(json.dumps(item) + "\n")


def load_jsonl(path: str | Path) -> list[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _reencode_jpeg(path: str, quality: int = 94) -> bytes:
    """Read an image and re-encode as JPEG (reference used cv2 at quality 94,
    create_tfrecords.py:164-169)."""
    from PIL import Image  # noqa: PLC0415

    img = Image.open(path).convert("RGB")
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def create_random_dataset(
    path_to_images: str,
    out_dir: str,
    max_images_per_folder: int = 1000,
    words_per_caption: int = 50,
    seed: int = 0,
):
    """Fabricate a captions jsonl over an image glob (for smoke testing)."""
    rng = random.Random(seed)
    out = Path(out_dir)
    os.makedirs(out, exist_ok=True)
    jsonl_path = out / "captions_data.jsonl"
    images = sorted(globlib.glob(path_to_images, recursive=True))
    print(f"{len(images)} images found")
    items = []
    for i, image in enumerate(images):
        folder = str(i // max_images_per_folder)
        sub = out / folder
        os.makedirs(sub, exist_ok=True)
        dst = sub / Path(image).name
        if not dst.exists():
            import shutil  # noqa: PLC0415

            shutil.copy(image, dst)
        items.append(
            {
                "caption": " ".join(
                    rng.choice(_WORDS) for _ in range(words_per_caption)
                ),
                "image_path": str(Path(folder) / Path(image).name),
            }
        )
    dump_jsonl(items, jsonl_path)
    return str(jsonl_path)


def create_paired_dataset(
    path_to_jsonl: str,
    name: str,
    out_dir: str,
    examples_per_file: int = 1000,
    reencode: bool = False,
    tokenizer=None,
):
    """jsonl [{caption, image_path}] -> sharded <name>_N.tfrecords files.

    ``out_dir`` may be a remote URL (gs://...) — shards stream through
    fsspec via TFRecordWriter; the jsonl and images are read locally.
    """
    from dalle_mtf_tpu.data import fs  # noqa: PLC0415

    out_dir = str(out_dir)  # accept pathlib.Path like the jsonl helpers do

    base_dir = Path(path_to_jsonl).parent
    fs.makedirs(out_dir)

    def shard_path(i: int) -> str:
        return f"{out_dir.rstrip('/')}/{name}_{i}.tfrecords"
    if tokenizer is None:
        tokenizer = get_tokenizer()
    items = load_jsonl(path_to_jsonl)

    writer = None
    shard = 0
    written = 0
    for item in items:
        if writer is None or written >= examples_per_file:
            if writer is not None:
                writer.close()
                shard += 1
            writer = TFRecordWriter(shard_path(shard))
            written = 0
        image_path = str(base_dir / item["image_path"])
        if reencode:
            image_bytes = _reencode_jpeg(image_path)
        else:
            with open(image_path, "rb") as f:
                image_bytes = f.read()
        caption_ids = tokenizer.encode(item["caption"])
        writer.write(
            serialize_example({"image": image_bytes, "caption": caption_ids})
        )
        written += 1
    if writer is not None:
        writer.close()
    total_shards = shard + (1 if written else 0)
    print(f"wrote {len(items)} examples into {total_shards} shard(s) in {out_dir}")
    return total_shards


def _cli():
    """``python -m dalle_mtf_tpu.data.create_tfrecords <cmd> ...``.

    Replaces the reference's hardwired ``__main__`` (create_tfrecords.py:
    181-184 — a fixed COCO jsonl path) with three subcommands:
      paired  jsonl [{caption, image_path}] -> image+caption tfrecords
      random  fabricate captions over an image glob (smoke datasets)
      encode  image+caption tfrecords -> {tokens, caption} tfrecords via a
              trained VAE (--encode-with <vae_config>) — the offline pass
              behind ``dataset.tokens: true`` (see docs/data.md)
    """
    import argparse

    p = argparse.ArgumentParser(prog="create_tfrecords", description=_cli.__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("paired", help="jsonl -> sharded image tfrecords")
    pp.add_argument("jsonl")
    pp.add_argument("--name", required=True)
    pp.add_argument("--out", required=True)
    pp.add_argument("--examples-per-file", type=int, default=1000)
    pp.add_argument("--reencode", action="store_true")

    pr = sub.add_parser("random", help="fabricate captions over an image glob")
    pr.add_argument("glob")
    pr.add_argument("--out", required=True)

    pe = sub.add_parser("encode", help="images -> VAE token tfrecords")
    pe.add_argument("--input", required=True, help="image tfrecords glob")
    pe.add_argument("--out", required=True)
    pe.add_argument("--name", required=True)
    pe.add_argument(
        "--encode-with", required=True, metavar="VAE_CONFIG",
        help="VAE config name/path; its model_path supplies the checkpoint",
    )
    pe.add_argument(
        "--vae-checkpoint-path", default=None,
        help="override the checkpoint dir (config vae_checkpoint_path analog)",
    )
    pe.add_argument("--batch-size", type=int, default=64)
    pe.add_argument("--examples-per-file", type=int, default=10_000)

    args = p.parse_args()
    if args.cmd == "paired":
        create_paired_dataset(
            args.jsonl, args.name, args.out,
            examples_per_file=args.examples_per_file, reencode=args.reencode,
        )
    elif args.cmd == "random":
        create_random_dataset(args.glob, args.out)
    else:
        from dalle_mtf_tpu.data.encode_dataset import (  # noqa: PLC0415
            encode_with_config,
        )

        encode_with_config(
            args.input, args.out, args.name, args.encode_with,
            vae_checkpoint_path=args.vae_checkpoint_path,
            batch_size=args.batch_size,
            examples_per_file=args.examples_per_file,
        )


if __name__ == "__main__":
    _cli()
