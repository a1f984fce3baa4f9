"""Offline image→token encoding: run the frozen stage-1 VAE over an
image+caption TFRecord dataset ONCE and write {tokens, caption} records.

The reference re-encodes every training image through the frozen VAE on
every step, forever (model_fns.py:72-77) — the in-graph path our
tasks.py::make_dalle_task mirrors for parity. This pass trades one offline
sweep for that per-step forward: training then reads token records
(``dataset.tokens: true`` — data/pipeline.py::dalle_input_fn) and the DALLE
step touches no pixels at all.

Captions are copied VERBATIM (the raw unpadded id list from the source
record), and tokens are the same ``encode_tokens`` argmax the in-graph path
computes, so a tokens-mode batch reproduces the in-graph batch exactly —
tests/test_data.py asserts loss equality between the two modes.

CLI: ``python -m dalle_mtf_tpu.data.create_tfrecords encode
--encode-with <vae_config> --input '<glob>' --out <dir> --name <name>``.
"""

from __future__ import annotations

import logging
from typing import Iterator

import numpy as np

logger = logging.getLogger(__name__)


def _image_caption_records(files: list[str]) -> Iterator[dict]:
    from dalle_mtf_tpu.data.tfrecord import parse_example, read_tfrecord_file

    for f in files:
        for rec in read_tfrecord_file(f):
            yield parse_example(rec)


def encode_dataset(
    input_glob: str,
    out_dir: str,
    name: str,
    vae,
    vae_params,
    image_size: int,
    channels: int = 3,
    batch_size: int = 64,
    examples_per_file: int = 10_000,
) -> int:
    """Encode every record of ``input_glob`` through ``vae`` and write
    sharded ``<name>_N.tfrecords`` of {tokens, caption} to ``out_dir``.

    Record order is preserved (no shuffle — train-time shuffling is the
    loader's job, same as the image pipeline). The final partial batch is
    padded up to ``batch_size`` for the device call and trimmed after, so
    one compiled executable serves the whole sweep. Returns shard count.
    """
    import jax

    from dalle_mtf_tpu.data import fs
    from dalle_mtf_tpu.data.pipeline import decode_img
    from dalle_mtf_tpu.data.tfrecord import TFRecordWriter, serialize_example

    files = fs.list_files(input_glob)
    if not files:
        raise FileNotFoundError(f"no input files match {input_glob!r}")
    fs.makedirs(out_dir)

    def shard_path(i: int) -> str:
        return f"{str(out_dir).rstrip('/')}/{name}_{i}.tfrecords"

    encode = jax.jit(vae.encode_tokens)

    writer = None
    shard = 0
    written = 0
    total = 0
    images: list[np.ndarray] = []
    captions: list[list[int]] = []

    def flush():
        nonlocal writer, shard, written, total
        if not images:
            return
        n = len(images)
        batch = np.stack(images)
        if n < batch_size:  # pad to the compiled batch shape, trim below
            batch = np.concatenate(
                [batch, np.repeat(batch[-1:], batch_size - n, axis=0)]
            )
        tokens = np.asarray(jax.device_get(encode(vae_params, batch)))[:n]
        for t, cap in zip(tokens, captions):
            if writer is None or written >= examples_per_file:
                if writer is not None:
                    writer.close()
                    shard += 1
                writer = TFRecordWriter(shard_path(shard))
                written = 0
            writer.write(
                serialize_example({"tokens": t.tolist(), "caption": cap})
            )
            written += 1
            total += 1
        images.clear()
        captions.clear()

    for ex in _image_caption_records(files):
        images.append(decode_img(ex["image"][0], image_size, channels))
        captions.append([int(c) for c in ex.get("caption", [])])
        if len(images) == batch_size:
            flush()
    flush()
    if writer is not None:
        writer.close()
    shards = shard + (1 if written else 0)
    logger.info(
        "encoded %d examples (%d tokens each) into %d shard(s) in %s",
        total, int(vae.cfg.image_seq_len), shards, out_dir,
    )
    return shards


def encode_with_config(
    input_glob: str,
    out_dir: str,
    name: str,
    vae_config: str,
    vae_checkpoint_path: str | None = None,
    batch_size: int = 64,
    examples_per_file: int = 10_000,
) -> int:
    """CLI form: resolve the VAE config + latest checkpoint, then encode."""
    from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig
    from dalle_mtf_tpu.utils.config import fetch_model_params
    from dalle_mtf_tpu.utils.restore import restore_vae_params

    vparams = fetch_model_params(vae_config)
    vae = DiscreteVAE(VAEConfig.from_params(vparams))
    vae_params = restore_vae_params(
        vae, vae_checkpoint_path or vparams["model_path"]
    )
    ds = vparams["dataset"] or {}
    return encode_dataset(
        input_glob, out_dir, name, vae, vae_params,
        image_size=ds["image_size"],
        channels=vparams.get("n_channels") or 3,
        batch_size=batch_size,
        examples_per_file=examples_per_file,
    )
