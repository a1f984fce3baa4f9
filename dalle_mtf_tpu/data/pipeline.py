"""Host input pipeline.

Parity with src/input_fns.py: ``vae_input_fn`` reads either TFRecords or a
raw jpg glob, ``dalle_input_fn`` reads image+caption TFRecords; images are
jpeg-decoded, center-cropped to a square, resized, and normalized to [-1, 1]
(input_fns.py:4-21); captions are padded-then-truncated to text_seq_len with
the padding id (:32-38); training shuffles a 5x-batch-size sample buffer and
batches with drop_remainder (:24-29); datasets repeat forever (:104).

Improvements over the reference (intentional, SURVEY.md §7):
- **per-host file sharding** instead of TPUEstimator BROADCAST mode (one
  host's pipeline copied to every worker, train_dalle.py:69) — each process
  reads files[process_index::process_count];
- decode/augment runs in a thread pool with a background prefetch queue, so
  the accelerator never waits on the host (tf.data's AUTOTUNE equivalent);
- the reference's off-center crop bug (crop_and_resize box [y1,x1,wn,hn]
  instead of [.., (1+wn)/2, ..], input_fns.py:10-11) is fixed: we crop the
  true centered square.

Batches are dicts: {"image": f32[B,H,W,C] in [-1,1], "caption": i32[B,T]}.
"""

from __future__ import annotations

import io
import logging
import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator, Mapping

import numpy as np

from dalle_mtf_tpu.data.fs import list_files as fs_list_files
from dalle_mtf_tpu.data.fs import open_file
from dalle_mtf_tpu.data.tfrecord import parse_example
# native streaming reader with built-in pure-Python fallback
from dalle_mtf_tpu.data.native import read_tfrecord_file

logger = logging.getLogger(__name__)

_SKIP_END = object()  # "record stream ended inside the resume prefix"


def list_files(pattern: str) -> list[str]:
    """Glob local paths or remote URLs (gs:// etc. via fsspec — fs.py)."""
    return fs_list_files(pattern)


def to_uint8(img: np.ndarray) -> np.ndarray:
    """Round a fused-normalized f32 image ([-1, 1]) back to uint8 pixels —
    THE quantization of the ``dataset.uint8_images`` transfer mode.

    Single definition on purpose: the documented <=0.5/127.5 per-pixel
    delta contract holds only while the native pool
    (native.decode_pool_samples) and the per-record decode below apply
    bit-identical rounding."""
    return np.clip(np.round(img * 127.5 + 127.5), 0, 255).astype(np.uint8)


def decode_img(
    data: bytes, size: int, channels: int = 3, normalize: bool = True
) -> np.ndarray:
    """jpeg bytes -> f32 [size, size, channels] in [-1, 1].

    Center-square crop + bilinear resize + (x-127.5)/127.5, the *intended*
    behavior of input_fns.py:4-21. Uses the native libjpeg fast path
    (native/dataloader.cpp) when available, PIL otherwise.

    ``normalize=False`` returns uint8 pixels instead (the
    ``dataset.uint8_images`` transfer mode: 4x smaller host->device
    batches; the task normalizes on device with the SAME (x-127.5)/127.5
    expression, so values are bit-identical to the host-normalized path
    for PIL-decoded data — PIL's resize output is uint8 anyway. The
    native decoder's float resize is rounded to the nearest uint8 here,
    a <=0.5/127.5 per-pixel delta vs its fused-normalize form).
    """
    from dalle_mtf_tpu.data import native  # noqa: PLC0415

    out = native.decode_img(data, size, channels)
    if out is not None:
        if not normalize:
            return to_uint8(out)
        return out
    from PIL import Image  # noqa: PLC0415

    img = Image.open(io.BytesIO(data))
    img = img.convert("RGB" if channels == 3 else "L")
    w, h = img.size
    side = min(w, h)
    left, top = (w - side) // 2, (h - side) // 2
    img = img.crop((left, top, left + side, top + side))
    img = img.resize((size, size), Image.BILINEAR)
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if not normalize:
        return arr.astype(np.uint8)
    return (arr.astype(np.float32) - 127.5) / 127.5


class _Pipeline:
    """files -> records -> parallel parse -> shuffle buffer -> batches."""

    def __init__(
        self,
        files: list[str],
        record_iter_fn: Callable[[str], Iterator[Any]],
        parse_fn: Callable[[Any], dict],
        batch_size: int,
        shuffle: bool,
        seed: int = 0,
        num_workers: int = 16,
        prefetch: int = 4,
        repeat: bool = True,
        cycle_length: int = 4,
        native_decode: Mapping[str, Any] | None = None,
        skip_samples: int = 0,
        readahead_depth: int | None = None,
    ):
        if not files:
            raise FileNotFoundError("input pipeline got an empty file list")
        # {"size", "channels", "text_len", "padding_id"}: enables the C++
        # parse+decode pool (native.decode_pool_samples) for the standard
        # tfrecord schema; None keeps the generic parse_fn thread pool
        self.native_decode = dict(native_decode) if native_decode else None
        self.files = list(files)
        self.record_iter_fn = record_iter_fn
        self.parse_fn = parse_fn
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.repeat = repeat
        # parallel_interleave(cycle_length=4) equivalent (reference
        # input_fns.py:87-92): round-robin over N concurrently-open files so
        # a shuffle window sees examples from several shards, not one
        self.cycle_length = max(1, cycle_length)
        # per-shard remote readahead window (records buffered ahead by
        # prefetch_iter per open remote stream). None -> env
        # DALLE_TPU_READAHEAD_DEPTH or 64; see docs/data.md "Tuning
        # remote reads" for sizing guidance.
        if readahead_depth is None:
            import os  # noqa: PLC0415

            readahead_depth = int(
                os.environ.get("DALLE_TPU_READAHEAD_DEPTH", "64")
            )
        self.readahead_depth = max(1, int(readahead_depth))
        # deterministic resume: reproduce the stream from sample position
        # skip_samples onward without decoding the prefix (see _shuffled)
        self.skip_samples = max(0, int(skip_samples))
        if self.skip_samples and shuffle and not repeat:
            # _resume_plan replays an unbounded stream; a finite shuffled
            # stream ends in a drain phase (rng.shuffle of the residue)
            # whose replay would need the true record count up front —
            # refuse rather than silently diverge near the tail
            raise ValueError(
                "resume skip on a shuffled stream requires repeat=True"
            )

    def _interleaved(self, files: list[str]) -> Iterator[Any]:
        """Round-robin one record at a time across cycle_length open files;
        an exhausted file is replaced by the next unopened one.

        TFRecord sources over local files take the io_uring fast path
        (native.read_interleaved — every stream's chunk reads in flight
        concurrently on one ring, byte-identical record order); anything
        else (remote paths, jpg-glob readers) interleaves in Python."""
        if self.record_iter_fn is read_tfrecord_file:
            from dalle_mtf_tpu.data import native  # noqa: PLC0415

            g = native.read_interleaved(files, cycle=self.cycle_length)
            if g is not None:
                yield from g
                return
        from collections import deque  # noqa: PLC0415

        from dalle_mtf_tpu.data.fs import is_remote  # noqa: PLC0415
        from dalle_mtf_tpu.data.readahead import prefetch_iter  # noqa: PLC0415

        file_iter = iter(files)
        active: deque = deque()

        def refill() -> None:
            for f in file_iter:
                it = self.record_iter_fn(f)
                if is_remote(f):
                    # remote shards: overlap backend fetches across all
                    # open streams (tf.data parallel_interleave's per-shard
                    # pipelining, input_fns.py:85-104); order unchanged
                    it = prefetch_iter(it, depth=self.readahead_depth)
                active.append(it)
                return

        while len(active) < self.cycle_length:
            n = len(active)
            refill()
            if len(active) == n:
                break
        while active:
            it = active[0]
            try:
                rec = next(it)
            except StopIteration:
                active.popleft()
                refill()
                continue
            yield rec
            active.rotate(-1)

    def _records(self) -> Iterator[Any]:
        rng = random.Random(self.seed)
        files = list(self.files)
        if self.shuffle:
            rng.shuffle(files)  # reshuffle_each_iteration=False (input_fns.py:82)
        while True:
            if self.cycle_length > 1 and len(files) > 1:
                yield from self._interleaved(files)
            else:
                for f in files:
                    yield from self.record_iter_fn(f)
            if not self.repeat:
                return

    def _samples(self, records: Iterator[Any] | None = None) -> Iterator[dict]:
        """Parallel parse with bounded in-flight window (keeps order cheap).

        Standard tfrecord samples take the C++ parse+decode pool (proto walk
        + fused jpeg decode off the GIL entirely); otherwise a Python thread
        pool around parse_fn (the decode C call still drops the GIL)."""
        if records is None:
            records = self._records()
        if self.native_decode is not None:
            from dalle_mtf_tpu.data import native  # noqa: PLC0415

            g = native.decode_pool_samples(
                records, workers=self.num_workers,
                **self.native_decode,
            )
            if g is not None:
                yield from g
                return
        with ThreadPoolExecutor(self.num_workers) as pool:
            in_flight: queue.Queue = queue.Queue()
            try:
                for _ in range(self.num_workers * 2):
                    in_flight.put(pool.submit(self.parse_fn, next(records)))
            except StopIteration:
                pass
            while not in_flight.empty():
                fut = in_flight.get()
                try:
                    in_flight.put(pool.submit(self.parse_fn, next(records)))
                except StopIteration:
                    pass
                sample = fut.result()
                if sample is not None:
                    yield sample

    def _resume_plan(
        self, n: int, buf_size: int, rng: random.Random
    ) -> tuple[list[int], int]:
        """Replay the shuffle arithmetic on record INDICES to find the state
        after ``n`` yields: returns (buffer contents as record indices, in
        list order; total records consumed). The sample-shuffle's decisions
        depend only on the rng stream and element counts — never on sample
        contents — so the prefix can be replayed without touching a byte of
        data. ``rng`` is advanced in place to the post-prefix state."""
        buf: list[int] = []
        idx = 0
        yielded = 0
        while yielded < n:
            buf.append(idx)
            idx += 1
            if len(buf) >= buf_size:
                i = rng.randrange(len(buf))
                buf[i], buf[-1] = buf[-1], buf[i]
                buf.pop()
                yielded += 1
        return buf, idx

    def _records_skipping(
        self, keep: set[int], consumed: int
    ) -> Iterator[Any]:
        """The record stream minus the already-yielded prefix: records with
        index < ``consumed`` are skipped (I/O only — no parse, no jpeg
        decode) unless their index is in ``keep`` (the shuffle buffer's
        surviving contents, <= 5x batch of them)."""
        for i, rec in enumerate(self._records()):
            if i >= consumed or i in keep:
                yield rec

    def _shuffled(self) -> Iterator[dict]:
        """Shuffle-buffer sample stream; on resume (skip_samples > 0) it
        reproduces the stream from that position EXACTLY.

        The reference restarted its tf.data pipeline from scratch on every
        crash-resume (same seed -> the model re-trains on the stream's
        prefix; input_fns.py has no iterator state). Here resume replays the
        shuffle decisions on indices (_resume_plan), skips the prefix's
        records at the raw-record level, decodes only the <= 5x-batch
        records still sitting in the shuffle buffer, and continues with the
        advanced rng — byte-identical to an uninterrupted run, at I/O cost
        only. (Exactness assumes records parse 1:1 to samples; a corrupt
        record that parse_fn drops shifts alignment by one.)"""
        if not self.shuffle:
            records = self._records()
            if self.skip_samples:
                for _ in range(self.skip_samples):
                    if next(records, _SKIP_END) is _SKIP_END:
                        return
            yield from self._samples(records)
            return
        buf_size = self.batch_size * 5  # configure_for_performance (:26)
        rng = random.Random(self.seed + 1)
        buf: list = []
        if self.skip_samples:
            buf_idx, consumed = self._resume_plan(
                self.skip_samples, buf_size, rng
            )
            logger.info(
                "data resume: skipping %d samples (%d records read-through, "
                "%d shuffle-buffer residents re-decoded)",
                self.skip_samples, consumed, len(buf_idx),
            )
            samples = self._samples(
                self._records_skipping(set(buf_idx), consumed)
            )
            # the first len(buf_idx) surviving samples arrive in record
            # order; the buffer's list order is the swap-permuted one
            arrived = {}
            try:
                for i in sorted(buf_idx):
                    arrived[i] = next(samples)
            except StopIteration:
                return  # stream shorter than the resume point
            buf = [arrived[i] for i in buf_idx]
        else:
            samples = self._samples()
        for sample in samples:
            buf.append(sample)
            if len(buf) >= buf_size:
                i = rng.randrange(len(buf))
                buf[i], buf[-1] = buf[-1], buf[i]
                yield buf.pop()
        rng.shuffle(buf)
        yield from buf

    def _batches(self) -> Iterator[dict]:
        batch: list = []
        for sample in self._shuffled():
            batch.append(sample)
            if len(batch) == self.batch_size:
                keys = batch[0].keys()
                yield {k: np.stack([s[k] for s in batch]) for k in keys}
                batch = []
        # drop_remainder=True (input_fns.py:27)

    def __iter__(self) -> Iterator[dict]:
        """Batches, prefetched on a background thread.

        Closing/abandoning the iterator (generator GC -> GeneratorExit)
        stops the producer, which in turn releases everything it holds —
        shuffle buffer, thread/decode pool, open shards. Without that, a
        caller who pulls one batch and drops the iterator (e.g. a summary
        batch) would pin ~5x-batch decoded images and a 16-thread pool for
        the life of the process. Producer exceptions propagate to the
        consumer instead of silently ending the stream."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for b in self._batches():
                    if not _put(b):
                        return
                _put(sentinel)
            except BaseException as e:  # surface in the consumer
                _put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def _resolve_shard(shard: tuple[int, int] | None) -> tuple[int, int]:
    if shard is not None:
        return shard
    try:
        import jax  # noqa: PLC0415

        return (jax.process_index(), jax.process_count())
    except Exception:  # pragma: no cover
        return (0, 1)


def _shard_files(files: list[str], shard: tuple[int, int]) -> list[str]:
    index, count = shard
    if count > 1:
        sharded = files[index::count]
        return sharded if sharded else files  # fewer files than hosts
    return files


def _host_batch(global_batch: int, shard: tuple[int, int]) -> int:
    """Per-host batch: each process feeds only its own devices' rows.

    The reference broadcast one host's full-batch pipeline to all workers
    (train_dalle.py:69); here every host decodes 1/process_count of the
    global batch and the trainer assembles the global array
    (jax.make_array_from_process_local_data).
    """
    count = shard[1]
    if global_batch % count != 0:
        raise ValueError(
            f"global batch {global_batch} must divide by process count {count}"
        )
    return global_batch // count


def vae_input_fn(
    params: Mapping[str, Any],
    eval: bool = False,
    shard: tuple[int, int] | None = None,
    repeat: bool = True,
    skip_steps: int = 0,
) -> _Pipeline:
    """Image batches for VAE training (input_fns.py:69-104).

    tfrecords mode when dataset.tfrecords is set, else a raw jpg glob.
    ``skip_steps``: resume point — skip that many already-trained batches
    of this host's stream without decoding them (exact; see
    _Pipeline._shuffled).
    """
    ds = params["dataset"]
    path = ds["eval_path"] if eval else ds["train_path"]
    size = ds["image_size"]
    channels = params.get("n_channels") or 3
    shard = _resolve_shard(shard)
    batch = _host_batch(params["eval_batch_size" if eval else "train_batch_size"], shard)
    files = _shard_files(list_files(path), shard)
    skip = skip_steps * batch

    normalize = not ds.get("uint8_images")
    if ds.get("tfrecords"):
        def parse(record: bytes) -> dict:
            ex = parse_example(record)
            return {"image": decode_img(ex["image"][0], size, channels,
                                        normalize=normalize)}

        return _Pipeline(
            files, read_tfrecord_file, parse, batch,
            shuffle=not eval, repeat=repeat, skip_samples=skip,
            # uint8 transfer mode keeps the native C++ pool: its fused-
            # normalized f32 output is rounded back to uint8 (documented
            # <=0.5/127.5 delta) so the 2x decode throughput and the 4x
            # smaller H2D transfer compose
            native_decode={
                "size": size, "channels": channels,
                "text_len": 0, "padding_id": 0,
                "uint8_out": not normalize,
            },
            cycle_length=ds.get("cycle_length") or 4,
            readahead_depth=ds.get("readahead_depth"),
        )

    def read_file(path_: str):
        yield path_

    def parse_path(path_: str) -> dict:
        with open_file(path_, "rb") as f:
            return {"image": decode_img(f.read(), size, channels,
                                        normalize=normalize)}

    return _Pipeline(
        files, read_file, parse_path, batch, shuffle=not eval, repeat=repeat,
        skip_samples=skip,
        cycle_length=ds.get("cycle_length") or 4,
        readahead_depth=ds.get("readahead_depth"),
    )


def dalle_input_fn(
    params: Mapping[str, Any],
    eval: bool = False,
    shard: tuple[int, int] | None = None,
    repeat: bool = True,
    skip_steps: int = 0,
) -> _Pipeline:
    """(image, caption) batches for DALLE training (input_fns.py:106-120).

    ``skip_steps``: resume point — skip that many already-trained batches
    without decoding them (exact; see _Pipeline._shuffled).

    Pre-tokenized mode (``dataset.tokens: true``): records carry
    ``{tokens: int64 list, caption: int64 list}`` written by the offline
    VAE-encode pass (data/encode_dataset.py) and batches are
    ``{"tokens": i32[B, image_seq_len], "caption": i32[B, T]}`` — no jpeg
    decode, no per-step VAE forward in the trainer."""
    ds = params["dataset"]
    path = ds["eval_path"] if eval else ds["train_path"]
    shard = _resolve_shard(shard)
    batch = _host_batch(params["eval_batch_size" if eval else "train_batch_size"], shard)
    text_seq_len = params["text_seq_len"]
    padding_id = params.get("padding_id")
    if padding_id is None:
        padding_id = 50257
    files = _shard_files(list_files(path), shard)

    def _caption(ex: dict) -> np.ndarray:
        caption = list(ex.get("caption", []))
        caption = (caption + [padding_id] * text_seq_len)[:text_seq_len]
        return np.asarray(caption, np.int32)

    if ds.get("tokens"):
        def parse_tokens(record: bytes) -> dict:
            ex = parse_example(record)
            return {
                "tokens": np.asarray(ex["tokens"], np.int32),
                "caption": _caption(ex),
            }

        return _Pipeline(
            files, read_tfrecord_file, parse_tokens, batch,
            shuffle=not eval, repeat=repeat,
            skip_samples=skip_steps * batch,
            cycle_length=ds.get("cycle_length") or 4,
            readahead_depth=ds.get("readahead_depth"),
        )

    size = ds["image_size"]
    channels = params.get("n_channels") or 3
    normalize = not ds.get("uint8_images")

    def parse(record: bytes) -> dict:
        ex = parse_example(record)
        return {
            "image": decode_img(ex["image"][0], size, channels,
                                normalize=normalize),
            "caption": _caption(ex),
        }

    return _Pipeline(
        files, read_tfrecord_file, parse, batch, shuffle=not eval, repeat=repeat,
        skip_samples=skip_steps * batch,
        # (see vae_input_fn: uint8 transfer mode keeps the native pool,
        # rounding its f32 output back to uint8)
        native_decode={
            "size": size, "channels": channels,
            "text_len": text_seq_len, "padding_id": padding_id,
            "uint8_out": not normalize,
        },
        cycle_length=ds.get("cycle_length") or 4,
        readahead_depth=ds.get("readahead_depth"),
    )
