import io
import os

import numpy as np
import pytest

from dalle_mtf_tpu.data.create_tfrecords import (
    create_paired_dataset,
    create_random_dataset,
    dump_jsonl,
    load_jsonl,
)
from dalle_mtf_tpu.data.pipeline import dalle_input_fn, decode_img, vae_input_fn
from dalle_mtf_tpu.data.tfrecord import (
    TFRecordWriter,
    crc32c,
    parse_example,
    read_tfrecord_file,
    serialize_example,
)
from dalle_mtf_tpu.data.tokenizer import ByteTokenizer, get_tokenizer, pad_or_truncate
from dalle_mtf_tpu.utils.config import Config


def _jpeg_bytes(w=64, h=48, color=(255, 0, 0)):
    from PIL import Image

    img = Image.new("RGB", (w, h), color)
    buf = io.BytesIO()
    img.save(buf, "JPEG")
    return buf.getvalue()


class TestCRC32C:
    def test_known_vectors(self):
        # RFC 3720 test vectors
        assert crc32c(b"") == 0x0
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(bytes(32)) == 0x8A9136AA


class TestExampleCodec:
    def test_roundtrip(self):
        ex = serialize_example(
            {"image": b"\x00\x01jpegdata", "caption": [1, 50257, 1234567890, 0]}
        )
        out = parse_example(ex)
        assert out["image"][0] == b"\x00\x01jpegdata"
        assert out["caption"] == [1, 50257, 1234567890, 0]

    def test_interop_with_tensorflow(self):
        """Our hand-rolled proto bytes must parse with TF, and vice versa."""
        tf = pytest.importorskip("tensorflow")
        ours = serialize_example({"image": b"imgbytes", "caption": [3, 1, 2]})
        ex = tf.train.Example.FromString(ours)
        assert ex.features.feature["image"].bytes_list.value[0] == b"imgbytes"
        assert list(ex.features.feature["caption"].int64_list.value) == [3, 1, 2]

        theirs = tf.train.Example(
            features=tf.train.Features(
                feature={
                    "image": tf.train.Feature(
                        bytes_list=tf.train.BytesList(value=[b"xyz"])
                    ),
                    "caption": tf.train.Feature(
                        int64_list=tf.train.Int64List(value=[7, 8])
                    ),
                }
            )
        ).SerializeToString()
        out = parse_example(theirs)
        assert out["image"][0] == b"xyz"
        assert out["caption"] == [7, 8]


class TestTFRecordFraming:
    def test_roundtrip_with_crc(self, tmp_path):
        path = str(tmp_path / "a.tfrecords")
        with TFRecordWriter(path) as w:
            w.write(b"rec one")
            w.write(b"rec two, longer" * 100)
        recs = list(read_tfrecord_file(path, verify_crc=True))
        assert recs[0] == b"rec one"
        assert recs[1] == b"rec two, longer" * 100

    def test_interop_with_tf_data(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        path = str(tmp_path / "b.tfrecords")
        with TFRecordWriter(path) as w:
            w.write(b"hello tfrecord")
        got = [r.numpy() for r in tf.data.TFRecordDataset(path)]
        assert got == [b"hello tfrecord"]
        # and read TF-written files
        path2 = str(tmp_path / "c.tfrecords")
        with tf.io.TFRecordWriter(path2) as w:
            w.write(b"written by tf")
        assert list(read_tfrecord_file(path2, verify_crc=True)) == [b"written by tf"]


class TestTokenizer:
    def test_byte_fallback(self):
        tok = ByteTokenizer()
        assert len(tok) == 50258
        assert tok.pad_token_id == 50257
        ids = tok.encode("hi")
        assert ids == [104, 105]
        assert tok.decode(ids) == "hi"

    def test_get_tokenizer_has_padding(self):
        tok = get_tokenizer()
        assert len(tok) == 50258
        assert tok.pad_token_id == 50257

    def test_pad_or_truncate(self):
        assert pad_or_truncate([1, 2], 4, 9) == [1, 2, 9, 9]
        assert pad_or_truncate([1, 2, 3, 4, 5], 3, 9) == [1, 2, 3]


class TestDecodeImg:
    def test_center_crop_and_range(self):
        arr = decode_img(_jpeg_bytes(64, 48), size=32)
        assert arr.shape == (32, 32, 3)
        assert arr.min() >= -1.0 and arr.max() <= 1.0
        # red image: channel 0 near +1, channels 1,2 near -1
        assert arr[..., 0].mean() > 0.9
        assert arr[..., 1].mean() < -0.8


def _make_dataset(tmp_path, n=12):
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    from PIL import Image

    rng = np.random.RandomState(0)
    for i in range(n):
        arr = rng.randint(0, 255, (48, 64, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"img_{i}.jpg")
    return img_dir


class TestBuilders:
    def test_random_then_paired_then_load(self, tmp_path):
        img_dir = _make_dataset(tmp_path)
        data_dir = tmp_path / "data"
        jsonl = create_random_dataset(
            str(img_dir / "*.jpg"), str(data_dir), words_per_caption=5
        )
        assert len(load_jsonl(jsonl)) == 12
        shards = create_paired_dataset(
            jsonl, "smoke", str(tmp_path / "records"),
            examples_per_file=5, tokenizer=ByteTokenizer(),
        )
        assert shards == 3  # 12 examples / 5 per file — rollover bug fixed
        files = sorted(os.listdir(tmp_path / "records"))
        assert files == ["smoke_0.tfrecords", "smoke_1.tfrecords", "smoke_2.tfrecords"]
        total = sum(
            1
            for f in files
            for _ in read_tfrecord_file(str(tmp_path / "records" / f))
        )
        assert total == 12

    def test_full_caption_tokenized(self, tmp_path):
        """The reference tokenized caption[0] (first char); we must not."""
        img_dir = _make_dataset(tmp_path, n=1)
        jsonl = tmp_path / "c.jsonl"
        dump_jsonl(
            [{"caption": "hello world", "image_path": f"imgs/img_0.jpg"}],
            jsonl,
        )
        # builder resolves image_path relative to the jsonl's dir
        create_paired_dataset(
            str(jsonl), "x", str(tmp_path / "rec"), tokenizer=ByteTokenizer()
        )
        rec = next(read_tfrecord_file(str(tmp_path / "rec" / "x_0.tfrecords")))
        ex = parse_example(rec)
        assert len(ex["caption"]) == len("hello world")


class TestPipelines:
    def test_vae_jpg_glob_pipeline(self, tmp_path):
        img_dir = _make_dataset(tmp_path)
        params = Config.from_mapping(
            {
                "dataset": {"train_path": str(img_dir / "*.jpg"), "image_size": 16},
                "train_batch_size": 4,
                "n_channels": 3,
            }
        )
        it = iter(vae_input_fn(params, shard=(0, 1)))
        batch = next(it)
        assert batch["image"].shape == (4, 16, 16, 3)
        assert batch["image"].dtype == np.float32

    def test_dalle_tfrecord_pipeline(self, tmp_path):
        img_dir = _make_dataset(tmp_path)
        jsonl = create_random_dataset(
            str(img_dir / "*.jpg"), str(tmp_path / "d"), words_per_caption=4
        )
        create_paired_dataset(
            jsonl, "t", str(tmp_path / "rec"), tokenizer=ByteTokenizer()
        )
        params = Config.from_mapping(
            {
                "dataset": {
                    "train_path": str(tmp_path / "rec" / "*.tfrecords"),
                    "image_size": 16,
                },
                "train_batch_size": 4,
                "text_seq_len": 8,
                "padding_id": 50257,
            }
        )
        it = iter(dalle_input_fn(params, shard=(0, 1)))
        batch = next(it)
        assert batch["image"].shape == (4, 16, 16, 3)
        assert batch["caption"].shape == (4, 8)
        assert batch["caption"].dtype == np.int32

    def test_drop_remainder_and_repeat(self, tmp_path):
        img_dir = _make_dataset(tmp_path, n=5)
        params = Config.from_mapping(
            {
                "dataset": {"train_path": str(img_dir / "*.jpg"), "image_size": 8},
                "train_batch_size": 4,
            }
        )
        # non-repeating: 5 images -> exactly 1 batch of 4 (remainder dropped)
        batches = list(vae_input_fn(params, shard=(0, 1), repeat=False))
        assert len(batches) == 1
        # repeating: can pull more batches than one epoch provides
        it = iter(vae_input_fn(params, shard=(0, 1), repeat=True))
        for _ in range(3):
            assert next(it)["image"].shape[0] == 4

    def test_host_sharding_partitions_files(self, tmp_path):
        img_dir = _make_dataset(tmp_path, n=8)
        params = Config.from_mapping(
            {
                "dataset": {"train_path": str(img_dir / "*.jpg"), "image_size": 8},
                "train_batch_size": 2,
            }
        )
        p0 = vae_input_fn(params, shard=(0, 2), repeat=False)
        p1 = vae_input_fn(params, shard=(1, 2), repeat=False)
        assert set(p0.files).isdisjoint(p1.files)
        assert len(p0.files) + len(p1.files) == 8


class TestRealGPT2Path:
    """Pin the real (non-fallback) GPT2TokenizerFast path with a miniature
    GPT-2-format vocab — the zero-egress environment can never download the
    full vocab, so every e2e run exercises only the byte fallback; this test
    runs the actual HF BPE machinery + our special-token addition."""

    @pytest.fixture()
    def mini_gpt2_dir(self, tmp_path):
        import json as _json

        from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

        base = list(bytes_to_unicode().values())  # the 256 byte-level symbols
        vocab = {tok: i for i, tok in enumerate(base)}
        for merged in ("he", "the", "Ġthe"):  # Ġthe
            vocab[merged] = len(vocab)
        # like the real vocab, <|endoftext|> is the last base entry (50256
        # in production); without it the fast-tokenizer conversion appends
        # it itself and shifts the pad slot
        vocab["<|endoftext|>"] = len(vocab)
        merges = ["h e", "t he", "Ġ the"]
        d = tmp_path / "mini_gpt2"
        d.mkdir()
        (d / "vocab.json").write_text(_json.dumps(vocab))
        (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
        return str(d), len(vocab)

    def test_real_tokenizer_pads_and_merges(self, mini_gpt2_dir):
        path, base_vocab = mini_gpt2_dir
        tok = get_tokenizer(path)
        assert not tok.is_fallback, "real GPT-2 path did not load"
        # <|padding|> appended after the base vocab — same slot arithmetic
        # that makes the production tokenizer 50258 with pad at 50257
        # (reference tokenizer_utils.py:4-16)
        assert tok.pad_token == "<|padding|>"
        assert tok.pad_token_id == base_vocab
        assert len(tok) == base_vocab + 1
        # BPE merges actually apply: "the" merges to one token, " the"
        # merges through the Ġ space convention
        the, g_the = tok.convert_tokens_to_ids("the"), tok.convert_tokens_to_ids("Ġthe")
        assert tok.encode("the the") == [the, g_the]
        assert tok.decode([the, g_the]) == "the the"
        ids = pad_or_truncate(tok.encode("the"), 4, tok.pad_token_id)
        assert ids == [the] + [tok.pad_token_id] * 3


class TestRemoteFilesystem:
    """The gs:// capability, exercised via fsspec's memory:// backend — the
    code path (fs.open_file/list_files -> python record reader over an
    fsspec stream) is identical to GCS modulo the backend. The reference
    streamed TFRecords straight off gs:// through tf.data
    (input_fns.py:85-104)."""

    def _write_remote_records(self, n_files=3, per_file=4, size=8):
        import fsspec

        fs = fsspec.filesystem("memory")
        if fs.exists("/tfr"):
            fs.rm("/tfr", recursive=True)
        jpg = _jpeg_bytes(size, size)
        idx = 0
        for fi in range(n_files):
            with TFRecordWriter(f"memory://tfr/part_{fi}.tfrecords") as w:
                for _ in range(per_file):
                    w.write(serialize_example(
                        {"image": jpg, "caption": [idx, idx + 1]}
                    ))
                    idx += 1
        return idx

    def test_fs_helpers_route_remote(self):
        from dalle_mtf_tpu.data.fs import is_remote, list_files, open_file

        assert is_remote("gs://bucket/x")
        assert is_remote("memory://a/b")
        assert not is_remote("/local/path")
        assert not is_remote("relative/path")
        self._write_remote_records(n_files=2)
        files = list_files("memory://tfr/*.tfrecords")
        assert len(files) == 2 and all(f.startswith("memory://") for f in files)
        with open_file(files[0]) as f:
            assert f.read(8)  # readable stream

    def test_tfrecords_roundtrip_over_remote_fs(self):
        from dalle_mtf_tpu.data.fs import list_files
        from dalle_mtf_tpu.data.native import read_tfrecord_file

        total = self._write_remote_records(n_files=3, per_file=4)
        files = list_files("memory://tfr/*.tfrecords")
        captions = []
        for f in files:
            for rec in read_tfrecord_file(f, verify_crc=True):
                captions.append(parse_example(rec)["caption"][0])
        assert sorted(captions) == list(range(total))

    def test_dalle_pipeline_over_remote_fs(self):
        self._write_remote_records(n_files=3, per_file=8, size=8)
        params = Config.from_mapping({
            "dataset": {"tfrecords": True, "image_size": 8,
                        "train_path": "memory://tfr/*.tfrecords"},
            "train_batch_size": 4,
            "text_seq_len": 4,
            "padding_id": 50257,
        })
        pipe = dalle_input_fn(params, shard=(0, 1))
        it = iter(pipe)
        b = next(it)
        assert b["image"].shape == (4, 8, 8, 3)
        assert b["caption"].shape == (4, 4)
        assert b["caption"].dtype == np.int32


def test_interleaved_reads_mix_files():
    """parallel_interleave(cycle_length) parity: the record stream
    round-robins across open files instead of draining one file at a time
    (reference input_fns.py:87-92)."""
    from dalle_mtf_tpu.data.pipeline import _Pipeline

    files = {"a": [0, 1, 2], "b": [10, 11], "c": [20, 21, 22, 23]}

    p = _Pipeline(
        list(files), lambda f: iter(files[f]), lambda r: {"x": r},
        batch_size=1, shuffle=False, repeat=False, cycle_length=2,
    )
    order = list(p._records())
    # cycle {a, b}: 0,10,1,11,2 -> b done, c joins: 20,21,22,23
    assert order == [0, 10, 1, 11, 2, 20, 21, 22, 23]
    assert sorted(order) == sorted(v for vals in files.values() for v in vals)

    # cycle_length=1 preserves the sequential behavior
    p1 = _Pipeline(
        list(files), lambda f: iter(files[f]), lambda r: {"x": r},
        batch_size=1, shuffle=False, repeat=False, cycle_length=1,
    )
    assert list(p1._records()) == [0, 1, 2, 10, 11, 20, 21, 22, 23]


class TestReadahead:
    """Remote shards stream through a background prefetch thread per open
    stream (data/readahead.py) — tf.data parallel_interleave's per-shard
    pipelining (reference input_fns.py:85-104). Order must be byte-identical
    to the synchronous reader; exceptions must surface at the consumer."""

    def test_prefetch_preserves_order_and_values(self):
        from dalle_mtf_tpu.data.readahead import prefetch_iter

        src = list(range(1000))
        assert list(prefetch_iter(iter(src), depth=7)) == src
        assert list(prefetch_iter(iter([]), depth=4)) == []

    def test_prefetch_propagates_source_exception(self):
        import pytest

        from dalle_mtf_tpu.data.readahead import prefetch_iter

        def bad():
            yield 1
            yield 2
            raise IOError("backend died")

        it = prefetch_iter(bad(), depth=2)
        assert next(it) == 1
        assert next(it) == 2
        with pytest.raises(IOError, match="backend died"):
            next(it)

    def test_prefetch_overlaps_slow_source(self):
        import time as _time

        from dalle_mtf_tpu.data.readahead import prefetch_iter

        def slow():
            for i in range(20):
                _time.sleep(0.005)
                yield i

        # with prefetch, the consumer's own 5 ms/item work overlaps the
        # source's 5 ms/item latency: total ~ max(a, b), not a + b
        it = prefetch_iter(slow(), depth=32)
        t0 = _time.perf_counter()
        out = []
        for x in it:
            _time.sleep(0.005)
            out.append(x)
        dt = _time.perf_counter() - t0
        assert out == list(range(20))
        assert dt < 0.165  # serial would be ~0.20s+

    def test_remote_interleave_matches_synchronous_order(self):
        """The prefetch-wrapped remote interleave yields the exact record
        sequence of the plain Python interleave."""
        import fsspec

        from dalle_mtf_tpu.data.fs import list_files
        from dalle_mtf_tpu.data.pipeline import _Pipeline
        from dalle_mtf_tpu.data.tfrecord import (
            TFRecordWriter, serialize_example,
        )

        fs = fsspec.filesystem("memory")
        if fs.exists("/ra"):
            fs.rm("/ra", recursive=True)
        idx = 0
        for fi in range(5):
            with TFRecordWriter(f"memory://ra/part_{fi}.tfrecords") as w:
                for _ in range(6 + fi):
                    w.write(serialize_example({"caption": [idx]}))
                    idx += 1
        files = list_files("memory://ra/*.tfrecords")

        from dalle_mtf_tpu.data.native import read_tfrecord_file

        def order_with_pipeline():
            p = _Pipeline(
                files, read_tfrecord_file, lambda r: r,
                batch_size=1, shuffle=False, repeat=False, cycle_length=3,
            )
            return [parse_example(r)["caption"][0] for r in p._records()]

        got = order_with_pipeline()

        # plain synchronous round-robin reference
        from collections import deque

        its = deque()
        file_iter = iter(files)
        for _ in range(3):
            its.append(read_tfrecord_file(next(file_iter)))
        want = []
        while its:
            it = its[0]
            try:
                rec = next(it)
            except StopIteration:
                its.popleft()
                nxt = next(file_iter, None)
                if nxt is not None:
                    its.append(read_tfrecord_file(nxt))
                continue
            want.append(parse_example(rec)["caption"][0])
            its.rotate(-1)

        assert got == want
        assert sorted(got) == list(range(idx))


class TestResumeSkip:
    """Deterministic data resume: ``skip_steps=k`` reproduces the batch
    stream from position k exactly — byte-identical to an uninterrupted
    run — while the skipped prefix is never parsed or jpeg-decoded. The
    reference restarted its tf.data pipeline from the top on crash-resume
    (same seed: the model re-trained on the prefix; input_fns.py keeps no
    iterator state)."""

    def _params(self, tmp_path, n=24, batch=4):
        img_dir = _make_dataset(tmp_path, n=n)
        jsonl = create_random_dataset(
            str(img_dir / "*.jpg"), str(tmp_path / "d"), words_per_caption=4
        )
        create_paired_dataset(
            jsonl, "t", str(tmp_path / "rec"),
            examples_per_file=6, tokenizer=ByteTokenizer(),
        )
        return Config.from_mapping(
            {
                "dataset": {
                    "train_path": str(tmp_path / "rec" / "*.tfrecords"),
                    "eval_path": str(tmp_path / "rec" / "*.tfrecords"),
                    "image_size": 8,
                },
                "train_batch_size": batch,
                "eval_batch_size": batch,
                "text_seq_len": 8,
                "padding_id": 50257,
            }
        )

    def test_shuffled_skip_matches_uninterrupted_stream(self, tmp_path):
        params = self._params(tmp_path)
        fresh = iter(dalle_input_fn(params, shard=(0, 1)))
        want = [next(fresh) for _ in range(9)]
        # k=7 skips 28 samples > the 24-record epoch: covers epoch wrap
        for k in (1, 3, 7):
            resumed = iter(dalle_input_fn(params, shard=(0, 1), skip_steps=k))
            for j in range(k, 9):
                got = next(resumed)
                np.testing.assert_array_equal(
                    got["caption"], want[j]["caption"]
                )
                np.testing.assert_array_equal(got["image"], want[j]["image"])

    def test_unshuffled_skip_exact(self, tmp_path):
        params = self._params(tmp_path)
        fresh = iter(dalle_input_fn(params, eval=True, shard=(0, 1)))
        want = [next(fresh) for _ in range(6)]
        resumed = iter(
            dalle_input_fn(params, eval=True, shard=(0, 1), skip_steps=4)
        )
        for j in range(4, 6):
            got = next(resumed)
            np.testing.assert_array_equal(got["caption"], want[j]["caption"])
            np.testing.assert_array_equal(got["image"], want[j]["image"])

    def test_skip_zero_is_identity(self, tmp_path):
        params = self._params(tmp_path)
        a = next(iter(dalle_input_fn(params, shard=(0, 1))))
        b = next(iter(dalle_input_fn(params, shard=(0, 1), skip_steps=0)))
        np.testing.assert_array_equal(a["caption"], b["caption"])


class TestReadaheadTuning:
    """Window-size knobs for remote streams (VERDICT r3 #10): the per-shard
    record window (readahead_depth / DALLE_TPU_READAHEAD_DEPTH) and the
    fsspec block-size hints (DALLE_TPU_GCS_BLOCK_MB / DALLE_TPU_GCS_CACHE).
    Sizing rule (docs/data.md): depth >= burst_latency / per-record time."""

    def test_depth_bounds_producer_runahead(self):
        import time as _time

        from dalle_mtf_tpu.data.readahead import prefetch_iter

        produced = []

        def src():
            for i in range(100):
                produced.append(i)
                yield i

        it = prefetch_iter(src(), depth=8)
        assert next(it) == 0
        # producer should run ahead to ~depth buffered items, then stall
        for _ in range(100):
            if len(produced) >= 9:
                break
            _time.sleep(0.01)
        assert len(produced) >= 9
        _time.sleep(0.1)
        # bounded: 1 consumed + 8 buffered + 1 in-hand at the blocked put
        assert len(produced) <= 11, len(produced)
        del it

    def test_deep_window_absorbs_latency_bursts(self):
        """Latency-injection sizing test: a bursty source (every 8th record
        stalls 80 ms) feeds a steady 4 ms/record consumer. A 1-record
        window stalls the consumer on every burst; a 32-record window hides
        bursts behind buffered records (total ~ producer's own total)."""
        import time as _time

        from dalle_mtf_tpu.data.readahead import prefetch_iter

        def bursty():
            for i in range(24):
                if i % 8 == 7:
                    _time.sleep(0.08)
                yield i

        def consume(depth):
            t0 = _time.perf_counter()
            out = []
            for x in prefetch_iter(bursty(), depth=depth):
                _time.sleep(0.004)
                out.append(x)
            assert out == list(range(24))
            return _time.perf_counter() - t0

        deep = consume(32)
        shallow = consume(1)
        # shallow pays ~3 bursts on top of its own work; deep overlaps all
        # but the final burst. Generous margins for a loaded 1-core host.
        assert deep < shallow + 0.04, (deep, shallow)

    def test_knobs_plumb_from_config(self):
        import fsspec

        from dalle_mtf_tpu.data.pipeline import vae_input_fn
        from dalle_mtf_tpu.data.tfrecord import (
            TFRecordWriter, serialize_example,
        )

        fs = fsspec.filesystem("memory")
        if fs.exists("/knobs"):
            fs.rm("/knobs", recursive=True)
        with TFRecordWriter("memory://knobs/part_0.tfrecords") as w:
            w.write(serialize_example({"caption": [1]}))
        params = {
            "dataset": {
                "train_path": "memory://knobs/*.tfrecords",
                "tfrecords": True,
                "image_size": 8,
                "cycle_length": 7,
                "readahead_depth": 13,
            },
            "train_batch_size": 1,
            "eval_batch_size": 1,
        }
        p = vae_input_fn(params, shard=(0, 1))
        assert p.cycle_length == 7
        assert p.readahead_depth == 13

    def test_depth_env_default(self, monkeypatch):
        from dalle_mtf_tpu.data.pipeline import _Pipeline

        monkeypatch.setenv("DALLE_TPU_READAHEAD_DEPTH", "21")
        p = _Pipeline(
            ["x"], lambda f: iter(()), lambda r: {}, 1, shuffle=False,
        )
        assert p.readahead_depth == 21

    def test_remote_hint_env(self, monkeypatch):
        from dalle_mtf_tpu.data.fs import _remote_read_hints

        monkeypatch.setenv("DALLE_TPU_GCS_BLOCK_MB", "32")
        monkeypatch.setenv("DALLE_TPU_GCS_CACHE", "background")
        cache, block = _remote_read_hints()
        assert cache == "background" and block == 32 << 20


class TestUint8Images:
    """dataset.uint8_images: the loader ships uint8 pixels (4x smaller
    host->device batches) and the task normalizes on device with the SAME
    (x-127.5)/127.5 f32 expression the host path uses — loss must be
    BIT-identical across modes for PIL-decoded data (whose resize output
    is uint8 either way)."""

    def _write_records(self, tmp_path, n=6, size=16):
        rng = np.random.RandomState(0)
        path = str(tmp_path / "imgs_0.tfrecords")
        with TFRecordWriter(path) as w:
            for i in range(n):
                w.write(serialize_example({
                    "image": _jpeg_bytes(size, size, tuple(rng.randint(0, 255, 3))),
                    "caption": list(range(i, i + 3)),
                }))
        return path

    def _params(self, tmp_path, uint8):
        return Config.from_mapping({
            "model_type": "dalle",
            "n_embd": 32, "text_vocab_size": 48, "image_vocab_size": 32,
            "text_seq_len": 8, "n_layers": 1, "n_heads": 2,
            "train_batch_size": 4, "padding_id": 47,
            "vae_params": {"dataset": {"image_size": 16},
                           "num_tokens": 32, "convblocks": [[1, 8], [1, 16]]},
            "dataset": {
                "train_path": str(tmp_path / "*.tfrecords"),
                "image_size": 16,
                "uint8_images": uint8,
            },
        })

    def test_loss_bit_identical_across_transfer_modes(self, tmp_path, monkeypatch):
        import jax

        from dalle_mtf_tpu.data import native
        from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig
        from dalle_mtf_tpu.train.tasks import make_dalle_task

        # pin the PIL decode path: the native decoder's float resize is
        # quantized (documented <=0.5/127.5 delta), PIL's is exact
        monkeypatch.setattr(native, "decode_img", lambda *a, **kw: None)
        monkeypatch.setattr(native, "decode_pool_samples", lambda *a, **kw: None)
        self._write_records(tmp_path)

        p8 = self._params(tmp_path, True)
        p32 = self._params(tmp_path, False)
        b8 = next(iter(dalle_input_fn(p8, shard=(0, 1))))
        b32 = next(iter(dalle_input_fn(p32, shard=(0, 1))))
        assert b8["image"].dtype == np.uint8
        assert b32["image"].dtype == np.float32
        # identical pixels up to the exact normalize expression
        np.testing.assert_array_equal(
            (b8["image"].astype(np.float32) - 127.5) / 127.5, b32["image"]
        )

        vae_cfg = VAEConfig.from_params(p8["vae_params"])
        vae_params = DiscreteVAE(vae_cfg).init(jax.random.PRNGKey(7))
        dalle, _v, _init, loss_fn, _ev, _ax = make_dalle_task(p32)
        dp = dalle.init(jax.random.PRNGKey(0))
        rng = jax.random.PRNGKey(3)
        l8, _ = loss_fn(dp, vae_params, b8, rng, np.int32(0))
        l32, _ = loss_fn(dp, vae_params, b32, rng, np.int32(0))
        assert float(l8) == float(l32)

    def test_vae_task_accepts_uint8(self, tmp_path, monkeypatch):
        import jax

        from dalle_mtf_tpu.data import native
        from dalle_mtf_tpu.train.tasks import make_vae_task

        monkeypatch.setattr(native, "decode_img", lambda *a, **kw: None)
        monkeypatch.setattr(native, "decode_pool_samples", lambda *a, **kw: None)
        self._write_records(tmp_path)
        p = Config.from_mapping({
            "model_type": "vae", "num_tokens": 32,
            "convblocks": [[1, 8], [1, 16]],
            "train_batch_size": 4, "eval_batch_size": 4,
            "dataset": {"train_path": str(tmp_path / "*.tfrecords"),
                        "eval_path": str(tmp_path / "*.tfrecords"),
                        "image_size": 16, "tfrecords": True,
                        "uint8_images": True},
        })
        batch = next(iter(vae_input_fn(p, shard=(0, 1))))
        assert batch["image"].dtype == np.uint8
        vae, init_fn, train_loss, eval_loss, _ = make_vae_task(p)
        vp = init_fn(jax.random.PRNGKey(0))
        loss, _ = train_loss(vp, None, batch, jax.random.PRNGKey(1), np.int32(0))
        assert np.isfinite(float(loss))
        _loss, metrics = eval_loss(vp, None, batch, jax.random.PRNGKey(2), np.int32(0))
        assert np.isfinite(float(metrics["psnr"]))

    def test_vae_summary_batch_normalized(self):
        """train_vae's checkpoint image summaries bypass the task's
        on-device normalize, so the driver must host-normalize uint8
        summary batches with the identical expression (and pass f32
        batches through untouched)."""
        from train_vae import _normalize_summary_batch

        u8 = np.arange(48, dtype=np.uint8).reshape(1, 4, 4, 3)
        out = _normalize_summary_batch({"image": u8})
        np.testing.assert_array_equal(
            out["image"], (u8.astype(np.float32) - 127.5) / 127.5
        )
        assert out["image"].dtype == np.float32
        f32 = (u8.astype(np.float32) - 127.5) / 127.5
        same = _normalize_summary_batch({"image": f32})
        assert same["image"] is f32
