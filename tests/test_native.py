"""Native (C++) data-path parity tests: results must match the pure-Python
implementations exactly (tfrecord/crc) or closely (jpeg resize)."""

import io

import numpy as np
import pytest

from dalle_mtf_tpu.data import native
from dalle_mtf_tpu.data import tfrecord as pytfr

requires_native = pytest.mark.skipif(
    not native.available(), reason="native dataloader unavailable (no g++/libjpeg)"
)


@requires_native
def test_crc32c_matches_python():
    for data in [b"", b"123456789", bytes(32), bytes(range(256)) * 33]:
        assert native.crc32c(data) == pytfr.crc32c(data)
    assert native.crc32c(b"123456789") == 0xE3069283


@requires_native
def test_native_tfrecord_reader_matches_python(tmp_path):
    path = str(tmp_path / "x.tfrecords")
    records = [b"a" * n for n in (1, 100, 65536)] + [b"last"]
    with pytfr.TFRecordWriter(path) as w:
        for r in records:
            w.write(r)
    got_native = list(native.read_tfrecord_file(path, verify_crc=True))
    got_py = list(pytfr.read_tfrecord_file(path, verify_crc=True))
    assert got_native == got_py == records


@requires_native
def test_native_reader_rejects_corruption(tmp_path):
    path = str(tmp_path / "c.tfrecords")
    with pytfr.TFRecordWriter(path) as w:
        w.write(b"payload payload payload")
    raw = bytearray(open(path, "rb").read())
    raw[14] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        list(native.read_tfrecord_file(path, verify_crc=True))


@requires_native
def test_native_jpeg_decode_close_to_pil():
    from PIL import Image

    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (48, 64, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=95)
    data = buf.getvalue()

    out = native.decode_img(data, 32, 3)
    assert out is not None
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0

    # reference: decode with PIL (bit-exact vs libjpeg), center crop, then
    # *plain* bilinear in numpy — the same resampling tf.image.crop_and_resize
    # used (input_fns.py:9-11). PIL's BILINEAR antialiases on downscale, so it
    # is intentionally not the comparison target.
    img = Image.open(io.BytesIO(data)).convert("RGB")
    w, h = img.size
    side = min(w, h)
    crop = np.asarray(
        img.crop(((w - side) // 2, (h - side) // 2,
                  (w - side) // 2 + side, (h - side) // 2 + side)),
        np.float32,
    )
    size = 32
    scale = side / size
    coords = np.clip((np.arange(size) + 0.5) * scale - 0.5, 0, None)
    i0 = coords.astype(np.int32)
    i1 = np.minimum(i0 + 1, side - 1)
    frac = coords - i0
    tmp = (crop[i0] * (1 - frac)[:, None, None] + crop[i1] * frac[:, None, None])
    ref = (tmp[:, i0] * (1 - frac)[None, :, None] + tmp[:, i1] * frac[None, :, None])
    ref = (ref - 127.5) / 127.5
    np.testing.assert_allclose(out, ref, atol=1e-3)


@requires_native
def test_native_decode_rejects_garbage():
    assert native.decode_img(b"not a jpeg at all", 32, 3) is None


@requires_native
def test_native_throughput_sane():
    """The native reader should stream at least tens of MB/s."""
    import tempfile, time, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "big.tfrecords")
        rec = bytes(range(256)) * 512  # 128 KB
        with pytfr.TFRecordWriter(path) as w:
            for _ in range(256):  # 32 MB
                w.write(rec)
        t0 = time.time()
        n = sum(len(r) for r in native.read_tfrecord_file(path, verify_crc=True))
        dt = time.time() - t0
        assert n == 256 * len(rec)
        assert n / dt > 20e6, f"native reader too slow: {n/dt/1e6:.1f} MB/s"


class TestIoUringInterleave:
    """io_uring interleaved shard reader (dmt_il_*): byte-identical order to
    the Python interleave, TF-framing correct, graceful fallbacks."""

    def _shards(self, tmp_path, n_files=5, per_file=7):
        from dalle_mtf_tpu.data.tfrecord import TFRecordWriter

        paths = []
        for i in range(n_files):
            p = str(tmp_path / f"shard_{i}.tfrecords")
            with TFRecordWriter(p) as w:
                for j in range(per_file + i):  # uneven shard sizes
                    w.write(f"rec-{i}-{j}".encode() * (j + 1))
            paths.append(p)
        return paths

    @pytest.mark.parametrize("cycle", [1, 2, 3, 4, 8])
    def test_order_matches_python_interleave(self, tmp_path, cycle):
        from dalle_mtf_tpu.data import native, tfrecord
        from dalle_mtf_tpu.data.pipeline import _Pipeline

        if not native.available():
            pytest.skip("native lib unavailable")
        paths = self._shards(tmp_path)
        g = native.read_interleaved(paths, cycle=cycle, verify_crc=True)
        if g is None:
            pytest.skip("io_uring unavailable in sandbox")
        nat = list(g)

        class FakePipe:
            cycle_length = cycle
            record_iter_fn = staticmethod(
                lambda f: tfrecord.read_tfrecord_file(f)
            )

        py = list(_Pipeline._interleaved(FakePipe(), list(paths)))
        assert nat == py
        assert len(nat) == sum(7 + i for i in range(5))

    def test_large_records_span_chunks(self, tmp_path):
        from dalle_mtf_tpu.data import native
        from dalle_mtf_tpu.data.tfrecord import TFRecordWriter

        if not native.available():
            pytest.skip("native lib unavailable")
        # records far larger than the read chunk force frame reassembly
        p = str(tmp_path / "big.tfrecords")
        blobs = [bytes([i]) * (200_000 + i) for i in range(5)]
        with TFRecordWriter(p) as w:
            for b in blobs:
                w.write(b)
        g = native.read_interleaved([p], cycle=1, verify_crc=True,
                                    chunk_kb=64)
        if g is None:
            pytest.skip("io_uring unavailable in sandbox")
        assert list(g) == blobs

    def test_corruption_detected(self, tmp_path):
        from dalle_mtf_tpu.data import native
        from dalle_mtf_tpu.data.tfrecord import TFRecordWriter

        if not native.available():
            pytest.skip("native lib unavailable")
        p = str(tmp_path / "corrupt.tfrecords")
        with TFRecordWriter(p) as w:
            w.write(b"payload-one")
            w.write(b"payload-two")
        raw = bytearray(open(p, "rb").read())
        raw[14] ^= 0xFF  # flip a payload byte of record 1
        open(p, "wb").write(bytes(raw))
        g = native.read_interleaved([p], cycle=1, verify_crc=True)
        if g is None:
            pytest.skip("io_uring unavailable in sandbox")
        with pytest.raises(IOError):
            list(g)

    def test_remote_paths_fall_back(self):
        from dalle_mtf_tpu.data import native

        if not native.available():
            pytest.skip("native lib unavailable")
        assert native.read_interleaved(["gs://bucket/x.tfrecords"]) is None
        assert native.read_interleaved([]) is None


@requires_native
def test_decode_pool_uint8_out_matches_f32_rounding():
    """decode_pool_samples(uint8_out=True) emits round(f32*127.5+127.5)
    of the pool's own f32 output (the dataset.uint8_images transfer
    mode), same records, same strict order."""
    from PIL import Image

    from dalle_mtf_tpu.data.tfrecord import serialize_example

    rng = np.random.RandomState(3)
    records = []
    for i in range(6):
        arr = rng.randint(0, 255, (40, 56, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=95)
        records.append(
            serialize_example({"image": buf.getvalue(), "caption": [i, i + 1]})
        )

    f32 = list(native.decode_pool_samples(
        iter(records), size=24, channels=3, text_len=4, padding_id=0))
    u8 = list(native.decode_pool_samples(
        iter(records), size=24, channels=3, text_len=4, padding_id=0,
        uint8_out=True))
    assert f32 is not None and u8 is not None and len(u8) == 6
    from dalle_mtf_tpu.data.pipeline import to_uint8

    for a, b in zip(f32, u8):
        assert b["image"].dtype == np.uint8
        np.testing.assert_array_equal(b["image"], to_uint8(a["image"]))
        np.testing.assert_array_equal(a["caption"], b["caption"])
