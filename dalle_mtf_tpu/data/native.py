"""ctypes bindings for the native data-path library (native/dataloader.cpp).

Provides hardware-crc32c TFRecord reading and fused JPEG
decode+crop+resize+normalize. Built lazily with g++ on first use and cached;
every entry point has a pure-Python fallback (tfrecord.py / pipeline.py), so
the framework works without a toolchain — just slower on the host side.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_LIB = None
_LIB_LOCK = threading.Lock()
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libdalle_data.so")


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "dataloader.cpp")
    if not os.path.isfile(src):
        return False
    cmd = [
        "g++", "-O3", "-march=x86-64-v2", "-shared", "-fPIC",
        src, "-o", _SO_PATH, "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.warning("native dataloader build failed: %s", e)
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB if _LIB is not False else None
        if not os.path.isfile(_SO_PATH) or (
            os.path.isfile(os.path.join(_NATIVE_DIR, "dataloader.cpp"))
            and os.path.getmtime(_SO_PATH)
            < os.path.getmtime(os.path.join(_NATIVE_DIR, "dataloader.cpp"))
        ):
            if not _build():
                _LIB = False
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:
            logger.warning("native dataloader load failed: %s", e)
            _LIB = False
            return None
        lib.dmt_crc32c.restype = ctypes.c_uint32
        lib.dmt_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.dmt_crc32c_masked.restype = ctypes.c_uint32
        lib.dmt_crc32c_masked.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.dmt_tfr_open.restype = ctypes.c_void_p
        lib.dmt_tfr_open.argtypes = [ctypes.c_char_p]
        lib.dmt_tfr_next.restype = ctypes.c_int64
        lib.dmt_tfr_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int,
        ]
        lib.dmt_tfr_close.restype = None
        lib.dmt_tfr_close.argtypes = [ctypes.c_void_p]
        lib.dmt_decode_jpeg.restype = ctypes.c_int
        lib.dmt_decode_jpeg.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.dmt_il_open.restype = ctypes.c_void_p
        lib.dmt_il_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.dmt_il_next.restype = ctypes.c_int64
        lib.dmt_il_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.dmt_il_close.restype = None
        lib.dmt_il_close.argtypes = [ctypes.c_void_p]
        lib.dmt_pool_open.restype = ctypes.c_void_p
        lib.dmt_pool_open.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.dmt_pool_submit.restype = None
        lib.dmt_pool_submit.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        lib.dmt_pool_wait.restype = ctypes.c_int
        lib.dmt_pool_wait.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.dmt_pool_close.restype = None
        lib.dmt_pool_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


def available() -> bool:
    return get_lib() is not None


def crc32c(data: bytes) -> int:
    lib = get_lib()
    if lib is None:
        from dalle_mtf_tpu.data import tfrecord  # noqa: PLC0415

        return tfrecord.crc32c(data)
    return lib.dmt_crc32c(data, len(data))


def read_tfrecord_file(path, verify_crc: bool = False):
    """Streaming TFRecord reader; yields bytes records.

    Local files take the native (mmap'd, hardware-crc32c) fast path; remote
    URLs (gs://, memory://, ...) and open file objects stream through the
    pure-Python reader over fsspec — matching the reference's GCS-native
    tf.data input (input_fns.py:85-104).
    """
    from dalle_mtf_tpu.data.fs import is_remote  # noqa: PLC0415

    lib = None if (hasattr(path, "read") or is_remote(path)) else get_lib()
    if lib is None:
        from dalle_mtf_tpu.data import tfrecord  # noqa: PLC0415

        yield from tfrecord.read_tfrecord_file(path, verify_crc)
        return
    h = lib.dmt_tfr_open(path.encode())
    if not h:
        raise IOError(f"cannot open {path}")
    try:
        buf = ctypes.POINTER(ctypes.c_uint8)()
        while True:
            n = lib.dmt_tfr_next(h, ctypes.byref(buf), 1 if verify_crc else 0)
            if n == -1:
                return
            if n < 0:
                raise IOError(f"corrupt tfrecord in {path}")
            yield ctypes.string_at(buf, n)
    finally:
        lib.dmt_tfr_close(h)


def decode_img(data: bytes, size: int, channels: int = 3) -> np.ndarray | None:
    """Fused decode+center-crop+resize+normalize. None if native unavailable
    or the payload isn't a decodable JPEG (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((size, size, channels), np.float32)
    rc = lib.dmt_decode_jpeg(
        data, len(data), size, channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        return None
    return out


def decode_pool_samples(records, size: int, channels: int, text_len: int,
                        padding_id: int, workers: int | None = None,
                        window: int | None = None, uint8_out: bool = False):
    """Parallel parse+decode of TFRecord payloads in a C++ thread pool.

    ``records``: iterator of raw Example bytes. Yields
    {"image": f32[size,size,channels]} (+ "caption": i32[text_len] when
    text_len > 0) in STRICT record order — the shuffle window downstream
    relies on determinism. The C++ side does the proto walk AND the fused
    jpeg decode (tf.data's parallel C++ map, input_fns.py:24-29, rebuilt);
    records the native path can't handle (non-jpeg payloads, schema drift)
    fall back to the Python parser per record. Returns None when the native
    library is unavailable (caller uses the Python thread pool).

    ``uint8_out``: emit uint8 [0, 255] pixels instead (the
    ``dataset.uint8_images`` transfer mode) — the pool's fused-normalized
    f32 output is rounded back to the nearest uint8, the same quantization
    ``decode_img(normalize=False)`` applies on the native path (documented
    <= 0.5/127.5 per-pixel delta vs the f32 batch)."""
    lib = get_lib()
    if lib is None:
        return None
    import os as _os  # noqa: PLC0415

    if workers is None:
        workers = max(1, min(16, _os.cpu_count() or 1))
    if window is None:
        window = max(4, workers * 2)

    def gen():
        from collections import deque  # noqa: PLC0415

        handle = lib.dmt_pool_open(int(workers), int(size), int(channels))
        if not handle:  # pragma: no cover - allocation failure
            raise MemoryError("dmt_pool_open failed")
        inflight: deque = deque()  # (seq, rec_bytes, img, cap)
        seq = 0

        def submit(rec: bytes):
            nonlocal seq
            img = np.empty((size, size, channels), np.float32)
            cap = np.full((max(text_len, 1),), padding_id, np.int32)
            lib.dmt_pool_submit(
                handle, rec, len(rec), seq,
                img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                cap.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                int(text_len),
            )
            inflight.append((seq, rec, img, cap))
            seq += 1

        def collect():
            s, rec, img, cap = inflight.popleft()
            n = ctypes.c_int(0)
            rc = lib.dmt_pool_wait(handle, s, ctypes.byref(n))
            if rc != 0:  # per-record Python fallback (e.g. png payload)
                from dalle_mtf_tpu.data.pipeline import decode_img  # noqa: PLC0415
                from dalle_mtf_tpu.data.tfrecord import parse_example  # noqa: PLC0415

                ex = parse_example(rec)
                sample = {"image": decode_img(ex["image"][0], size, channels,
                                              normalize=not uint8_out)}
                if text_len > 0:
                    caption = list(ex.get("caption", []))
                    caption = (caption + [padding_id] * text_len)[:text_len]
                    sample["caption"] = np.asarray(caption, np.int32)
                return sample
            if uint8_out:
                from dalle_mtf_tpu.data.pipeline import to_uint8  # noqa: PLC0415

                img = to_uint8(img)
            sample = {"image": img}
            if text_len > 0:
                sample["caption"] = cap
            return sample

        try:
            for rec in records:
                submit(rec)
                if len(inflight) >= window:
                    yield collect()
            while inflight:
                yield collect()
        finally:
            # drain outstanding jobs before close frees the pool (their
            # output buffers live in `inflight`)
            while inflight:
                s, _rec, _img, _cap = inflight.popleft()
                n = ctypes.c_int(0)
                lib.dmt_pool_wait(handle, s, ctypes.byref(n))
            lib.dmt_pool_close(handle)

    return gen()


def read_interleaved(paths, cycle: int = 4, verify_crc: bool = False,
                     chunk_kb: int = 1024):
    """io_uring interleaved TFRecord reader over local shard files.

    Round-robins one record at a time across a ``cycle`` window of open
    files (an exhausted file is replaced by the next unopened one) — the
    same order as pipeline.py's Python interleave, with the I/O of every
    stream in flight concurrently on one io_uring. Returns None when the
    native library or io_uring is unavailable (caller falls back).
    """
    lib = get_lib()
    if lib is None:
        return None
    from dalle_mtf_tpu.data.fs import is_remote  # noqa: PLC0415

    paths = list(paths)
    if not paths or any(hasattr(p, "read") or is_remote(p) for p in paths):
        return None
    for p in paths:
        # fail loudly up front like the Python reader's open() would — the
        # native refill would otherwise skip unopenable shards silently
        if not os.path.isfile(p):
            raise FileNotFoundError(f"tfrecord shard not found: {p}")
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    handle = lib.dmt_il_open(arr, len(paths), int(cycle),
                             1 if verify_crc else 0, int(chunk_kb))
    if not handle:
        logger.info("io_uring interleave unavailable; python fallback")
        return None

    def gen():
        try:
            buf = ctypes.POINTER(ctypes.c_uint8)()
            while True:
                n = lib.dmt_il_next(handle, ctypes.byref(buf))
                if n == -1:
                    return
                if n < 0:
                    raise IOError("corrupt tfrecord in interleaved read")
                yield ctypes.string_at(buf, n)
        finally:
            lib.dmt_il_close(handle)

    return gen()
