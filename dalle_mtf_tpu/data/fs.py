"""Filesystem layer: local paths plus remote URLs (gs://, s3://, memory://).

The reference streamed TFRecords straight off GCS through tf.data
(src/input_fns.py:85-104; every shipped config uses gs:// paths). Here the
same capability comes from fsspec (gcsfs backs gs://): ``open_file`` returns
a buffered, seekable file object for any URL, and ``list_files`` globs both
local patterns and remote URLs. The native C++ TFRecord reader remains the
local fast path; remote files flow through the pure-Python record reader
over an fsspec stream (data/native.py dispatches on ``is_remote``).

The memory:// filesystem makes the whole remote path unit-testable offline
(tests/test_data.py) — the code path is identical to gs:// modulo the
fsspec backend.
"""

from __future__ import annotations

import glob as globlib


def is_remote(path: str) -> bool:
    """True for URL-style paths that need fsspec (gs://, s3://, memory://...).

    file:// counts as local-ish but still routes through fsspec for
    uniformity; plain paths and Windows drive letters do not.
    """
    if not isinstance(path, str):
        return False
    head, sep, _ = path.partition("://")
    return bool(sep) and head.isalpha() and len(head) > 1


def _remote_read_hints() -> tuple[str, int]:
    """(cache_type, block_size) for sequential remote scans, tunable via
    DALLE_TPU_GCS_CACHE / DALLE_TPU_GCS_BLOCK_MB (docs/data.md "Tuning
    remote reads"). Defaults: readahead caching with 16 MB blocks — the
    multi-MB windows tf.data's GCS reader used (parallel_interleave,
    reference input_fns.py:85-104)."""
    import os  # noqa: PLC0415

    cache = os.environ.get("DALLE_TPU_GCS_CACHE", "readahead")
    block_mb = int(os.environ.get("DALLE_TPU_GCS_BLOCK_MB", "16"))
    return cache, max(1, block_mb) << 20


def open_file(path: str, mode: str = "rb", *,
              cache_type: str | None = None, block_size: int | None = None):
    """Open a local path or remote URL; returns a file-like object.

    Remote reads are buffered by the fsspec backend (gcsfs fetches in
    multi-MB blocks), so per-record reads off the returned object do not
    issue per-record RPCs. ``cache_type``/``block_size`` override the
    env-tunable sequential-scan hints (_remote_read_hints).
    """
    if is_remote(path):
        import fsspec  # noqa: PLC0415

        if "r" in mode:
            env_cache, env_block = _remote_read_hints()
            try:
                # sequential-scan hints: large blocks + readahead caching
                # (gcsfs then fetches multi-MB ranges ahead of the cursor,
                # the window tf.data's GCS reader used); backends that
                # don't take these kwargs fall through to defaults
                return fsspec.open(
                    path, mode,
                    cache_type=cache_type or env_cache,
                    block_size=block_size or env_block,
                ).open()
            except TypeError:
                pass
        return fsspec.open(path, mode).open()
    return open(path, mode)


def list_files(pattern: str) -> list[str]:
    """Glob local patterns or remote URLs (reference input_fns.py:79,85 used
    tf.io.gfile-backed Dataset.list_files over gs:// globs)."""
    if is_remote(pattern):
        import fsspec  # noqa: PLC0415

        fs, _, paths = fsspec.get_fs_token_paths(pattern)
        return sorted(fs.unstrip_protocol(p) for p in paths)
    return sorted(globlib.glob(pattern, recursive=True))


def makedirs(path: str) -> None:
    if is_remote(path):
        import fsspec  # noqa: PLC0415

        fs, _, (p,) = fsspec.get_fs_token_paths(path)
        fs.makedirs(p, exist_ok=True)
        return
    import os  # noqa: PLC0415

    os.makedirs(path, exist_ok=True)
