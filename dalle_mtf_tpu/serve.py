"""Batching inference serving for DALLE sampling.

The reference has no serving story at all (its PREDICT paths raise
NotImplementedError). This module provides the production-shaped one for
TPU: a single compiled text→image sampler executable (fixed batch shape —
XLA compiles once, every batch reuses the executable) fed by a request
queue with short-linger batching, plus a dependency-free HTTP front end
(stdlib ThreadingHTTPServer). Start it with ``serve_dalle.py``.

Design notes (TPU-first):
- one fixed server batch size: dynamic shapes would recompile per request
  mix. Short batches are padded with dummy rows and the extras discarded;
  decode cost is dominated by weight streaming, so padded rows are nearly
  free until the batch is full.
- ``temperature``/``top_k`` are fixed at server start: ``top_k`` is a
  static argument of the compiled sampler (lax.top_k needs a static k).
- the worker thread owns the device: requests never contend for the chip,
  they just queue. Linger (default 5 ms) trades a little latency for
  batching under load.
"""

from __future__ import annotations

import io
import json
import logging
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class BatchingSampler:
    """Queue + worker around one compiled ``generate_images`` executable."""

    def __init__(
        self,
        dalle,
        dalle_params,
        vae,
        vae_params,
        batch_size: int = 4,
        temperature: float = 1.0,
        top_k: int = 64,
        linger_ms: float = 5.0,
        seed: int = 0,
    ):
        from dalle_mtf_tpu.sample import generate_images  # noqa: PLC0415

        self.dalle = dalle
        self.vae = vae
        self.batch_size = int(batch_size)
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.linger_s = linger_ms / 1e3
        self._params = (dalle_params, vae_params)
        self._generate = generate_images
        self._rng = jax.random.PRNGKey(seed)
        self._batch_counter = 0
        self._q: queue.Queue = queue.Queue()
        self._closed = False
        self._submit_lock = threading.Lock()
        self._holdback = None  # request that didn't fit the last batch
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------ client API

    def submit(self, text_tokens, n: int = 1) -> Future:
        """Enqueue one request: ``n`` images of one tokenized text
        (list[int] of length text_seq_len). Resolves to f32[n, H, W, C]
        in [0, 1]."""
        if self._closed:
            raise RuntimeError("sampler is closed")
        n = int(n)
        if not 1 <= n <= self.batch_size:
            raise ValueError(f"n must be in [1, {self.batch_size}]")
        ids = list(text_tokens)
        if len(ids) != self.dalle.cfg.text_seq_len:
            raise ValueError(
                f"text must be tokenized+padded to {self.dalle.cfg.text_seq_len}"
            )
        fut: Future = Future()
        with self._submit_lock:
            if self._closed:  # close() may have won the race
                raise RuntimeError("sampler is closed")
            self._q.put((ids, n, fut))
        return fut

    def close(self):
        with self._submit_lock:
            self._closed = True
            self._q.put(None)
        self._worker.join(timeout=30)

    # ---------------------------------------------------------------- worker

    def _collect(self):
        """Block for one request, then linger briefly for batch-mates whose
        rows still fit. A request that doesn't fit the in-flight batch is
        held back to SEED the next batch (not requeued behind later
        arrivals — preserves arrival order)."""
        if self._holdback is not None:
            item, self._holdback = self._holdback, None
        else:
            item = self._q.get()
        if item is None:
            return None
        batch = [item]
        rows = item[1]
        deadline = time.monotonic() + self.linger_s
        while rows < self.batch_size:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-deliver shutdown to the outer loop
                break
            if rows + nxt[1] > self.batch_size:
                self._holdback = nxt  # seeds the next batch, keeping order
                break
            batch.append(nxt)
            rows += nxt[1]
        return batch

    def _run(self):
        b = self.batch_size
        t_len = self.dalle.cfg.text_seq_len
        while True:
            batch = self._collect()
            if batch is None:
                return
            rows = np.zeros((b, t_len), np.int32)
            r = 0
            for ids, n, _fut in batch:
                rows[r:r + n] = np.asarray(ids, np.int32)
                r += n
            self._batch_counter += 1
            rng = jax.random.fold_in(self._rng, self._batch_counter)
            t0 = time.perf_counter()
            try:
                imgs = self._generate(
                    self.dalle, self._params[0], self.vae, self._params[1],
                    jnp.asarray(rows), rng,
                    temperature=self.temperature, top_k=self.top_k,
                )
                imgs = np.asarray(jax.device_get(imgs))
            except Exception as e:  # surface failures to every waiter
                for _ids, _n, fut in batch:
                    if not fut.cancelled():
                        fut.set_exception(e)
                continue
            dt = time.perf_counter() - t0
            logger.info(
                "batch of %d request(s) / %d row(s) in %.2fs",
                len(batch), r, dt,
            )
            r = 0
            for _ids, n, fut in batch:
                if not fut.cancelled():
                    fut.set_result(imgs[r:r + n])
                r += n


# ------------------------------------------------------------------- HTTP

def _png_b64(img: np.ndarray) -> str:
    import base64  # noqa: PLC0415

    from PIL import Image  # noqa: PLC0415

    buf = io.BytesIO()
    arr = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def make_server(sampler: BatchingSampler, tokenizer, pad_len: int,
                host: str = "0.0.0.0", port: int = 8000,
                timeout_s: float = 120.0) -> ThreadingHTTPServer:
    """HTTP front end. POST /generate {"text": str, "n": int} ->
    {"images": [<b64 png>...], "latency_s": float}; GET /healthz -> ok."""
    from dalle_mtf_tpu.data.tokenizer import pad_or_truncate  # noqa: PLC0415

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route to logging, not stderr
            logger.debug("http: " + fmt, *args)

        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                text = req["text"]
                n = int(req.get("n", 1))
                ids = pad_or_truncate(
                    tokenizer.encode(text), pad_len, tokenizer.pad_token_id
                )
                t0 = time.perf_counter()
                imgs = sampler.submit(ids, n).result(timeout=timeout_s)
                self._reply(200, {
                    "images": [_png_b64(im) for im in imgs],
                    "latency_s": round(time.perf_counter() - t0, 3),
                })
            except (KeyError, ValueError) as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover - server-side failure
                logger.exception("generate failed")
                self._reply(500, {"error": str(e)})

    return ThreadingHTTPServer((host, port), Handler)
