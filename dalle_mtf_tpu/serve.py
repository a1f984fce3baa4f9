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
- ``temperature`` is PER-REQUEST: it rides the compiled sampler as a
  traced per-row [B] vector (never recompiles). ``top_k`` is also
  per-request but static in the executable (lax.top_k needs a static k),
  so it is rounded up into a small bucket set — one compiled executable
  per bucket, batches grouped by bucket.
- the worker thread owns the device: requests never contend for the chip,
  they just queue. Linger (default 5 ms) trades a little latency for
  batching under load. A failed device call on a PROVEN executable (one
  that has succeeded before) is retried once — transient runtime hiccups;
  a bucket's first-ever call fails fast instead (its error is
  deterministic — compile/OOM). The final failure surfaces to every
  waiter in the batch.
"""

from __future__ import annotations

import io
import json
import logging
import queue
import threading
import time
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FuturesTimeoutError
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

_DRAIN = object()  # graceful-shutdown sentinel (vs None = hard stop)


def _safe_resolve(fut: Future, result=None, exc=None) -> bool:
    """Resolve a Future exactly once, racing client-side cancel() (these
    futures never enter RUNNING, so cancel can win at ANY point before
    resolution — an unguarded set_result/set_exception then raises
    InvalidStateError and kills the worker thread)."""
    try:
        if fut.cancelled() or fut.done():
            return False
        if exc is not None:
            fut.set_exception(exc)
        else:
            fut.set_result(result)
        return True
    except Exception:  # InvalidStateError: lost the race — request is dead
        return False


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
        top_k_buckets=(0, 16, 64, 256),
        max_retries: int = 1,
    ):
        from collections import deque  # noqa: PLC0415

        from dalle_mtf_tpu.sample import generate_images  # noqa: PLC0415

        self.dalle = dalle
        self.vae = vae
        self.batch_size = int(batch_size)
        self.temperature = float(temperature)  # default for requests
        self.top_k = int(top_k)                # default for requests
        self.top_k_buckets = tuple(sorted(set(top_k_buckets) | {int(top_k)}))
        self.max_retries = int(max_retries)
        self.linger_s = linger_ms / 1e3
        self._params = (dalle_params, vae_params)
        self._generate = generate_images
        self._rng = jax.random.PRNGKey(seed)
        self._batch_counter = 0
        # buckets whose executable has completed at least once: only those
        # are retried on failure — a first-call failure is a deterministic
        # compile/OOM error, and re-running it would double a multi-minute
        # compile before surfacing the same error
        self._proven_buckets: set[int] = set()
        self._q: queue.Queue = queue.Queue()
        self._closed = False
        self._submit_lock = threading.Lock()
        # requests that didn't fit (or didn't match the in-flight top_k
        # bucket): FIFO, seeds the next batches ahead of newer arrivals
        self._holdback = deque()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------ client API

    def _bucket(self, top_k: int) -> int:
        """Round a requested top_k UP into the compiled bucket set (each
        bucket is its own fixed-shape executable; a slightly larger k only
        widens the candidate pool)."""
        k = int(top_k)
        if k <= 0:
            return 0
        for b in self.top_k_buckets:
            if b >= k > 0 and b > 0:
                return b
        # k above every bucket: honor the round-UP contract by dropping the
        # truncation entirely (bucket 0 = full vocab, a strictly WIDER pool
        # than asked for); falling back to the largest bucket would silently
        # serve a narrower pool than requested
        if 0 in self.top_k_buckets:
            logger.warning(
                "top_k=%d above every bucket %s; serving untruncated",
                k, self.top_k_buckets,
            )
            return 0
        # no untruncated bucket configured: the widest bucket is the best
        # this server can do, but it IS narrower than asked — say so
        logger.warning(
            "top_k=%d above every bucket %s and no 0 (untruncated) bucket "
            "configured; serving the widest bucket %d (narrower than "
            "requested)", k, self.top_k_buckets, max(self.top_k_buckets),
        )
        return max(self.top_k_buckets)

    def submit(self, text_tokens, n: int = 1, temperature=None,
               top_k=None, top_p=None) -> Future:
        """Enqueue one request: ``n`` images of one tokenized text
        (list[int] of length text_seq_len), with optional per-request
        sampling params (``top_p`` < 1 = nucleus sampling over the top-k
        candidate set). Resolves to f32[n, H, W, C] in [0, 1]."""
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
        temp = self.temperature if temperature is None else float(temperature)
        if not 0.0 <= temp <= 100.0:
            raise ValueError(f"temperature {temp} out of range [0, 100]")
        tp = 1.0 if top_p is None else float(top_p)
        if not 0.0 < tp <= 1.0:
            raise ValueError(f"top_p {tp} out of range (0, 1]")
        kb = self._bucket(self.top_k if top_k is None else top_k)
        fut: Future = Future()
        with self._submit_lock:
            if self._closed:  # close() may have won the race
                raise RuntimeError("sampler is closed")
            self._q.put((ids, n, temp, kb, tp, fut))
        return fut

    def close(self):
        """Shutdown. For THIS engine close already drains: the sentinel is
        FIFO behind queued requests and the worker empties the holdback
        before reading it — only the join is bounded. (The continuous
        engine's close() is a hard stop; its drain() is the graceful one.)"""
        self.drain(timeout=30)

    def drain(self, timeout: float | None = None):
        """Graceful shutdown for deploys: stop accepting, serve everything
        already queued, then stop."""
        with self._submit_lock:
            self._closed = True
            self._q.put(None)
        self._worker.join(timeout=timeout)

    def stats(self) -> dict:
        """Live engine counters (served by the HTTP /stats endpoint)."""
        return {
            "engine": "whole-batch",
            "batch_size": self.batch_size,
            "queue_depth": self._q.qsize(),
            "holdback": len(self._holdback),
            "batches_done": self._batch_counter,
        }

    # ---------------------------------------------------------------- worker

    @staticmethod
    def _exe_key(item):
        """Executable identity a batch must share: the top_k bucket, plus
        whether nucleus sampling is active (top_p presence is the one
        static bit in the sampler; its VALUE is traced per-row)."""
        return (item[3], item[4] < 1.0)

    def _collect(self):
        """Block for one request, then linger briefly for batch-mates whose
        rows still fit AND share the seed's executable (top_k bucket +
        top_p presence). A request that doesn't fit (or mismatches) is held
        back FIFO to seed the following batches — never requeued behind
        later arrivals."""
        if self._holdback:
            item = self._holdback.popleft()
        else:
            item = self._q.get()
            if item is None:
                return None
        batch = [item]
        rows = item[1]
        key = self._exe_key(item)
        # older held-back requests first (strict FIFO: stop at the first
        # that can't join, so arrival order is preserved)
        while self._holdback:
            nxt = self._holdback[0]
            if self._exe_key(nxt) != key or rows + nxt[1] > self.batch_size:
                break
            batch.append(self._holdback.popleft())
            rows += nxt[1]
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
            if self._exe_key(nxt) != key:
                self._holdback.append(nxt)  # different executable: next batch
                continue
            if rows + nxt[1] > self.batch_size:
                self._holdback.append(nxt)  # seeds the next batch, in order
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
            temps = np.full((b,), 1.0, np.float32)
            topps = np.ones((b,), np.float32)
            bucket, use_top_p = self._exe_key(batch[0])
            r = 0
            for ids, n, temp, _kb, tp, _fut in batch:
                rows[r:r + n] = np.asarray(ids, np.int32)
                temps[r:r + n] = temp
                topps[r:r + n] = tp
                r += n
            self._batch_counter += 1
            rng = jax.random.fold_in(self._rng, self._batch_counter)
            t0 = time.perf_counter()
            err = None
            imgs = None
            exe = (bucket, use_top_p)
            retries = self.max_retries if exe in self._proven_buckets else 0
            for attempt in range(1 + retries):
                try:
                    imgs = self._generate(
                        self.dalle, self._params[0], self.vae,
                        self._params[1], jnp.asarray(rows), rng,
                        temperature=jnp.asarray(temps), top_k=bucket,
                        top_p=jnp.asarray(topps) if use_top_p else None,
                    )
                    imgs = np.asarray(jax.device_get(imgs))
                    self._proven_buckets.add(exe)
                    err = None
                    break
                except Exception as e:
                    # retry covers transient runtime blips on a PROVEN
                    # executable; a bucket that has never succeeded fails
                    # fast (its error is deterministic — compile/OOM —
                    # and a retry would just repeat the compile)
                    err = e
                    if attempt < retries:
                        logger.warning(
                            "batch failed (attempt %d), retrying: %s",
                            attempt + 1, e,
                        )
            if err is not None:  # surface failures to every waiter
                for *_rest, fut in batch:
                    _safe_resolve(fut, exc=err)
                continue
            dt = time.perf_counter() - t0
            logger.info(
                "batch of %d request(s) / %d row(s) top_k=%d%s in %.2fs",
                len(batch), r, bucket, " +top_p" if use_top_p else "", dt,
            )
            r = 0
            for _ids, n, _t, _kb, _tp, fut in batch:
                _safe_resolve(fut, result=imgs[r:r + n])
                r += n


class ContinuousBatchingSampler:
    """Slot-level continuous batching (vLLM-style, for fixed-length image
    generation): requests join a LIVE batch at chunk boundaries instead of
    waiting out the in-flight whole-image generation.

    Why: ``BatchingSampler`` forms a batch, generates all 1024 tokens, and
    only then looks at the queue — a request arriving just after launch
    waits a full generation (~1 s) before its own starts, and late-batch
    slots whose work finished... don't exist (all rows finish together),
    but EMPTY slots ride whole generations when load is bursty. Here the
    device loop is a ``decode_chunk`` of N steps; between chunks, finished
    rows leave (their image decodes + resolves immediately) and queued
    requests are admitted into free slots via a masked prefill
    (sample.admit_rows) — slot occupancy tracks offered load at chunk
    granularity. Admission latency is one chunk (~chunk × step time);
    dispatch overhead amortizes across the chunk.

    Per-request sampling params need no buckets at all in this mode:
    ``top_k`` rides as a traced per-row RANK mask over one static
    ``k_max``-wide approx_max_k (any k in [1, k_max] in one executable;
    k=0 = untruncated full-vocab categorical; k > k_max is served
    untruncated — wider, never narrower). ``temperature`` is the same
    traced [B] vector the whole-batch sampler uses.

    Failure policy: the chunk/admit executables DONATE their state buffers
    (the KV cache round-trips every chunk), so a failed device call leaves
    no state to retry from — every in-flight request gets the error and
    the engine resets to empty slots. Same client API as BatchingSampler
    (submit -> Future, close), so make_server works unchanged.
    """

    def __init__(
        self,
        dalle,
        dalle_params,
        vae,
        vae_params,
        batch_size: int = 4,
        temperature: float = 1.0,
        top_k: int = 64,
        seed: int = 0,
        chunk: int = 128,
        k_max: int = 256,
    ):
        from dalle_mtf_tpu.sample import admit_rows, decode_chunk  # noqa: PLC0415

        self.dalle = dalle
        self.vae = vae
        self.batch_size = int(batch_size)
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.chunk = int(chunk)
        self.k_max = int(k_max)
        self._params = (dalle_params, vae_params)
        self._admit_rows = admit_rows
        self._decode_chunk = decode_chunk
        self._decode_tokens = jax.jit(vae.decode_tokens)
        end = dalle.cfg.text_seq_len + dalle.cfg.image_seq_len
        self._park = jax.jit(
            lambda pos, m: jnp.where(m, jnp.int32(end), pos)
        )
        self._chunks_done = 0
        self._seed = seed
        self._q: queue.Queue = queue.Queue()
        self._closed = False
        self._draining = False
        self._submit_lock = threading.Lock()
        self._reset_state()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------ client API

    def _effective_top_k(self, top_k) -> int:
        k = int(self.top_k if top_k is None else top_k)
        if k <= 0:
            return 0
        if k > self.k_max:
            logger.warning(
                "top_k=%d above k_max=%d; serving untruncated", k, self.k_max
            )
            return 0
        return k

    def submit(self, text_tokens, n: int = 1, temperature=None,
               top_k=None, top_p=None) -> Future:
        """Same contract as BatchingSampler.submit. ``top_p`` is fully
        traced per-row here (nucleus over the k_max candidate set) — no
        executable split at all."""
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
        temp = self.temperature if temperature is None else float(temperature)
        if not 0.0 <= temp <= 100.0:
            raise ValueError(f"temperature {temp} out of range [0, 100]")
        tp = 1.0 if top_p is None else float(top_p)
        if not 0.0 < tp <= 1.0:
            raise ValueError(f"top_p {tp} out of range (0, 1]")
        k = self._effective_top_k(top_k)
        fut: Future = Future()
        group = {"fut": fut, "need": n, "images": [None] * n}
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("sampler is closed")
            for i in range(n):
                self._q.put((ids, temp, k, tp, group, i))
        return fut

    def close(self):
        """Hard stop: in-flight generations get RuntimeError."""
        with self._submit_lock:
            self._closed = True
            self._q.put(None)
        self._worker.join(timeout=30)

    def drain(self, timeout: float | None = None):
        """Graceful shutdown: stop accepting, run the engine until every
        queued request has been admitted, generated, and resolved, then
        stop. (close() by contrast fails in-flight work immediately.)"""
        with self._submit_lock:
            self._closed = True
            self._q.put(_DRAIN)
        self._worker.join(timeout=timeout)

    # ---------------------------------------------------------------- engine

    def _reset_state(self):
        b = self.batch_size
        cfg = self.dalle.cfg
        self._end_pos = cfg.text_seq_len + cfg.image_seq_len
        self._cache = self.dalle.init_cache(b)
        # banded: the continuous engine's logits only ever cover the
        # image-token vocabulary (sample.admit_rows / decode_chunk)
        self._logits = jnp.zeros((b, cfg.image_vocab_size), jnp.float32)
        # parked at the end: no slot advances until something is admitted
        self._positions = jnp.full((b,), self._end_pos, jnp.int32)
        # fold a monotone counter in so a failure reset doesn't replay the
        # exact sampling stream (two identical requests before/after a
        # reset must not get bit-identical "random" images)
        self._resets = getattr(self, "_resets", -1) + 1
        self._rng = jax.random.fold_in(
            jax.random.PRNGKey(self._seed), self._resets
        )
        self._temps = np.full((b,), 1.0, np.float32)
        self._topks = np.zeros((b,), np.int32)
        self._topps = np.ones((b,), np.float32)
        # per-slot host bookkeeping: None = free
        self._slot: list[dict | None] = [None] * b
        self._slot_tokens: list[list[int]] = [[] for _ in range(b)]

    def _fail_all(self, err: Exception):
        # one set_exception per GROUP — an n>1 request's rows share one
        # Future, and resolving it twice would raise out of the worker
        seen: set[int] = set()
        for s in self._slot:
            if s is not None and id(s["group"]) not in seen:
                seen.add(id(s["group"]))
                _safe_resolve(s["group"]["fut"], exc=err)
        self._reset_state()

    def _reap_cancelled(self):
        """Free slots whose request was cancelled: park their positions so
        they stop advancing and admit new work next cycle. (The whole-batch
        engine cannot do this — its executable runs all 1024 steps for
        every row regardless.)"""
        cancelled = [
            i for i, s in enumerate(self._slot)
            if s is not None and s["group"]["fut"].cancelled()
        ]
        if not cancelled:
            return
        mask = np.zeros((self.batch_size,), bool)
        for slot in cancelled:
            mask[slot] = True
            self._slot[slot] = None
            self._slot_tokens[slot] = []
        self._positions = self._park(self._positions, jnp.asarray(mask))
        logger.info("reaped %d cancelled slot(s): %s", len(cancelled), cancelled)

    def _admit(self) -> bool | None:
        """Fill free slots from the queue. Blocks when the batch is idle;
        returns None on shutdown, else whether anything was admitted."""
        free = [i for i, s in enumerate(self._slot) if s is None]
        idle = len(free) == len(self._slot)
        admitted = []
        while free:
            try:
                item = self._q.get(
                    block=idle and not admitted and not self._draining
                )
            except queue.Empty:
                break
            if item is None:
                return None
            if item is _DRAIN:
                self._draining = True
                continue  # everything queued before it still gets served
            ids, temp, k, tp, group, idx = item
            if group["fut"].cancelled() or group["fut"].done():
                continue  # cancelled while queued / group already failed:
                # don't burn a prefill + chunk on an undeliverable row
            slot = free.pop(0)
            self._slot[slot] = {
                "ids": ids, "group": group, "idx": idx, "t0": time.perf_counter(),
            }
            self._slot_tokens[slot] = []
            self._temps[slot] = temp
            self._topks[slot] = k
            self._topps[slot] = tp
            admitted.append(slot)
            if not free:
                break
        if not admitted:
            return False
        cfg = self.dalle.cfg
        texts = np.zeros((self.batch_size, cfg.text_seq_len), np.int32)
        mask = np.zeros((self.batch_size,), bool)
        for slot in admitted:
            texts[slot] = np.asarray(self._slot[slot]["ids"], np.int32)
            mask[slot] = True
        self._cache, self._logits, self._positions = self._admit_rows(
            self.dalle, self._params[0], self._cache, self._logits,
            self._positions, jnp.asarray(texts), jnp.asarray(mask),
        )
        logger.info("admitted %d request row(s) into slots %s",
                    len(admitted), admitted)
        return True

    def _finish_rows(self, finished: list[int]):
        """VAE-decode the finished slots (one fixed-shape full-batch
        executable; idle rows carry garbage and are discarded) and resolve
        any groups whose rows are all done."""
        cfg = self.dalle.cfg
        toks = np.zeros((self.batch_size, cfg.image_seq_len), np.int32)
        for slot in finished:
            toks[slot] = np.asarray(self._slot_tokens[slot], np.int32)
        imgs = np.asarray(jax.device_get(
            self._decode_tokens(self._params[1], jnp.asarray(toks))
        ))
        for slot in finished:
            s = self._slot[slot]
            g = s["group"]
            g["images"][s["idx"]] = imgs[slot]
            logger.info(
                "slot %d finished in %.2fs", slot, time.perf_counter() - s["t0"]
            )
            self._slot[slot] = None
            self._slot_tokens[slot] = []
            if all(im is not None for im in g["images"]):
                _safe_resolve(g["fut"], result=np.stack(g["images"]))

    def stats(self) -> dict:
        """Live engine counters (served by the HTTP /stats endpoint)."""
        return {
            "engine": "continuous",
            "slots_total": self.batch_size,
            "slots_busy": sum(s is not None for s in self._slot),
            "queue_depth": self._q.qsize(),
            "chunks_done": self._chunks_done,
            "chunk": self.chunk,
        }

    def _run(self):
        # EVERY device call (admit prefill, chunk, VAE decode) and the host
        # bookkeeping sit under one guard: the executables donate their
        # state buffers, so any failure leaves nothing to retry from —
        # the documented policy is fail-everyone + reset, and an unguarded
        # exception here would instead kill the worker thread and hang
        # every outstanding Future forever.
        while True:
            try:
                self._reap_cancelled()  # freed slots admit work right away
                got = self._admit()
                if got is None:
                    self._fail_all(RuntimeError("sampler is closed"))
                    return
                if all(s is None for s in self._slot):
                    if self._draining and self._q.empty():
                        return  # drained: everything served, nothing queued
                    continue  # woke on shutdown race or spurious empty
                (self._cache, self._logits, self._positions, self._rng,
                 tokens, active) = self._decode_chunk(
                    self.dalle, self._params[0], self._cache, self._logits,
                    self._positions, self._rng,
                    jnp.asarray(self._temps), jnp.asarray(self._topks),
                    chunk=self.chunk, k_max=self.k_max,
                    top_p_rows=jnp.asarray(self._topps),
                )
                tokens = np.asarray(jax.device_get(tokens))
                active = np.asarray(jax.device_get(active))
                self._chunks_done += 1
                finished = []
                for slot, s in enumerate(self._slot):
                    if s is None:
                        continue
                    emitted = tokens[active[:, slot], slot]
                    self._slot_tokens[slot].extend(emitted.tolist())
                    if len(self._slot_tokens[slot]) >= self.dalle.cfg.image_seq_len:
                        finished.append(slot)
                if finished:
                    self._finish_rows(finished)
            except Exception as e:
                logger.exception("engine step failed; resetting")
                self._fail_all(e)


# ------------------------------------------------------------------- HTTP

def _png_b64(img: np.ndarray) -> str:
    import base64  # noqa: PLC0415

    from PIL import Image  # noqa: PLC0415

    buf = io.BytesIO()
    arr = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def make_server(sampler: BatchingSampler | ContinuousBatchingSampler,
                tokenizer, pad_len: int,
                host: str = "0.0.0.0", port: int = 8000,
                timeout_s: float = 120.0) -> ThreadingHTTPServer:
    """HTTP front end (either engine). POST /generate {"text": str,
    "n": int, "temperature": float?, "top_k": int?} ->
    {"images": [<b64 png>...], "latency_s": float}; GET /healthz -> ok;
    GET /stats -> live engine counters."""
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
            elif self.path == "/stats":
                self._reply(200, sampler.stats())
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
                temp = req.get("temperature")
                top_k = req.get("top_k")
                top_p = req.get("top_p")
                t0 = time.perf_counter()
                fut = sampler.submit(
                    ids, n, temperature=temp, top_k=top_k, top_p=top_p
                )
                try:
                    imgs = fut.result(timeout=timeout_s)
                except FuturesTimeoutError:
                    # cancel so the engine stops spending capacity on a
                    # request whose client already got an error (the
                    # continuous engine reaps the slot at the next chunk)
                    fut.cancel()
                    self._reply(504, {"error": f"timed out after {timeout_s}s"})
                    return
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
