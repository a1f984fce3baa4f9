"""Batching inference serving (dalle_mtf_tpu/serve.py): queue batching
semantics, fixed-shape executable reuse, and the HTTP front end — all on a
tiny untrained model (serving correctness is independent of weights)."""

import json
import threading
import urllib.request
from concurrent.futures import wait

import jax
import numpy as np
import pytest

from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig
from dalle_mtf_tpu.serve import BatchingSampler, make_server

CFG = DalleConfig(
    n_embd=32, text_vocab_size=48, image_vocab_size=16,
    text_seq_len=4, image_seq_len=4, n_layers=1, n_heads=2,
)
VAE_PARAMS = {
    "dataset": {"image_size": 8},
    "num_tokens": 16,
    "convblocks": [[1, 8], [1, 8]],
}


@pytest.fixture(scope="module")
def sampler():
    dalle = DALLE(CFG)
    vae = DiscreteVAE(VAEConfig.from_params(VAE_PARAMS))
    s = BatchingSampler(
        dalle, dalle.init(jax.random.PRNGKey(0)),
        vae, vae.init(jax.random.PRNGKey(1)),
        batch_size=4, top_k=4, linger_ms=20.0,
    )
    yield s
    s.close()


class TestBatchingSampler:
    def test_single_request(self, sampler):
        imgs = sampler.submit([1, 2, 3, 0], n=2).result(timeout=120)
        assert imgs.shape == (2, 8, 8, 3)
        assert np.isfinite(imgs).all()
        assert imgs.min() >= 0.0 and imgs.max() <= 1.0

    def test_many_requests_batch_and_resolve(self, sampler):
        futs = [sampler.submit([i, 0, 0, 0], n=1) for i in range(7)]
        done, not_done = wait(futs, timeout=240)
        assert not not_done
        for f in done:
            assert f.result().shape == (1, 8, 8, 3)
        # 7 single-row requests at batch_size=4 must have shared batches
        assert sampler._batch_counter >= 2

    def test_bad_requests_rejected(self, sampler):
        with pytest.raises(ValueError):
            sampler.submit([1, 2, 3], n=1)  # wrong text length
        with pytest.raises(ValueError):
            sampler.submit([1, 2, 3, 4], n=99)  # n > batch


class TestHttpServer:
    def test_generate_and_health(self, sampler):
        class Tok:
            pad_token_id = 47

            def encode(self, text):
                return [min(ord(c), 46) for c in text]

        srv = make_server(sampler, Tok(), CFG.text_seq_len,
                          host="127.0.0.1", port=0)
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30
            ) as r:
                assert json.load(r)["status"] == "ok"

            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({"text": "ab", "n": 2}).encode(),
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=240) as r:
                out = json.load(r)
            assert len(out["images"]) == 2
            import base64
            png = base64.b64decode(out["images"][0])
            assert png[:8] == b"\x89PNG\r\n\x1a\n"

            bad = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({"n": 1}).encode(),
                method="POST",
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad, timeout=30)
            assert ei.value.code == 400
        finally:
            srv.shutdown()


class TestHoldbackOrdering:
    def test_oversize_request_seeds_next_batch(self):
        """A request that doesn't fit the in-flight batch must be served as
        the SEED of the next batch (arrival order), not requeued behind
        later arrivals."""
        dalle = DALLE(CFG)
        vae = DiscreteVAE(VAEConfig.from_params(VAE_PARAMS))
        s = BatchingSampler(
            dalle, dalle.init(jax.random.PRNGKey(0)),
            vae, vae.init(jax.random.PRNGKey(1)),
            batch_size=2, top_k=4, linger_ms=300.0,
        )
        try:
            order = []
            f1 = s.submit([1, 0, 0, 0], n=1)
            f2 = s.submit([2, 0, 0, 0], n=2)  # can't join f1's batch
            f3 = s.submit([3, 0, 0, 0], n=1)  # arrives after f2
            f2.add_done_callback(lambda _: order.append(2))
            f3.add_done_callback(lambda _: order.append(3))
            done, not_done = wait([f1, f2, f3], timeout=240)
            assert not not_done
            # f2 resolved in the batch BEFORE f3 (seeded, not requeued)
            assert order[0] == 2, order
        finally:
            s.close()
