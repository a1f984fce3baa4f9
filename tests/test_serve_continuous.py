"""Continuous batching (serve.ContinuousBatchingSampler + the per-row
decode path in models/dalle.py and sample.py).

The load-bearing correctness tool is GREEDY EQUIVALENCE: at temperature 0
the sampled sequence is rng-independent, so a request served through the
continuous engine — whatever slots it shares, whenever it was admitted —
must produce bit-identical image tokens to a solo run through the plain
whole-batch path (sample.generate_images). That pins the per-row cache
scatter, the per-row position/attention masks, the masked prefill merge,
and the slot-parking semantics all at once.
"""

import time
from concurrent.futures import wait

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig
from dalle_mtf_tpu.sample import generate_images
from dalle_mtf_tpu.serve import ContinuousBatchingSampler

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

# one convblock: the 8px VAE grid is 4x4 = 16 image tokens, matching
# image_seq_len (several chunks per image at chunk=3..4)
CFG = DalleConfig(
    n_embd=32, text_vocab_size=48, image_vocab_size=16,
    text_seq_len=4, image_seq_len=16, n_layers=2, n_heads=2,
)
VAE_PARAMS = {
    "dataset": {"image_size": 8},
    "num_tokens": 16,
    "convblocks": [[1, 8]],
}


@pytest.fixture(scope="module")
def models():
    dalle = DALLE(CFG)
    vae = DiscreteVAE(VAEConfig.from_params(VAE_PARAMS))
    return (
        dalle, dalle.init(jax.random.PRNGKey(0)),
        vae, vae.init(jax.random.PRNGKey(1)),
    )


def _solo_greedy(models, ids):
    dalle, dparams, vae, vparams = models
    return np.asarray(generate_images(
        dalle, dparams, vae, vparams,
        jnp.asarray([ids], jnp.int32), jax.random.PRNGKey(7),
        temperature=0.0, top_k=0,
    ))[0]


class TestGreedyEquivalence:
    def test_single_request_matches_whole_batch_path(self, models):
        dalle, dparams, vae, vparams = models
        s = ContinuousBatchingSampler(
            dalle, dparams, vae, vparams,
            batch_size=2, temperature=0.0, top_k=0, chunk=4, k_max=8,
        )
        try:
            ids = [1, 2, 3, 0]
            got = s.submit(ids, n=1, temperature=0.0).result(timeout=240)[0]
            np.testing.assert_array_equal(got, _solo_greedy(models, ids))
        finally:
            s.close()

    def test_staggered_admission_matches_solo_runs(self, models):
        """A request admitted while its neighbor is mid-generation (slots at
        different positions) must still reproduce its solo greedy image —
        per-row positions can't leak across slots."""
        dalle, dparams, vae, vparams = models
        # chunk (3) does not divide image_seq_len (16): rows finish
        # mid-chunk and park, neighbors keep decoding
        s = ContinuousBatchingSampler(
            dalle, dparams, vae, vparams,
            batch_size=2, temperature=0.0, top_k=0, chunk=3, k_max=8,
        )
        try:
            a_ids = [1, 2, 3, 0]
            b_ids = [4, 5, 6, 0]
            fa = s.submit(a_ids, n=1, temperature=0.0)
            time.sleep(0.5)  # let a's generation get under way
            fb = s.submit(b_ids, n=1, temperature=0.0)
            ga = fa.result(timeout=240)[0]
            gb = fb.result(timeout=240)[0]
            np.testing.assert_array_equal(ga, _solo_greedy(models, a_ids))
            np.testing.assert_array_equal(gb, _solo_greedy(models, b_ids))
        finally:
            s.close()

    def test_slot_reuse_after_finish_is_clean(self, models):
        """A slot vacated by a finished request (its parked writes land on
        its own last cache row) must serve the next occupant bit-exactly."""
        dalle, dparams, vae, vparams = models
        s = ContinuousBatchingSampler(
            dalle, dparams, vae, vparams,
            batch_size=1, temperature=0.0, top_k=0, chunk=4, k_max=8,
        )
        try:
            first = s.submit([9, 9, 9, 0], n=1).result(timeout=240)[0]
            second = s.submit([1, 2, 3, 0], n=1).result(timeout=240)[0]
            np.testing.assert_array_equal(
                first, _solo_greedy(models, [9, 9, 9, 0])
            )
            np.testing.assert_array_equal(
                second, _solo_greedy(models, [1, 2, 3, 0])
            )
        finally:
            s.close()


class TestEngineBehavior:
    def test_mixed_params_and_multi_image_groups(self, models):
        """Per-request temperature/top_k ride as traced vectors (one
        executable) and n>1 groups resolve with all rows."""
        dalle, dparams, vae, vparams = models
        s = ContinuousBatchingSampler(
            dalle, dparams, vae, vparams,
            batch_size=4, temperature=1.0, top_k=4, chunk=4, k_max=8,
        )
        try:
            futs = [
                s.submit([1, 0, 0, 0], n=2, temperature=0.7, top_k=3),
                s.submit([2, 0, 0, 0], n=1, temperature=0.0),
                s.submit([3, 0, 0, 0], n=1, top_k=0, top_p=0.9),
                s.submit([4, 0, 0, 0], n=2, temperature=1.3, top_k=8,
                         top_p=0.5),
            ]
            done, not_done = wait(futs, timeout=240)
            assert not not_done
            for f, n in zip(futs, (2, 1, 1, 2)):
                imgs = f.result()
                assert imgs.shape == (n, 8, 8, 3)
                assert np.isfinite(imgs).all()
        finally:
            s.close()

    def test_top_k_above_k_max_served_untruncated(self, models):
        dalle, dparams, vae, vparams = models
        s = ContinuousBatchingSampler(
            dalle, dparams, vae, vparams,
            batch_size=1, top_k=4, chunk=4, k_max=8,
        )
        try:
            assert s._effective_top_k(999) == 0  # wider, never narrower
            assert s._effective_top_k(8) == 8
            assert s._effective_top_k(0) == 0
            imgs = s.submit([1, 0, 0, 0], n=1, top_k=999).result(timeout=240)
            assert imgs.shape == (1, 8, 8, 3)
        finally:
            s.close()

    def test_validation_and_close(self, models):
        dalle, dparams, vae, vparams = models
        s = ContinuousBatchingSampler(
            dalle, dparams, vae, vparams, batch_size=2, chunk=4, k_max=8,
        )
        with pytest.raises(ValueError):
            s.submit([1, 2, 3], n=1)  # wrong text length
        with pytest.raises(ValueError):
            s.submit([1, 2, 3, 4], n=3)  # n > batch
        s.close()
        with pytest.raises(RuntimeError):
            s.submit([1, 2, 3, 4], n=1)


class TestCancellationAndStats:
    def test_cancelled_request_frees_slot(self, models):
        """A cancelled Future's slot is reaped at the next chunk boundary
        and its capacity serves the following request (the whole-batch
        engine runs every row to completion regardless)."""
        dalle, dparams, vae, vparams = models
        s = ContinuousBatchingSampler(
            dalle, dparams, vae, vparams,
            batch_size=1, temperature=0.0, top_k=0, chunk=4, k_max=8,
        )
        try:
            # warm the executables so timing is deterministic-ish
            s.submit([1, 0, 0, 0], n=1).result(timeout=240)
            f1 = s.submit([9, 9, 9, 0], n=1)
            f2 = s.submit([1, 2, 3, 0], n=1)  # queued behind f1 (1 slot)
            f1.cancel()
            got = f2.result(timeout=240)[0]
            np.testing.assert_array_equal(
                got, _solo_greedy(models, [1, 2, 3, 0])
            )
            # f1 either never ran (cancelled before admission) or was
            # reaped; either way it must not hold the slot or a result
            assert f1.cancelled()
        finally:
            s.close()

    def test_stats_counters(self, models):
        dalle, dparams, vae, vparams = models
        s = ContinuousBatchingSampler(
            dalle, dparams, vae, vparams, batch_size=2, chunk=4, k_max=8,
        )
        try:
            st = s.stats()
            assert st["engine"] == "continuous"
            assert st["slots_total"] == 2 and st["slots_busy"] == 0
            s.submit([1, 0, 0, 0], n=1).result(timeout=240)
            assert s.stats()["chunks_done"] >= 1
        finally:
            s.close()


def test_drain_serves_queued_then_stops(models):
    """drain(): queued requests (even beyond slot capacity) all resolve,
    then the worker exits; close() by contrast fails in-flight work."""
    dalle, dparams, vae, vparams = models
    s = ContinuousBatchingSampler(
        dalle, dparams, vae, vparams,
        batch_size=1, temperature=0.0, top_k=0, chunk=4, k_max=8,
    )
    f1 = s.submit([1, 2, 3, 0], n=1)
    f2 = s.submit([4, 5, 6, 0], n=1)  # queued behind f1 (one slot)
    s.drain(timeout=240)
    assert not s._worker.is_alive()
    assert f1.result(timeout=1).shape == (1, 8, 8, 3)
    assert f2.result(timeout=1).shape == (1, 8, 8, 3)
    with pytest.raises(RuntimeError):
        s.submit([1, 2, 3, 0], n=1)


def test_failure_with_multirow_group_resets_and_recovers(models):
    """A device failure while an n>1 group is in flight: the group's SHARED
    Future gets the error exactly once (a double set_exception would kill
    the worker), the engine resets, and the next request is served."""
    dalle, dparams, vae, vparams = models
    s = ContinuousBatchingSampler(
        dalle, dparams, vae, vparams,
        batch_size=2, temperature=0.0, top_k=0, chunk=4, k_max=8,
    )
    real = s._decode_chunk
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("boom")
        return real(*a, **kw)

    s._decode_chunk = flaky
    try:
        f = s.submit([1, 2, 3, 0], n=2)  # both slots share one Future
        with pytest.raises(RuntimeError, match="boom"):
            f.result(timeout=240)
        assert s._worker.is_alive()  # worker survived the failure
        got = s.submit([4, 5, 6, 0], n=1).result(timeout=240)[0]
        np.testing.assert_array_equal(got, _solo_greedy(models, [4, 5, 6, 0]))
    finally:
        s.close()


def test_http_server_over_continuous_engine(models):
    """make_server works unchanged over the continuous engine (same submit
    contract): /generate with per-request params, /stats, /healthz."""
    import json as json_mod
    import threading
    import urllib.request

    dalle, dparams, vae, vparams = models
    s = ContinuousBatchingSampler(
        dalle, dparams, vae, vparams, batch_size=2, chunk=4, k_max=8,
    )

    class Tok:
        pad_token_id = 47

        def encode(self, text):
            return [min(ord(c), 46) for c in text]

    from dalle_mtf_tpu.serve import make_server

    srv = make_server(s, Tok(), CFG.text_seq_len, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json_mod.dumps({
                "text": "ab", "n": 2, "temperature": 0.8,
                "top_k": 4, "top_p": 0.9,
            }).encode(),
        )
        with urllib.request.urlopen(req, timeout=240) as r:
            out = json_mod.loads(r.read())
        assert len(out["images"]) == 2
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as r:
            st = json_mod.loads(r.read())
        assert st["engine"] == "continuous"
    finally:
        srv.shutdown()
        s.close()
