import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig
from dalle_mtf_tpu.sample import generate_image_tokens, generate_images

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = DalleConfig(
    n_embd=32,
    text_vocab_size=40,
    image_vocab_size=32,
    text_seq_len=8,
    image_seq_len=16,
    n_layers=2,
    n_heads=2,
)
VCFG = VAEConfig(num_tokens=32, image_size=16, convblocks=((1, 8), (2, 16)))


def test_generated_tokens_in_codebook_range():
    model = DALLE(CFG)
    params = model.init(jax.random.PRNGKey(0))
    text = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 40)
    toks = generate_image_tokens(model, params, text, jax.random.PRNGKey(2))
    assert toks.shape == (2, 16)
    assert int(toks.min()) >= 0 and int(toks.max()) < CFG.image_vocab_size


def test_greedy_decode_matches_parallel_forward():
    """temperature=0 incremental decode must equal greedy rollout with the
    full parallel forward (KV-cache correctness end-to-end)."""
    model = DALLE(CFG)
    params = model.init(jax.random.PRNGKey(0))
    text = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, 40)

    toks = generate_image_tokens(
        model, params, text, jax.random.PRNGKey(2), temperature=0.0
    )

    # manual greedy rollout via the parallel forward
    lo = CFG.text_vocab_size
    hi = lo + CFG.image_vocab_size
    seq = text.astype(jnp.int32)
    out = []
    for _ in range(CFG.image_seq_len):
        logits = model.forward(params, seq, train=False)[:, -1]
        band = jnp.where(
            (jnp.arange(CFG.total_tokens) >= lo)
            & (jnp.arange(CFG.total_tokens) < hi),
            0.0, -jnp.inf,
        )
        tok = jnp.argmax(logits + band, -1).astype(jnp.int32)
        out.append(int(tok[0]) - lo)
        seq = jnp.concatenate([seq, tok[:, None]], axis=1)
    np.testing.assert_array_equal(np.asarray(toks[0]), np.asarray(out))


def test_generate_images_end_to_end():
    model = DALLE(CFG)
    vae = DiscreteVAE(VCFG)
    dp = model.init(jax.random.PRNGKey(0))
    vp = vae.init(jax.random.PRNGKey(1))
    text = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 40)
    imgs = generate_images(model, dp, vae, vp, text, jax.random.PRNGKey(3), top_k=8)
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(imgs)).all()


def test_local_attention_incremental_matches_parallel():
    """decode_step must apply the same local window as training attention
    (regression: decode used to attend globally for local models)."""
    cfg = DalleConfig(
        n_embd=32, text_vocab_size=40, image_vocab_size=32,
        text_seq_len=8, image_seq_len=16, n_layers=2, n_heads=2,
        attention_type="local", local_attention_radius=4,
    )
    model = DALLE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (2, cfg.total_seq_len), 0, cfg.total_tokens
    )
    full_logits = model.forward(params, tokens, train=False)

    cache = model.init_cache(batch=2)
    logits_p, cache = model.prefill(params, tokens[:, : cfg.text_seq_len], cache)
    np.testing.assert_allclose(
        np.asarray(logits_p),
        np.asarray(full_logits[:, cfg.text_seq_len - 1]),
        atol=2e-4,
    )
    for pos in range(cfg.text_seq_len, cfg.total_seq_len):
        logits_i, cache = model.decode_step(
            params, cache, tokens[:, pos], jnp.asarray(pos)
        )
        np.testing.assert_allclose(
            np.asarray(logits_i), np.asarray(full_logits[:, pos]),
            atol=2e-4, err_msg=f"pos={pos}",
        )


class TestTopP:
    """Nucleus sampling: a traced per-row top_p over the candidate set."""

    def _setup(self):
        model = DALLE(CFG)
        params = model.init(jax.random.PRNGKey(0))
        text = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 40)
        return model, params, text

    def test_top_p_one_is_identity_with_top_k(self):
        """top_p=1.0 keeps every candidate, so the draw (same rng, same
        candidate set) is bit-identical to the plain top_k path."""
        model, params, text = self._setup()
        plain = generate_image_tokens(
            model, params, text, jax.random.PRNGKey(2),
            temperature=1.0, top_k=4,
        )
        nucleus = generate_image_tokens(
            model, params, text, jax.random.PRNGKey(2),
            temperature=1.0, top_k=4, top_p=jnp.ones((2,)),
        )
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(nucleus))

    def test_tiny_top_p_is_greedy(self):
        """top_p -> 0 keeps only the top candidate: sampling at temp 1
        collapses to the greedy sequence (vocab is small enough here that
        the candidate reduce is exact)."""
        model, params, text = self._setup()
        greedy = generate_image_tokens(
            model, params, text, jax.random.PRNGKey(2), temperature=0.0
        )
        nucleus = generate_image_tokens(
            model, params, text, jax.random.PRNGKey(3),  # different rng!
            temperature=1.0, top_k=0, top_p=1e-6,
        )
        np.testing.assert_array_equal(np.asarray(greedy), np.asarray(nucleus))

    def test_per_row_top_p_mixes(self):
        """One row nucleus-tight (== its greedy row), one row wide open —
        one executable, per-row behavior."""
        model, params, text = self._setup()
        greedy = generate_image_tokens(
            model, params, text, jax.random.PRNGKey(2), temperature=0.0
        )
        mixed = generate_image_tokens(
            model, params, text, jax.random.PRNGKey(5),
            temperature=1.0, top_k=0, top_p=jnp.asarray([1e-6, 1.0]),
        )
        np.testing.assert_array_equal(
            np.asarray(greedy)[0], np.asarray(mixed)[0]
        )
        assert int(mixed.min()) >= 0 and int(mixed.max()) < CFG.image_vocab_size


def test_decode_unroll_matches_rolled(monkeypatch):
    """DALLE_TPU_DECODE_UNROLL must not change decode numerics: the greedy
    sequence from the rolled layer scan equals the fully-unrolled default."""
    model = DALLE(CFG)
    params = model.init(jax.random.PRNGKey(0))
    text = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 40)
    unrolled = generate_image_tokens(  # default: unroll="full"
        model, params, text, jax.random.PRNGKey(2), temperature=0.0
    )
    monkeypatch.setenv("DALLE_TPU_DECODE_UNROLL", "1")
    # the env knob is read at trace time; same-shape calls would otherwise
    # reuse the cached unrolled executable
    generate_image_tokens.clear_cache()
    try:
        rolled = generate_image_tokens(
            model, params, text, jax.random.PRNGKey(2), temperature=0.0
        )
    finally:
        generate_image_tokens.clear_cache()
    np.testing.assert_array_equal(np.asarray(rolled), np.asarray(unrolled))
