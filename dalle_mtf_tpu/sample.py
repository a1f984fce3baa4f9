"""Text -> image sampling (the PREDICT path the reference never implemented —
every reference predict branch raises NotImplementedError, model_fns.py:
135-136, model_fns_tf.py:29-30, train_dalle.py:88-89).

Pipeline: tokenize caption -> DALLE prefill over the text prompt -> one
compiled ``lax.scan`` decoding image_seq_len tokens against the KV cache ->
VAE decode_tokens -> pixels in [0, 1].

TPU notes: the whole generation is a single jit'd program (one host
round-trip); logits are masked to the image-token band
[text_vocab_size, text_vocab_size + image_vocab_size) so the model can never
emit text/EOS tokens inside the image region; sampling supports temperature
and top-k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dalle_mtf_tpu.models.dalle import DALLE
from dalle_mtf_tpu.models.vae import DiscreteVAE


_NUCLEUS_K = 256  # candidate width for top_p when top_k doesn't supply one


def _nucleus_mask(vals, safe, top_p):
    """Keep-mask for nucleus sampling over a DESC-sorted candidate set
    ``vals`` [B, K]: keep candidate i while the cumulative probability of
    the candidates before it is < top_p (the first is always kept). The
    probabilities are the temperature-scaled softmax over the candidates —
    the same distribution the draw uses."""
    p = jax.nn.softmax(vals / safe, axis=-1)
    cum_excl = jnp.cumsum(p, axis=-1) - p
    return cum_excl < jnp.asarray(top_p, jnp.float32)[:, None]


def _sample_token(rng, logits, temperature, top_k: int, top_p=None):
    """temperature: TRACED f32 scalar or [B] vector (per-row sampling
    params never recompile; serving exploits this). temp <= 0 on a row
    means greedy/argmax for that row. top_k stays static (the partial
    reduce needs a static k) — serving buckets it into a small set of
    compiled executables. top_p (nucleus), when PRESENT, is a traced
    [B] vector applied over the top-k candidate set (or a 256-wide
    candidate set when top_k=0) — presence is the only static bit."""
    logits = logits.astype(jnp.float32)
    b = logits.shape[0]
    temp = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32), (b,)
    )[:, None]
    safe = jnp.maximum(temp, 1e-6)
    if top_p is not None:
        k_eff = min(top_k if top_k else _NUCLEUS_K, logits.shape[-1] - 1)
        vals, idxs = jax.lax.approx_max_k(logits, k_eff, recall_target=0.99)
        pvec = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))
        vals = jnp.where(_nucleus_mask(vals, safe, pvec), vals, -jnp.inf)
        choice = jax.random.categorical(rng, vals / safe, axis=-1)
        tok = jnp.take_along_axis(idxs, choice[..., None], axis=-1)[..., 0]
        greedy_c = jnp.argmax(logits, axis=-1)
        return jnp.where(temp[:, 0] <= 0.0, greedy_c, tok).astype(jnp.int32)
    if top_k:
        # approx_max_k uses the TPU's partial-reduce unit instead of a full
        # vocab sort — a full jax.lax.top_k sort was 27% of decode time at
        # dalle_coco scale (profiled). recall 0.99 is indistinguishable for
        # sampling. Clamp: banded logits can be narrower than a user top_k.
        top_k = min(top_k, logits.shape[-1])
        vals, idxs = jax.lax.approx_max_k(logits, top_k, recall_target=0.99)
        choice = jax.random.categorical(rng, vals / safe, axis=-1)
        tok = jnp.take_along_axis(idxs, choice[..., None], axis=-1)[..., 0]
        # greedy rows (temp <= 0) take the EXACT full-vocab argmax, not the
        # argmax of the approx candidate set: greedy means "the" argmax
        # sequence, and a ~1% per-step recall miss over 1024 steps would
        # silently diverge it from the top_k=0 greedy path (a full argmax
        # is one max-reduce, nothing like top_k's sort cost)
        greedy_c = jnp.argmax(logits, axis=-1)
        return jnp.where(temp[:, 0] <= 0.0, greedy_c, tok).astype(jnp.int32)
    sampled = jax.random.categorical(rng, logits / safe, axis=-1)
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(temp[:, 0] <= 0.0, greedy, sampled).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("dalle", "top_k"),
)
def generate_image_tokens(
    dalle: DALLE,
    params,
    text_tokens: jax.Array,
    rng: jax.Array,
    temperature=1.0,
    top_k: int = 0,
    top_p=None,
) -> jax.Array:
    """text_tokens i32[B, text_seq_len] -> image token ids i32[B, image_seq_len]
    (0-based within the VAE codebook, offset already removed).

    ``temperature`` (and ``top_p`` when given) are traced operands (float,
    f32 scalar, or per-row [B] vector) — changing them never recompiles;
    only a new ``top_k`` (or top_p presence) does."""
    cfg = dalle.cfg
    b = text_tokens.shape[0]
    t = cfg.text_seq_len
    lo = cfg.text_vocab_size
    hi = lo + cfg.image_vocab_size

    cache = dalle.init_cache(b)
    # band=(lo, hi): logits are computed ONLY over the image-token band —
    # exact (every other column would be band-masked to -inf here anyway)
    # and it drops the ~50k-wide head matvec + sampling reductions to
    # image_vocab_size per step (see DALLE._last_logits). Sampled indices
    # are band-relative; + lo recovers the combined-vocab token id.
    logits, cache = dalle.prefill(
        params, text_tokens.astype(jnp.int32), cache, band=(lo, hi)
    )

    def step(carry, pos):
        cache_, logits_, rng_ = carry
        rng_, sub = jax.random.split(rng_)
        tok = _sample_token(sub, logits_, temperature, top_k, top_p) + lo
        new_logits, cache_ = dalle.decode_step(
            params, cache_, tok, pos, band=(lo, hi)
        )
        return (cache_, new_logits, rng_), tok

    positions = jnp.arange(t, t + cfg.image_seq_len)
    (_, _, _), tokens = jax.lax.scan(step, (cache, logits, rng), positions)
    # scan stacks on the leading axis -> [image_seq_len, B]
    return tokens.T - lo


def _sample_token_rows(
    rng, logits, temperature, top_k_rows, k_max: int, top_p_rows=None
):
    """Per-row sampling with TRACED per-row ``top_k``/``top_p`` in one
    executable.

    ``lax.approx_max_k`` needs a static k, so the whole-batch samplers
    bucket top_k into one executable per value (serve.BatchingSampler).
    Continuous batching mixes requests with different top_k in ONE live
    batch, so bucketing is impossible — instead the static reduce runs at
    ``k_max`` and each row masks candidates by RANK (approx_max_k returns
    them sorted), which makes top_k a traced [B] vector: any k in
    [1, k_max] without recompiling. k=0 rows (untruncated) sample from the
    full-vocab categorical — unless that row also sets top_p < 1, which
    needs the sorted candidate set and uses the full k_max width. Nucleus
    (top_p) composes with the rank mask per row. temp <= 0 rows take the
    exact full argmax.
    """
    logits = logits.astype(jnp.float32)
    b = logits.shape[0]
    temp = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32), (b,)
    )[:, None]
    safe = jnp.maximum(temp, 1e-6)
    ks = jnp.broadcast_to(jnp.asarray(top_k_rows, jnp.int32), (b,))[:, None]
    ps = (
        jnp.ones((b,), jnp.float32)
        if top_p_rows is None
        else jnp.broadcast_to(jnp.asarray(top_p_rows, jnp.float32), (b,))
    )

    k_max = min(k_max, logits.shape[-1] - 1)
    vals, idxs = jax.lax.approx_max_k(logits, k_max, recall_target=0.99)
    rank = jnp.arange(k_max)[None, :]
    # a k=0 row with nucleus on still needs candidates: widen it to k_max
    k_eff = jnp.where((ks == 0) & (ps[:, None] < 1.0), k_max, ks)
    vals = jnp.where(rank < jnp.clip(k_eff, 1, k_max), vals, -jnp.inf)
    vals = jnp.where(_nucleus_mask(vals, safe, ps), vals, -jnp.inf)
    r_top, r_full = jax.random.split(rng)
    choice = jax.random.categorical(r_top, vals / safe, axis=-1)
    tok_topk = jnp.take_along_axis(idxs, choice[..., None], axis=-1)[..., 0]
    tok_full = jax.random.categorical(r_full, logits / safe, axis=-1)
    tok = jnp.where((ks[:, 0] == 0) & (ps >= 1.0), tok_full, tok_topk)
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(temp[:, 0] <= 0.0, greedy, tok).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("dalle", "chunk", "k_max"),
    donate_argnums=(2, 3, 4),  # cache, last_logits, positions round-trip
)
def decode_chunk(
    dalle: DALLE,
    params,
    cache: dict,
    last_logits: jax.Array,
    positions: jax.Array,
    rng: jax.Array,
    temperature: jax.Array,
    top_k_rows: jax.Array,
    chunk: int = 128,
    k_max: int = 256,
    top_p_rows=None,
):
    """``chunk`` decode steps of a continuously-batched generation.

    Each batch slot advances from its OWN position (rows are admitted at
    different times — see serve.ContinuousBatchingSampler); finished rows
    (position at the sequence end) park: they keep riding the executable
    (decode cost is weight-streaming-bound, idle rows are nearly free) but
    stop advancing, and their parked writes land on their own last cache
    slot, which the next occupant's prefill/decode overwrites before any
    read. Identical per-step math to ``generate_image_tokens``'s scan —
    greedy (temp<=0) outputs bit-match it.

    Returns (cache, last_logits, positions, rng, tokens i32[chunk, B]
    0-based image tokens, active bool[chunk, B] marking which emissions
    are real).
    """
    cfg = dalle.cfg
    t = cfg.text_seq_len
    lo = cfg.text_vocab_size
    hi = lo + cfg.image_vocab_size
    end_pos = t + cfg.image_seq_len

    def step(carry, _):
        cache_, logits_, pos_, rng_ = carry
        rng_, sub = jax.random.split(rng_)
        active = pos_ < end_pos
        # logits ride band=(lo, hi) throughout the continuous engine (the
        # admit_rows prefill produces them banded too): sampled indices are
        # already 0-based image tokens; + lo feeds the combined-vocab
        # embedding in the decode step.
        tok = _sample_token_rows(
            sub, logits_, temperature, top_k_rows, k_max, top_p_rows
        )
        pos_used = jnp.minimum(pos_, end_pos - 1)
        new_logits, cache_ = dalle.decode_step_rows(
            params, cache_, tok + lo, pos_used, band=(lo, hi)
        )
        new_pos = pos_ + active.astype(pos_.dtype)
        return (cache_, new_logits, new_pos, rng_), (tok, active)

    (cache, last_logits, positions, rng), (tokens, active) = jax.lax.scan(
        step, (cache, last_logits, positions, rng), None, length=chunk
    )
    return cache, last_logits, positions, rng, tokens, active


@functools.partial(
    jax.jit,
    static_argnames=("dalle",),
    donate_argnums=(2, 3, 4),
)
def admit_rows(
    dalle: DALLE,
    params,
    cache: dict,
    last_logits: jax.Array,
    positions: jax.Array,
    texts: jax.Array,
    mask: jax.Array,
):
    """Admit new requests into the masked slots of a live continuous batch:
    prefill their prompts (fixed-shape full-batch pass, one executable),
    merge k/v + logits + positions only on ``mask`` rows. Occupied rows are
    untouched. Logits are banded to the image-token vocabulary — the
    continuous engine's logits buffers are [B, image_vocab_size]."""
    cfg = dalle.cfg
    lo = cfg.text_vocab_size
    new_logits, cache = dalle.prefill_rows(
        params, texts, cache, mask, band=(lo, lo + cfg.image_vocab_size)
    )
    last_logits = jnp.where(mask[:, None], new_logits, last_logits)
    positions = jnp.where(
        mask, jnp.int32(dalle.cfg.text_seq_len), positions
    )
    return cache, last_logits, positions


def generate_images(
    dalle: DALLE,
    dalle_params,
    vae: DiscreteVAE,
    vae_params,
    text_tokens: jax.Array,
    rng: jax.Array,
    temperature=1.0,
    top_k: int = 0,
    top_p=None,
) -> jax.Array:
    """Full text->pixels path. Returns f32[B, H, W, C] in [0, 1].
    ``temperature``/``top_p`` may be per-row [B] vectors (traced; see
    generate_image_tokens)."""
    img_tokens = generate_image_tokens(
        dalle, dalle_params, text_tokens, rng,
        temperature=temperature, top_k=top_k, top_p=top_p,
    )
    return vae.decode_tokens(vae_params, img_tokens)
