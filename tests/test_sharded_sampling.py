"""Sharded (tensor-parallel) sampling: generation with params sharded over a
data x model mesh must match unsharded generation exactly (greedy)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
from dalle_mtf_tpu.parallel.mesh import build_mesh, parse_layout, shard_params
from dalle_mtf_tpu.sample import generate_image_tokens

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = DalleConfig(
    n_embd=64,
    text_vocab_size=40,
    image_vocab_size=32,
    text_seq_len=8,
    image_seq_len=16,
    n_layers=2,
    n_heads=4,
)


def test_tp_sharded_generation_matches_unsharded():
    model = DALLE(CFG)
    params = model.init(jax.random.PRNGKey(0))
    text = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 40)

    ref = generate_image_tokens(model, params, text, jax.random.PRNGKey(2),
                                temperature=0.0)

    mesh = build_mesh("data:4,model:2")
    rules = parse_layout(
        "batch_dim:data,heads_dim:model,intermediate_expanded:model,vocab_dim:model"
    )
    sharded_params = shard_params(params, mesh, rules, model.logical_axes())
    assert "model" in str(sharded_params["layers"]["wq"].sharding.spec)
    out = generate_image_tokens(model, sharded_params, text, jax.random.PRNGKey(2),
                                temperature=0.0)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_int8_after_sharding_stays_sharded_and_generates():
    """sample_dalle --int8 shards first, then quantizes: the elementwise
    quantize must preserve the TP shardings (scales keepdims on the
    contracted axis) and generation must still work."""
    from dalle_mtf_tpu.quantize import quantize_layers_int8

    model = DALLE(CFG)
    params = model.init(jax.random.PRNGKey(0))
    text = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 40)
    ref = generate_image_tokens(model, params, text, jax.random.PRNGKey(2),
                                temperature=0.0)

    mesh = build_mesh("data:4,model:2")
    rules = parse_layout(
        "batch_dim:data,heads_dim:model,intermediate_expanded:model,vocab_dim:model"
    )
    sharded = shard_params(params, mesh, rules, model.logical_axes())
    q = quantize_layers_int8(sharded)
    # int8 weights and their scales keep the model-axis sharding
    for name in ("wq", "w_mlp1"):
        assert "model" in str(q["layers"][name].sharding.spec), name
        assert "model" in str(q["layers"][name + "_scale"].sharding.spec), name
    assert q["layers"]["wq"].dtype == jnp.int8
    out = generate_image_tokens(model, q, text, jax.random.PRNGKey(2),
                                temperature=0.0)
    # int8 is lossy; greedy tokens should still largely agree at tiny scale
    agreement = float(np.mean(np.asarray(ref) == np.asarray(out)))
    assert agreement > 0.5, f"int8+TP generation diverged (agreement {agreement})"


def test_tp_sharded_continuous_chunks_match_unsharded_greedy():
    """The continuous-batching executables (admit_rows masked prefill +
    decode_chunk per-row decode) under TP-sharded params must reproduce the
    unsharded whole-batch greedy tokens exactly — the per-row KV scatter
    and position-masked attention have to survive GSPMD partitioning."""
    from dalle_mtf_tpu.sample import admit_rows, decode_chunk

    model = DALLE(CFG)
    params = model.init(jax.random.PRNGKey(0))
    b = 4
    text = jax.random.randint(jax.random.PRNGKey(1), (b, 8), 0, 40)
    ref = generate_image_tokens(model, params, text, jax.random.PRNGKey(2),
                                temperature=0.0)

    mesh = build_mesh("data:4,model:2")
    rules = parse_layout(
        "batch_dim:data,heads_dim:model,intermediate_expanded:model,vocab_dim:model"
    )
    sharded = shard_params(params, mesh, rules, model.logical_axes())

    end = CFG.text_seq_len + CFG.image_seq_len
    cache = model.init_cache(b)
    # banded engine: continuous-path logits buffers cover the image band only
    logits = jnp.zeros((b, CFG.image_vocab_size), jnp.float32)
    positions = jnp.full((b,), end, jnp.int32)  # parked
    cache, logits, positions = admit_rows(
        model, sharded, cache, logits, positions,
        text.astype(jnp.int32), jnp.ones((b,), bool),
    )
    toks = [[] for _ in range(b)]
    rng = jax.random.PRNGKey(0)
    temps = jnp.zeros((b,), jnp.float32)   # greedy: rng-independent
    topks = jnp.zeros((b,), jnp.int32)
    # chunk 5 over 16 tokens: the last chunk runs with every row parked
    # part of the time (exercises the clamped-position writes)
    for _ in range(4):
        cache, logits, positions, rng, tokens, active = decode_chunk(
            model, sharded, cache, logits, positions, rng, temps, topks,
            chunk=5, k_max=8,
        )
        tokens, active = np.asarray(tokens), np.asarray(active)
        for i in range(b):
            toks[i].extend(tokens[active[:, i], i].tolist())
    got = np.asarray([t for t in toks])
    assert got.shape == (b, CFG.image_seq_len)
    np.testing.assert_array_equal(np.asarray(ref), got)
