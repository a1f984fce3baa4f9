"""Sharded (tensor-parallel) sampling: generation with params sharded over a
data x model mesh must match unsharded generation exactly (greedy)."""

import jax
import jax.numpy as jnp
import numpy as np

from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
from dalle_mtf_tpu.parallel.mesh import build_mesh, parse_layout, shard_params
from dalle_mtf_tpu.sample import generate_image_tokens

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
