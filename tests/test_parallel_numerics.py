"""Model-parallel numerics: the same model must produce the same loss and
updates on a 1-device mesh and a data x model mesh (what mtf's layout
solver guaranteed implicitly — here it's GSPMD, so we verify)."""

import pytest
import jax
import numpy as np

from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig
from dalle_mtf_tpu.parallel.mesh import build_mesh
from dalle_mtf_tpu.train.tasks import make_dalle_task
from dalle_mtf_tpu.train.trainer import Trainer
from dalle_mtf_tpu.utils.config import Config

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _params(mesh_shape, layout):
    return Config.from_mapping(
        {
            "config_name": "tp_numerics",
            "model_type": "dalle",
            "dataset": {"image_size": 16},
            "n_embd": 64,
            "text_vocab_size": 40,
            "image_vocab_size": 32,
            "text_seq_len": 8,
            "n_layers": 2,
            "n_heads": 4,
            "train_batch_size": 8,
            "train_steps": 2,
            "lr": 1e-3,
            "warmup_steps": 0,
            "mesh_shape": mesh_shape,
            "layout": layout,
            "vae_params": {
                "dataset": {"image_size": 16},
                "num_tokens": 32,
                "convblocks": [[1, 8], [1, 16]],
            },
        }
    )


def _run_two_steps(params, tmp_path, tag, constrained=False):
    vae_cfg = VAEConfig.from_params(params["vae_params"])
    vae_params = DiscreteVAE(vae_cfg).init(jax.random.PRNGKey(7))
    constrain = None
    mesh = None
    if constrained:
        from dalle_mtf_tpu.parallel.mesh import make_constrain

        mesh, constrain = make_constrain(params)
    dalle, _v, init_fn, loss_fn, _e, axes = make_dalle_task(
        params, constrain=constrain
    )
    trainer = Trainer(
        params, init_fn, loss_fn, axes,
        model_dir=str(tmp_path / tag), seq_len=dalle.cfg.total_seq_len,
        frozen_params=vae_params, mesh=mesh,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    losses = []
    for i in range(2):
        batch = {
            "image": np.asarray(rng.uniform(-1, 1, (8, 16, 16, 3)), np.float32),
            "caption": np.asarray(rng.randint(0, 40, (8, 8)), np.int32),
        }
        state, m = trainer.train_step(state, batch, jax.random.PRNGKey(1 + i))
        losses.append(float(jax.device_get(m["loss"])))
    final = jax.device_get(state["params"])
    trainer.close()
    return losses, final


def test_tp_matches_single_device(tmp_path):
    l1, p1 = _run_two_steps(_params("data:1", "batch_dim:data"), tmp_path, "single")
    l2, p2 = _run_two_steps(
        _params(
            "data:4,model:2",
            "batch_dim:data,heads_dim:model,intermediate_expanded:model,vocab_dim:model",
        ),
        tmp_path,
        "tp",
    )
    np.testing.assert_allclose(l1, l2, rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


TP_LAYOUT = (
    "batch_dim:data,heads_dim:model,intermediate_expanded:model,"
    "vocab_dim:model"
)


def test_constrain_closure_binds_layout_rules():
    """make_constrain's closure must pin activations to the layout rules
    (the model's _block calls it on qkv/attention-out/residual tensors)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from dalle_mtf_tpu.models.dalle import BATCH, HEADS, KV, SEQ
    from dalle_mtf_tpu.parallel.mesh import make_constrain

    params = _params("data:4,model:2", TP_LAYOUT)
    mesh, constrain = make_constrain(params)
    q = jnp.zeros((8, 4, 16, 64))
    with mesh:
        out = jax.jit(lambda x: constrain(x, BATCH, HEADS, SEQ, KV))(q)
    assert out.sharding == NamedSharding(
        mesh, PartitionSpec("data", "model")
    ), f"constraint not bound: {out.sharding}"
    # non-divisible dims are skipped, not crashed (batch 3 on data:4)
    with mesh:
        out2 = jax.jit(lambda x: constrain(x, BATCH, HEADS, SEQ, KV))(
            jnp.zeros((3, 4, 16, 64))
        )
    assert out2.sharding.spec == PartitionSpec(None, "model")


def test_tp_constrained_matches_unconstrained(tmp_path):
    """Wired activation constraints must not change numerics — they only pin
    layouts GSPMD was free to choose (VERDICT r2: constraints now live)."""
    l1, p1 = _run_two_steps(
        _params("data:4,model:2", TP_LAYOUT), tmp_path, "free"
    )
    l2, p2 = _run_two_steps(
        _params("data:4,model:2", TP_LAYOUT), tmp_path, "pinned",
        constrained=True,
    )
    np.testing.assert_allclose(l1, l2, rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
