"""Ring attention wired into DALLE: a training step on a DP x SP (and
DP x SP x TP) mesh must match the single-device global-attention step —
ring attention computes the identical function, sharded over the sequence.
"""

import pytest
import jax
import numpy as np

from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig
from dalle_mtf_tpu.train.tasks import make_dalle_task
from dalle_mtf_tpu.train.trainer import Trainer
from dalle_mtf_tpu.utils.config import Config

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _params(mesh_shape, layout, attention_type):
    return Config.from_mapping(
        {
            "config_name": "ring_numerics",
            "model_type": "dalle",
            "dataset": {"image_size": 16},
            "n_embd": 64,
            "text_vocab_size": 40,
            "image_vocab_size": 32,
            "text_seq_len": 8,
            "n_layers": 2,
            "n_heads": 4,
            "attention_type": attention_type,
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


def _run_two_steps(params, tmp_path, tag):
    vae_cfg = VAEConfig.from_params(params["vae_params"])
    vae_params = DiscreteVAE(vae_cfg).init(jax.random.PRNGKey(7))
    dalle, _v, init_fn, loss_fn, _e, axes = make_dalle_task(params)
    trainer = Trainer(
        params, init_fn, loss_fn, axes,
        model_dir=str(tmp_path / tag), seq_len=dalle.cfg.total_seq_len,
        frozen_params=vae_params,
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


def _assert_same(ref, got):
    np.testing.assert_allclose(ref[0], got[0], rtol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref[1]), jax.tree_util.tree_leaves(got[1])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_ring_dp_sp_matches_single_device(tmp_path):
    """2-way data x 4-way sequence mesh (total_seq 24 -> 6 rows/shard)."""
    ref = _run_two_steps(
        _params("data:1", "batch_dim:data", "global"), tmp_path, "single"
    )
    got = _run_two_steps(
        _params("data:2,seq:4", "batch_dim:data,total_seq_dim:seq", "ring"),
        tmp_path,
        "ring",
    )
    _assert_same(ref, got)


def test_ring_dp_sp_tp_matches_single_device(tmp_path):
    """All three parallelisms composed: data:2 x seq:2 x model:2."""
    ref = _run_two_steps(
        _params("data:1", "batch_dim:data", "global"), tmp_path, "single3"
    )
    got = _run_two_steps(
        _params(
            "data:2,seq:2,model:2",
            "batch_dim:data,total_seq_dim:seq,heads_dim:model,"
            "intermediate_expanded:model,vocab_dim:model",
            "ring",
        ),
        tmp_path,
        "ring3",
    )
    _assert_same(ref, got)


def test_ring_falls_back_without_mesh():
    """Outside any mesh context a ring-configured model still computes —
    routed through the single-device fused kernel (needed for sampling)."""
    from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig

    cfg_ring = DalleConfig(
        n_embd=64, text_vocab_size=40, image_vocab_size=32,
        text_seq_len=8, image_seq_len=16, n_layers=2, n_heads=4,
        attention_type="ring",
    )
    cfg_global = DalleConfig(
        n_embd=64, text_vocab_size=40, image_vocab_size=32,
        text_seq_len=8, image_seq_len=16, n_layers=2, n_heads=4,
    )
    params = DALLE(cfg_global).init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (2, cfg_ring.total_seq_len), 0,
        cfg_ring.total_tokens, dtype=np.int32,
    )
    l_ring, _ = DALLE(cfg_ring).loss(params, tokens, train=False)
    l_glob, _ = DALLE(cfg_global).loss(params, tokens, train=False)
    np.testing.assert_allclose(float(l_ring), float(l_glob), rtol=1e-5)
