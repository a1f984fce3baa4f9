"""Driver-harness entry points as regression tests + model-parallel VAE.

dryrun_multichip is what the external driver runs to validate the multi-chip
path; keeping it in the suite means a refactor can't silently break it.
The model-parallel VAE test realizes the capability the reference's broken
train_vae.py documented (an mtf model-parallel VAE path, SURVEY §2 #10).
"""

import pytest
import jax
import numpy as np

from dalle_mtf_tpu.train.tasks import make_vae_task
from dalle_mtf_tpu.train.trainer import Trainer
from dalle_mtf_tpu.utils.config import Config

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def test_dryrun_multichip_entrypoint():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def _vae_params(mesh_shape, layout):
    return Config.from_mapping(
        {
            "config_name": "vae_tp",
            "dataset": {"image_size": 16},
            "num_tokens": 64,
            "convblocks": [[1, 8], [2, 16]],
            "train_batch_size": 8,
            "train_steps": 2,
            "lr": 1e-3,
            "warmup_steps": 0,
            "mesh_shape": mesh_shape,
            "layout": layout,
            "temp": 1.0,
        }
    )


def _run(params, tmp_path, tag):
    _v, init_fn, loss_fn, _e, axes = make_vae_task(params)
    tr = Trainer(
        params, init_fn, loss_fn, axes, model_dir=str(tmp_path / tag), seq_len=16
    )
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    losses = []
    for i in range(2):
        batch = {"image": np.asarray(rng.uniform(-1, 1, (8, 16, 16, 3)), np.float32)}
        state, m = tr.train_step(state, batch, jax.random.PRNGKey(5 + i))
        losses.append(float(jax.device_get(m["loss"])))
    final = jax.device_get(state["params"])
    tr.close()
    return losses, final


def test_model_parallel_vae_matches_data_parallel(tmp_path):
    """VAE with the codebook sharded over the model axis (tokens_dim:model)
    produces the same losses and updates as a 1-axis run — the capability
    the reference's broken mtf-VAE driver intended."""
    l1, p1 = _run(_vae_params("data:8", "batch_dim:data"), tmp_path, "dp")
    l2, p2 = _run(
        _vae_params("data:4,model:2", "batch_dim:data,tokens_dim:model"),
        tmp_path, "tp",
    )
    np.testing.assert_allclose(l1, l2, rtol=2e-5)
    # codebook really is sharded over the model axis in the TP run
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
