"""Hardening tests: optimizer variants, z-loss, local-attention training,
mid-run resume with modified data, microbatch+TP combined."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dalle_mtf_tpu.train.optim import get_optimizer
from dalle_mtf_tpu.train.tasks import make_vae_task
from dalle_mtf_tpu.train.trainer import Trainer
from dalle_mtf_tpu.utils.config import Config

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def test_adafactor_path_trains():
    from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
    import optax

    cfg = DalleConfig(
        n_embd=32, text_vocab_size=40, image_vocab_size=16,
        text_seq_len=4, image_seq_len=4, n_layers=1, n_heads=2,
    )
    model = DALLE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    opt, sched = get_optimizer(
        Config.from_mapping(
            {"optimizer": "adafactor", "lr": 1e-2, "train_steps": 100, "warmup_steps": 0}
        )
    )
    st = opt.init(params)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, cfg.total_tokens)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(lambda q: model.loss(q, tokens, train=True)[0])(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    first = None
    for _ in range(25):
        params, st, loss = step(params, st)
        first = first or float(loss)
    assert float(loss) < first


def test_z_loss_config_flows_through():
    from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig

    cfg = DalleConfig(
        n_embd=32, text_vocab_size=40, image_vocab_size=16,
        text_seq_len=4, image_seq_len=4, n_layers=1, n_heads=2,
    )
    model = DALLE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.total_tokens)
    l0, _ = model.loss(params, tokens, train=False, z_loss=0.0)
    l1, _ = model.loss(params, tokens, train=False, z_loss=1.0)
    assert float(l1) != float(l0)


def test_local_attention_trains_and_differs_from_global():
    from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig

    common = dict(
        n_embd=32, text_vocab_size=40, image_vocab_size=16,
        text_seq_len=8, image_seq_len=24, n_layers=1, n_heads=2,
    )
    g = DALLE(DalleConfig(**common))
    l = DALLE(DalleConfig(**common, attention_type="local", local_attention_radius=4))
    params = g.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 57)
    lg, _ = g.loss(params, tokens, train=False)
    ll, _ = l.loss(params, tokens, train=False)
    assert float(lg) != float(ll)  # the window actually changes attention
    grads = jax.grad(lambda p: l.loss(p, tokens, train=True)[0])(params)
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(grads)
    )


def test_resume_after_partial_training(tmp_path):
    """Kill training at step 3 of 6 (simulated crash), resume, finish."""
    params_cfg = Config.from_mapping(
        {
            "config_name": "resume_test",
            "dataset": {"image_size": 8},
            "num_tokens": 16,
            "convblocks": [[1, 8]],
            "train_batch_size": 8,
            "train_steps": 3,
            "steps_per_checkpoint": 3,
            "lr": 1e-3,
            "warmup_steps": 0,
            "mesh_shape": "data:2",
            "layout": "batch_dim:data",
        }
    )
    _v, init_fn, loss_fn, _e, axes = make_vae_task(params_cfg)

    def batches():
        rng = np.random.RandomState(0)
        while True:
            yield {"image": np.asarray(rng.uniform(-1, 1, (8, 8, 8, 3)), np.float32)}

    t1 = Trainer(params_cfg, init_fn, loss_fn, axes, model_dir=str(tmp_path), seq_len=4)
    t1.run(batches(), jax.random.PRNGKey(0))
    t1.wait_for_checkpoints()
    assert t1.latest_step() == 3
    t1.close()

    cfg2 = Config.from_mapping({**params_cfg.to_dict(), "train_steps": 6})
    t2 = Trainer(cfg2, init_fn, loss_fn, axes, model_dir=str(tmp_path), seq_len=4)
    state = t2.run(batches(), jax.random.PRNGKey(0))
    assert int(jax.device_get(state["step"])) == 6
    t2.close()


def test_microbatching_combined_with_tp(tmp_path):
    """Grad accumulation and tensor parallelism compose."""
    from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig
    from dalle_mtf_tpu.train.tasks import make_dalle_task

    params = Config.from_mapping(
        {
            "config_name": "mbtp",
            "dataset": {"image_size": 16},
            "n_embd": 32,
            "text_vocab_size": 40,
            "image_vocab_size": 32,
            "text_seq_len": 8,
            "n_layers": 1,
            "n_heads": 2,
            "train_batch_size": 8,
            "train_steps": 1,
            "lr": 1e-3,
            "warmup_steps": 0,
            "tokens_per_mb_per_replica": 24,
            "mesh_shape": "data:4,model:2",
            "layout": "batch_dim:data,heads_dim:model,intermediate_expanded:model",
            "vae_params": {
                "dataset": {"image_size": 16},
                "num_tokens": 32,
                "convblocks": [[1, 8], [1, 16]],
            },
        }
    )
    vae_params = DiscreteVAE(VAEConfig.from_params(params["vae_params"])).init(
        jax.random.PRNGKey(7)
    )
    dalle, _v, init_fn, loss_fn, _e, axes = make_dalle_task(params)
    tr = Trainer(
        params, init_fn, loss_fn, axes, model_dir=str(tmp_path),
        seq_len=dalle.cfg.total_seq_len, frozen_params=vae_params,
    )
    assert tr.num_mb > 1
    rng = np.random.RandomState(0)
    batch = {
        "image": np.asarray(rng.uniform(-1, 1, (8, 16, 16, 3)), np.float32),
        "caption": np.asarray(rng.randint(0, 40, (8, 8)), np.int32),
    }
    state = tr.init_state(jax.random.PRNGKey(0))
    state, m = tr.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(jax.device_get(m["loss"])))
    tr.close()


def test_finite_stream_exhaustion_saves_tail(tmp_path):
    """A finite (non-repeating) data iterator that ends before train_steps
    must stop the run cleanly — completing the current chunk's log/ckpt
    bookkeeping and saving the trained tail — instead of raising
    StopIteration out of the next-chunk staging (which used to lose the
    boundary checkpoint; r5 review finding)."""
    import jax

    from dalle_mtf_tpu.train.tasks import make_vae_task
    from dalle_mtf_tpu.train.trainer import Trainer
    from dalle_mtf_tpu.utils.config import Config

    params_cfg = Config.from_mapping(
        {
            "config_name": "finite_stream",
            "dataset": {"image_size": 8},
            "num_tokens": 16,
            "convblocks": [[1, 8]],
            "train_batch_size": 8,
            "train_steps": 50,
            "steps_per_checkpoint": 50,
            "iterations": 4,  # device-loop chunks engage the staging path
            "lr": 1e-3,
            "warmup_steps": 0,
            "mesh_shape": "data:2",
            "layout": "batch_dim:data",
        }
    )
    _v, init_fn, loss_fn, _e, axes = make_vae_task(params_cfg)

    def finite_batches(n):
        rng = np.random.RandomState(0)
        for _ in range(n):
            yield {
                "image": np.asarray(
                    rng.uniform(-1, 1, (8, 8, 8, 3)), np.float32
                )
            }

    t = Trainer(
        params_cfg, init_fn, loss_fn, axes,
        model_dir=str(tmp_path), seq_len=4,
    )
    state = t.run(finite_batches(9), jax.random.PRNGKey(0))
    t.wait_for_checkpoints()
    # 1 (first single-step chunk) + 2 full chunks of 4 = 9 consumed; the
    # 10th next() raised -> run stopped at step 9 and saved the tail
    saved = t.latest_step()
    assert saved == 9, saved
    assert int(jax.device_get(state["step"])) == 9
    t.close()
