import itertools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dalle_mtf_tpu.train.optim import decay_mask, get_optimizer, lr_schedule
from dalle_mtf_tpu.train.tasks import make_dalle_task, make_vae_task
from dalle_mtf_tpu.train.trainer import Trainer, num_microbatches
from dalle_mtf_tpu.utils.config import Config

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


class TestLRSchedule:
    def test_cosine_with_warmup_reference_semantics(self):
        p = Config.from_mapping(
            {"lr": 1e-3, "train_steps": 1000, "warmup_steps": 100, "lr_decay": "cosine"}
        )
        sched = lr_schedule(p)
        # during warmup: decayed lr * step/warmup (optimizers.py:62-76)
        assert float(sched(jnp.asarray(0))) == pytest.approx(0.0)
        lr50 = float(sched(jnp.asarray(50)))
        frac = 50 / 1000
        cosine = 0.5 * (1 + np.cos(np.pi * frac))
        expected = 1e-3 * (0.9 * cosine + 0.1) * 0.5
        assert lr50 == pytest.approx(expected, rel=1e-5)
        # end of schedule: alpha=0.1 floor
        assert float(sched(jnp.asarray(1000))) == pytest.approx(1e-4, rel=1e-5)

    def test_linear_decay_to_ten_percent(self):
        p = Config.from_mapping(
            {"lr": 1e-3, "train_steps": 1000, "warmup_steps": 0, "lr_decay": "linear"}
        )
        sched = lr_schedule(p)
        assert float(sched(jnp.asarray(0))) == pytest.approx(1e-3)
        assert float(sched(jnp.asarray(500))) == pytest.approx(1e-3 * 0.55)
        assert float(sched(jnp.asarray(1000))) == pytest.approx(1e-4)
        assert float(sched(jnp.asarray(5000))) == pytest.approx(1e-4)


def test_decay_mask_excludes_norm_and_bias():
    params = {
        "wte": jnp.zeros((4, 4)),
        "layers": {
            "ln1_g": jnp.zeros((2, 4)),
            "wq": jnp.zeros((2, 4, 2, 2)),
            "o_b": jnp.zeros((2, 4)),
            "b_mlp1": jnp.zeros((2, 8)),
        },
        "codebook": jnp.zeros((4, 8)),
        "encoder": {"block_0": {"down": {"w": jnp.zeros((4, 4, 3, 8)), "b": jnp.zeros((8,))}}},
    }
    mask = decay_mask(params)
    assert mask["wte"] and mask["codebook"]
    assert mask["layers"]["wq"]
    assert not mask["layers"]["ln1_g"]
    assert not mask["layers"]["o_b"]
    assert not mask["layers"]["b_mlp1"]
    assert mask["encoder"]["block_0"]["down"]["w"]
    assert not mask["encoder"]["block_0"]["down"]["b"]


def test_num_microbatches():
    p = Config.from_mapping({"tokens_per_mb_per_replica": 1024})
    # 32 batch / 8 replicas = 4/replica * 512 tokens = 2048 tokens -> 2 mbs
    assert num_microbatches(p, 32, 512, 8) == 2
    assert num_microbatches(Config(), 32, 512, 8) == 1
    # must divide global batch
    p2 = Config.from_mapping({"tokens_per_mb_per_replica": 700})
    n = num_microbatches(p2, 32, 512, 8)
    assert 32 % n == 0 and n >= 3


VAE_PARAMS = Config.from_mapping(
    {
        "config_name": "vae_tiny_test",
        "model_type": "vae",
        "dataset": {"image_size": 16},
        "num_tokens": 32,
        "convblocks": [[1, 8], [1, 16]],
        "n_channels": 3,
        "train_batch_size": 8,
        "eval_batch_size": 8,
        "train_steps": 6,
        "steps_per_checkpoint": 3,
        "lr": 1e-3,
        "warmup_steps": 0,
        "mesh_shape": "data:8",
        "layout": "batch_dim:data",
        "temp": 1.0,
    }
)


def _vae_batches(key=0):
    rng = np.random.RandomState(key)
    while True:
        yield {
            "image": jnp.asarray(
                rng.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)
            )
        }


class TestTrainerVAE:
    def test_train_checkpoint_resume(self, tmp_path):
        _vae, init_fn, loss_fn, eval_loss_fn, axes = make_vae_task(VAE_PARAMS)
        trainer = Trainer(
            VAE_PARAMS, init_fn, loss_fn, axes,
            model_dir=str(tmp_path / "m"), seq_len=16,
            eval_loss_fn=eval_loss_fn,
        )
        state = trainer.run(_vae_batches(), jax.random.PRNGKey(0))
        assert int(jax.device_get(state["step"])) == 6
        trainer.wait_for_checkpoints()
        assert trainer.latest_step() == 6
        trainer.close()

        # resume: a fresh trainer restores step 6 and continues to 8
        params2 = Config.from_mapping({**VAE_PARAMS.to_dict(), "train_steps": 8})
        trainer2 = Trainer(
            params2, init_fn, loss_fn, axes,
            model_dir=str(tmp_path / "m"), seq_len=16,
        )
        state2 = trainer2.run(_vae_batches(), jax.random.PRNGKey(0))
        assert int(jax.device_get(state2["step"])) == 8
        trainer2.close()

    def test_eval_metrics_psnr_and_codebook_perplexity(self, tmp_path):
        """VAE eval exposes reconstruction PSNR and codebook perplexity
        (VQ-health observability beyond the reference's loss-only
        metric_fn, model_fns_tf.py:80-96)."""
        _vae, init_fn, loss_fn, eval_loss_fn, axes = make_vae_task(VAE_PARAMS)
        trainer = Trainer(
            VAE_PARAMS, init_fn, loss_fn, axes,
            model_dir=str(tmp_path / "m2"), seq_len=16,
            eval_loss_fn=eval_loss_fn,
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        metrics = trainer.eval_step(
            state, next(_vae_batches()), jax.random.PRNGKey(1)
        )
        psnr = float(jax.device_get(metrics["psnr"]))
        perp = float(jax.device_get(metrics["codebook_perplexity"]))
        ffd = float(jax.device_get(metrics["frechet_feature_distance"]))
        num_tokens = VAE_PARAMS["num_tokens"]
        assert 0.0 < psnr < 60.0, psnr  # untrained: low but finite
        assert 1.0 <= perp <= num_tokens + 1e-3, (perp, num_tokens)
        assert ffd > 0.0 and np.isfinite(ffd), ffd  # untrained recon != real
        trainer.close()

    def test_batch_is_sharded_over_data_axis(self, tmp_path):
        _vae, init_fn, loss_fn, _e, axes = make_vae_task(VAE_PARAMS)
        trainer = Trainer(
            VAE_PARAMS, init_fn, loss_fn, axes,
            model_dir=str(tmp_path / "m"), seq_len=16,
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = next(_vae_batches())
        state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(jax.device_get(metrics["loss"])))
        trainer.close()


DALLE_PARAMS = Config.from_mapping(
    {
        "config_name": "dalle_tiny_test",
        "model_type": "dalle",
        "dataset": {"image_size": 16},
        "n_embd": 32,
        "text_vocab_size": 40,
        "image_vocab_size": 32,
        "text_seq_len": 8,
        "n_layers": 2,
        "n_heads": 2,
        "train_batch_size": 8,
        "train_steps": 2,
        "steps_per_checkpoint": 100,
        "lr": 1e-3,
        "warmup_steps": 0,
        "mesh_shape": "data:4,model:2",
        "layout": "batch_dim:data,heads_dim:model,intermediate_expanded:model,vocab_dim:model",
        "vae_params": {
            "dataset": {"image_size": 16},
            "num_tokens": 32,
            "convblocks": [[1, 8], [1, 16]],
        },
    }
)


def _dalle_batches():
    rng = np.random.RandomState(0)
    while True:
        yield {
            "image": jnp.asarray(rng.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)),
            "caption": jnp.asarray(rng.randint(0, 40, (8, 8)).astype(np.int32)),
        }


class TestTrainerDalle:
    def test_model_parallel_train_step(self, tmp_path):
        """DALLE trains on a 2-D (data x model) mesh with TP layout rules."""
        from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig

        vae_cfg = VAEConfig.from_params(DALLE_PARAMS["vae_params"])
        vae_params = DiscreteVAE(vae_cfg).init(jax.random.PRNGKey(7))
        dalle, _vae, init_fn, loss_fn, eval_fn, axes = make_dalle_task(DALLE_PARAMS)
        trainer = Trainer(
            DALLE_PARAMS, init_fn, loss_fn, axes,
            model_dir=str(tmp_path / "d"), seq_len=dalle.cfg.total_seq_len,
            frozen_params=vae_params, eval_loss_fn=eval_fn,
        )
        # wq is sharded over the model axis on its heads dim
        state = trainer.init_state(jax.random.PRNGKey(0))
        wq_sharding = state["params"]["layers"]["wq"].sharding
        assert "model" in str(wq_sharding.spec)

        batches = _dalle_batches()
        state, m1 = trainer.train_step(state, next(batches), jax.random.PRNGKey(1))
        state, m2 = trainer.train_step(state, next(batches), jax.random.PRNGKey(2))
        assert np.isfinite(float(jax.device_get(m2["loss"])))
        assert int(jax.device_get(state["step"])) == 2
        trainer.close()

    def test_grad_accumulation_matches_single_batch(self, tmp_path):
        """num_microbatches=2 produces the same update as one full batch
        (loss has no rng dependence when dropout is off)."""
        from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig

        vae_cfg = VAEConfig.from_params(DALLE_PARAMS["vae_params"])
        vae_params = DiscreteVAE(vae_cfg).init(jax.random.PRNGKey(7))
        dalle, _v, init_fn, loss_fn, _e, axes = make_dalle_task(DALLE_PARAMS)

        base = DALLE_PARAMS.to_dict()
        p_mb = Config.from_mapping(
            {**base, "tokens_per_mb_per_replica": dalle.cfg.total_seq_len}
        )
        t1 = Trainer(
            DALLE_PARAMS, init_fn, loss_fn, axes,
            model_dir=str(tmp_path / "a"), seq_len=dalle.cfg.total_seq_len,
            frozen_params=vae_params,
        )
        t2 = Trainer(
            p_mb, init_fn, loss_fn, axes,
            model_dir=str(tmp_path / "b"), seq_len=dalle.cfg.total_seq_len,
            frozen_params=vae_params,
        )
        assert t1.num_mb == 1 and t2.num_mb > 1

        batch = next(_dalle_batches())
        s1 = t1.init_state(jax.random.PRNGKey(0))
        s2 = t2.init_state(jax.random.PRNGKey(0))
        s1, m1 = t1.train_step(s1, batch, jax.random.PRNGKey(1))
        s2, m2 = t2.train_step(s2, batch, jax.random.PRNGKey(1))
        np.testing.assert_allclose(
            float(jax.device_get(m1["loss"])), float(jax.device_get(m2["loss"])),
            rtol=1e-4,
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(s1["params"]),
            jax.tree_util.tree_leaves(s2["params"]),
        ):
            np.testing.assert_allclose(
                np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b)),
                atol=1e-5,
            )
        t1.close()
        t2.close()


class TestDeviceLoop:
    def test_train_multi_matches_sequential_steps(self, tmp_path):
        """K steps in one compiled device loop (train_multi — the
        reference's iterations_per_loop) reproduce K sequential train_step
        calls exactly: same folded rngs, same final params."""
        from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig

        vae_cfg = VAEConfig.from_params(DALLE_PARAMS["vae_params"])
        vae_params = DiscreteVAE(vae_cfg).init(jax.random.PRNGKey(7))
        dalle, _v, init_fn, loss_fn, _e, axes = make_dalle_task(DALLE_PARAMS)

        def mk(tag):
            return Trainer(
                DALLE_PARAMS, init_fn, loss_fn, axes,
                model_dir=str(tmp_path / tag), seq_len=dalle.cfg.total_seq_len,
                frozen_params=vae_params,
            )

        gen = _dalle_batches()
        batches = [next(gen) for _ in range(4)]
        rng_base = jax.random.PRNGKey(5)

        t1 = mk("seq")
        s1 = t1.init_state(jax.random.PRNGKey(0))
        for i, b in enumerate(batches):
            s1, m1 = t1.train_step(s1, b, jax.random.fold_in(rng_base, i))

        t2 = mk("multi")
        s2 = t2.init_state(jax.random.PRNGKey(0))
        s2, m2 = t2.train_multi(s2, batches, rng_base)

        assert int(jax.device_get(s2["step"])) == 4
        np.testing.assert_allclose(
            float(jax.device_get(m1["loss"])),
            float(jax.device_get(m2["loss"])), rtol=1e-5,
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(s1["params"]),
            jax.tree_util.tree_leaves(s2["params"]),
        ):
            np.testing.assert_allclose(
                np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b)),
                atol=1e-6,
            )
        t1.close()
        t2.close()

    def test_run_with_iterations_matches_single_step_loop(self, tmp_path):
        """Trainer.run honoring "iterations" (device-loop chunks) lands on
        the same final params as the per-step loop."""
        from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig

        vae_cfg = VAEConfig.from_params(DALLE_PARAMS["vae_params"])
        vae_params = DiscreteVAE(vae_cfg).init(jax.random.PRNGKey(7))
        dalle, _v, init_fn, loss_fn, _e, axes = make_dalle_task(DALLE_PARAMS)
        base = DALLE_PARAMS.to_dict()

        def run_with(iterations, tag):
            p = Config.from_mapping(
                {**base, "train_steps": 6, "steps_per_checkpoint": 6,
                 "log_every": 3, "iterations": iterations}
            )
            tr = Trainer(
                p, init_fn, loss_fn, axes,
                model_dir=str(tmp_path / tag), seq_len=dalle.cfg.total_seq_len,
                frozen_params=vae_params,
            )
            state = tr.run(_dalle_batches(), jax.random.PRNGKey(0))
            out = jax.device_get(state["params"])
            tr.close()
            return out

        p_single = run_with(1, "it1")
        p_multi = run_with(3, "it3")
        for a, b in zip(
            jax.tree_util.tree_leaves(p_single),
            jax.tree_util.tree_leaves(p_multi),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_device_loop_byte_gate_falls_back_to_per_step(
        self, tmp_path, monkeypatch
    ):
        """iterations>1 with batches whose staged super-batch would exceed
        device_loop_max_stage_mb must run per-step dispatch (the measured
        fastest form for bulky image batches — BENCH.md r5 real-trainer
        table), never train_multi."""
        from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig
        from dalle_mtf_tpu.train.trainer import Trainer as T

        vae_cfg = VAEConfig.from_params(DALLE_PARAMS["vae_params"])
        vae_params = DiscreteVAE(vae_cfg).init(jax.random.PRNGKey(7))
        dalle, _v, init_fn, loss_fn, _e, axes = make_dalle_task(DALLE_PARAMS)
        p = Config.from_mapping(
            {**DALLE_PARAMS.to_dict(), "train_steps": 4,
             "steps_per_checkpoint": 4, "log_every": 2, "iterations": 2,
             # tiny threshold: even the smoke batches exceed it
             "device_loop_max_stage_mb": 1e-6}
        )
        tr = Trainer(
            p, init_fn, loss_fn, axes,
            model_dir=str(tmp_path / "gate"),
            seq_len=dalle.cfg.total_seq_len, frozen_params=vae_params,
        )

        def boom(*a, **kw):
            raise AssertionError("train_multi must not run past the gate")

        monkeypatch.setattr(tr, "train_multi", boom)
        monkeypatch.setattr(T, "train_multi", boom, raising=True)
        state = tr.run(_dalle_batches(), jax.random.PRNGKey(0))
        assert int(jax.device_get(state["step"])) == 4
        tr.close()


class TestAuxMetrics:
    def test_aux_survives_microbatching(self, tmp_path):
        """Train-step aux scalars (loss_text/loss_image) must be reported
        both with and without grad accumulation, and agree between the two
        (microbatch aux is accumulated in the scan carry and averaged)."""
        from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig

        vae_cfg = VAEConfig.from_params(DALLE_PARAMS["vae_params"])
        vae_params = DiscreteVAE(vae_cfg).init(jax.random.PRNGKey(7))
        dalle, _v, init_fn, loss_fn, _e, axes = make_dalle_task(DALLE_PARAMS)
        p_mb = Config.from_mapping(
            {**DALLE_PARAMS.to_dict(),
             "tokens_per_mb_per_replica": dalle.cfg.total_seq_len}
        )
        t1 = Trainer(
            DALLE_PARAMS, init_fn, loss_fn, axes,
            model_dir=str(tmp_path / "a"), seq_len=dalle.cfg.total_seq_len,
            frozen_params=vae_params,
        )
        t2 = Trainer(
            p_mb, init_fn, loss_fn, axes,
            model_dir=str(tmp_path / "b"), seq_len=dalle.cfg.total_seq_len,
            frozen_params=vae_params,
        )
        assert t2.num_mb > 1
        batch = next(_dalle_batches())
        s1 = t1.init_state(jax.random.PRNGKey(0))
        s2 = t2.init_state(jax.random.PRNGKey(0))
        _, m1 = t1.train_step(s1, batch, jax.random.PRNGKey(1))
        _, m2 = t2.train_step(s2, batch, jax.random.PRNGKey(1))
        for key in ("loss_text", "loss_image"):
            assert key in m1 and key in m2
            np.testing.assert_allclose(
                float(jax.device_get(m1[key])), float(jax.device_get(m2[key])),
                rtol=1e-4,
            )
        t1.close()
        t2.close()

    def test_eval_metrics_include_accuracy(self, tmp_path):
        from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig

        vae_cfg = VAEConfig.from_params(DALLE_PARAMS["vae_params"])
        vae_params = DiscreteVAE(vae_cfg).init(jax.random.PRNGKey(7))
        _d, _v, init_fn, loss_fn, eval_loss_fn, axes = make_dalle_task(
            DALLE_PARAMS
        )
        trainer = Trainer(
            DALLE_PARAMS, init_fn, loss_fn, axes,
            model_dir=str(tmp_path / "m"), seq_len=_d.cfg.total_seq_len,
            frozen_params=vae_params, eval_loss_fn=eval_loss_fn,
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        em = trainer.eval_step(state, next(_dalle_batches()), jax.random.PRNGKey(1))
        for key in ("loss", "loss_text", "loss_image", "acc", "acc_image"):
            assert key in em, key
        acc = float(jax.device_get(em["acc"]))
        assert 0.0 <= acc <= 1.0
        trainer.close()


class TestPredictEveryCheckpoint:
    def test_predict_hook_writes_images(self, tmp_path):
        """predict_steps > 0 samples golden-caption images at every
        checkpoint (the surface the reference left as NotImplementedError,
        reference train_dalle.py:88-89): PNGs + prompts land under
        <model_path>/predict/step_<N>/ and TB gets the grids."""
        import glob

        from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig
        from dalle_mtf_tpu.train.predict import make_predict_summary_fn

        params = Config.from_mapping(
            {
                **{k: DALLE_PARAMS[k] for k in (
                    "config_name", "model_type", "dataset", "n_embd",
                    "text_vocab_size", "image_vocab_size", "text_seq_len",
                    "n_layers", "n_heads", "train_batch_size", "lr",
                    "warmup_steps", "mesh_shape", "layout", "vae_params",
                )},
                "train_steps": 2,
                "steps_per_checkpoint": 2,
                "predict_steps": 1,
                "predict_batch_size": 2,
                "predict_top_k": 8,
                "model_path": str(tmp_path / "m"),
            }
        )
        vae_cfg = VAEConfig.from_params(params["vae_params"])
        vae = DiscreteVAE(vae_cfg)
        vae_params = vae.init(jax.random.PRNGKey(7))
        dalle, _v, init_fn, loss_fn, eval_fn, axes = make_dalle_task(params)
        trainer = Trainer(
            params, init_fn, loss_fn, axes,
            model_dir=params["model_path"], seq_len=dalle.cfg.total_seq_len,
            frozen_params=vae_params, eval_loss_fn=eval_fn,
        )
        predict_fn = make_predict_summary_fn(
            params, dalle, vae, vae_params, data_iter=_dalle_batches()
        )
        assert predict_fn is not None
        trainer.run(
            _dalle_batches(), jax.random.PRNGKey(0), summary_fn=predict_fn
        )
        trainer.close()
        pngs = sorted(
            glob.glob(str(tmp_path / "m" / "predict" / "step_*" / "*.png"))
        )
        assert len(pngs) == 2, pngs  # predict_batch_size rows, 1 batch
        prompts = glob.glob(
            str(tmp_path / "m" / "predict" / "step_*" / "prompts.txt")
        )
        assert len(prompts) == 1

    def test_hook_absent_without_predict_steps(self):
        from dalle_mtf_tpu.train.predict import make_predict_summary_fn

        assert (
            make_predict_summary_fn(
                DALLE_PARAMS, None, None, None, data_iter=iter(())
            )
            is None
        )


def test_keep_checkpoint_every_n_hours_option(tmp_path):
    """Reference parity: the sharded Saver kept one checkpoint per 2 hours
    exempt from max_to_keep eviction (model_fns.py:204-208) — orbax's
    keep_time_interval carries the same contract."""
    import datetime

    _vae, init_fn, loss_fn, _eval, axes = make_vae_task(VAE_PARAMS)
    params = Config.from_mapping(
        {**VAE_PARAMS.to_dict(), "keep_checkpoint_every_n_hours": 2}
    )
    trainer = Trainer(
        params, init_fn, loss_fn, axes,
        model_dir=str(tmp_path / "m"), seq_len=16,
    )
    opts = trainer.ckpt_mngr._options
    assert opts.keep_time_interval == datetime.timedelta(hours=2)
    assert opts.max_to_keep == 5
    trainer.close()

    trainer2 = Trainer(
        VAE_PARAMS, init_fn, loss_fn, axes,
        model_dir=str(tmp_path / "m2"), seq_len=16,
    )
    assert trainer2.ckpt_mngr._options.keep_time_interval is None
    trainer2.close()


def test_skip_nonfinite_updates_guards_params():
    """skip_nonfinite_updates=N: a NaN/inf gradient step leaves params and
    inner optimizer state untouched (skipped), finite steps apply normally
    — the production loss-spike guard the reference lacked (a single NaN
    batch would poison its whole parameter tree)."""
    p = Config.from_mapping(
        {"lr": 1e-2, "train_steps": 100, "warmup_steps": 0,
         "skip_nonfinite_updates": 3}
    )
    tx, _ = get_optimizer(p)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)

    bad = {"w": jnp.full((4,), jnp.nan)}
    updates, state = tx.update(bad, state, params)
    params_after_bad = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(
        np.asarray(params_after_bad["w"]), np.ones((4,))
    )
    assert int(state.notfinite_count) == 1

    good = {"w": jnp.full((4,), 0.5)}
    updates, state = tx.update(good, state, params_after_bad)
    params_after_good = optax.apply_updates(params_after_bad, updates)
    assert not np.allclose(np.asarray(params_after_good["w"]), np.ones((4,)))
    assert int(state.notfinite_count) == 0  # resets on a finite step


class TestFusedAdamW:
    """fused_optimizer: true — the single-pass clip+AdamW (optim.fused_adamw)
    must follow the optax chain's trajectory exactly (same clip scaling,
    bias correction, masked weight decay, schedule indexing), so a config
    can flip it on without changing training math."""

    P = {
        "lr": 3e-3, "train_steps": 50, "warmup_steps": 4,
        "weight_decay": 0.1, "gradient_clipping": 1.0,
    }

    def _tree(self, key, scale=1.0):
        ks = jax.random.split(key, 4)
        return {
            "w": jax.random.normal(ks[0], (8, 16)) * scale,
            "ln_g": jax.random.normal(ks[1], (16,)) * scale,  # no decay
            "bias": jax.random.normal(ks[2], (16,)) * scale,  # no decay
            "emb": jax.random.normal(ks[3], (32, 16)) * scale,
        }

    def _run(self, fused: bool, grad_scale: float):
        p = Config.from_mapping({**self.P, "fused_optimizer": fused})
        tx, _ = get_optimizer(p)
        params = self._tree(jax.random.PRNGKey(0))
        state = tx.init(params)
        traj = []
        for t in range(5):
            grads = self._tree(jax.random.PRNGKey(100 + t), grad_scale)
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
            traj.append(params)
        return traj

    @pytest.mark.parametrize("grad_scale", [0.01, 5.0])
    def test_matches_optax_chain(self, grad_scale):
        # 0.01: global norm under the clip (scale inactive); 5.0: clip active
        ref = self._run(False, grad_scale)
        fused = self._run(True, grad_scale)
        for pr, pf in zip(ref, fused):
            for k in pr:
                np.testing.assert_allclose(
                    np.asarray(pr[k]), np.asarray(pf[k]),
                    rtol=2e-6, atol=2e-7, err_msg=k,
                )

    def test_skip_nonfinite_composes(self):
        p = Config.from_mapping(
            {**self.P, "fused_optimizer": True, "skip_nonfinite_updates": 2}
        )
        tx, _ = get_optimizer(p)
        params = {"w": jnp.ones((4,))}
        state = tx.init(params)
        updates, state = tx.update({"w": jnp.full((4,), jnp.nan)}, state, params)
        np.testing.assert_array_equal(
            np.asarray(optax.apply_updates(params, updates)["w"]), np.ones((4,))
        )
        assert int(state.notfinite_count) == 1
