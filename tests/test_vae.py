import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig, temperature_schedule
from dalle_mtf_tpu.utils.config import Config

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


CFG = VAEConfig(
    num_tokens=64,
    image_size=32,
    convblocks=((2, 16), (2, 32)),
    n_channels=3,
)


def _img(key, b=2, size=32):
    return jax.random.uniform(key, (b, size, size, 3), minval=-1.0, maxval=1.0)


class TestVAEShapes:
    def test_encoder_logits_shape(self):
        vae = DiscreteVAE(CFG)
        params = vae.init(jax.random.PRNGKey(0))
        logits = vae.encoder(params, _img(jax.random.PRNGKey(1)))
        # 32px / 2^2 blocks = 8x8 grid
        assert logits.shape == (2, 8, 8, 64)
        assert logits.dtype == jnp.float32

    def test_forward_loss_and_recon(self):
        vae = DiscreteVAE(CFG)
        params = vae.init(jax.random.PRNGKey(0))
        loss, recon = vae.forward(
            params, _img(jax.random.PRNGKey(1)), jax.random.PRNGKey(2),
            temperature=0.5, hard_gumbel=True,
        )
        assert loss.shape == ()
        assert np.isfinite(float(loss))
        assert recon.shape == (2, 32, 32, 3)

    def test_token_roundtrip_shapes(self):
        vae = DiscreteVAE(CFG)
        params = vae.init(jax.random.PRNGKey(0))
        tokens = vae.encode_tokens(params, _img(jax.random.PRNGKey(1)))
        assert tokens.shape == (2, 64)  # 8*8
        assert tokens.dtype == jnp.int32
        assert int(tokens.min()) >= 0 and int(tokens.max()) < 64
        imgs = vae.decode_tokens(params, tokens)
        assert imgs.shape == (2, 32, 32, 3)

    def test_image_seq_len_property(self):
        assert CFG.image_seq_len == 64
        coco = VAEConfig(
            num_tokens=2048, image_size=256,
            convblocks=((2, 128), (3, 256), (5, 512)),
        )
        assert coco.image_seq_len == 1024  # matches reference model_fns.py:68

    def test_stack_factor_space_to_depth(self):
        cfg = VAEConfig(
            num_tokens=32, image_size=32,
            convblocks=((1, 16),), stack_factor=2,
        )
        vae = DiscreteVAE(cfg)
        params = vae.init(jax.random.PRNGKey(0))
        loss, recon = vae.forward(
            params, _img(jax.random.PRNGKey(1)), jax.random.PRNGKey(2)
        )
        assert recon.shape == (2, 32, 32, 3)
        assert cfg.image_seq_len == (32 // 2 // 2) ** 2  # one conv block + s2d

    def test_bf16_policy_keeps_logits_fp32(self):
        cfg = VAEConfig(
            num_tokens=64, image_size=32,
            convblocks=((2, 16), (2, 32)), use_bf16=True,
        )
        vae = DiscreteVAE(cfg)
        params = vae.init(jax.random.PRNGKey(0))
        logits = vae.encoder(params, _img(jax.random.PRNGKey(1)))
        assert logits.dtype == jnp.float32

    def test_recompute_grad_same_values(self):
        img = _img(jax.random.PRNGKey(1))
        cfg_r = VAEConfig(
            num_tokens=64, image_size=32,
            convblocks=((2, 16), (2, 32)), recompute_grad=True,
        )
        params = DiscreteVAE(CFG).init(jax.random.PRNGKey(0))

        def loss_fn(vae_cfg):
            vae = DiscreteVAE(vae_cfg)
            return vae.forward(
                params, img, jax.random.PRNGKey(2), train=True
            )[0]

        g1 = jax.grad(lambda p: DiscreteVAE(CFG).forward(p, img, jax.random.PRNGKey(2), train=True)[0])(params)
        g2 = jax.grad(lambda p: DiscreteVAE(cfg_r).forward(p, img, jax.random.PRNGKey(2), train=True)[0])(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestVAETrains:
    def test_loss_decreases(self):
        """End-to-end convergence smoke: a tiny VAE overfits 4 images."""
        vae = DiscreteVAE(CFG)
        params = vae.init(jax.random.PRNGKey(0))
        img = _img(jax.random.PRNGKey(1), b=4)
        opt = optax.adam(3e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, rng):
            def loss_fn(p):
                return vae.forward(p, img, rng, temperature=1.0, train=True)[0]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        rng = jax.random.PRNGKey(3)
        first = None
        for i in range(60):
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step(params, opt_state, sub)
            if first is None:
                first = float(loss)
        assert float(loss) < first * 0.6, (first, float(loss))


def test_temperature_schedule_reference_semantics():
    p = Config.from_mapping({"temp_start": 1.0, "temp": 0.05, "temp_anneal_steps": 100})
    assert float(temperature_schedule(p, jnp.asarray(0))) == pytest.approx(1.0)
    assert float(temperature_schedule(p, jnp.asarray(50))) == pytest.approx(0.525)
    assert float(temperature_schedule(p, jnp.asarray(100))) == pytest.approx(0.05)
    assert float(temperature_schedule(p, jnp.asarray(10_000))) == pytest.approx(0.05)
    p2 = Config.from_mapping({"temp": 0.3})
    assert float(temperature_schedule(p2, jnp.asarray(7))) == pytest.approx(0.3)
    p3 = Config.from_mapping({})
    assert float(temperature_schedule(p3, jnp.asarray(7))) == pytest.approx(1.0)


def test_vae_config_from_reference_schema():
    params = Config.from_mapping(
        {
            "num_tokens": 2048,
            "dataset": {"image_size": 256},
            "convblocks": [[2, 128], [3, 256], [5, 512]],
            "recompute_grad": True,
            "use_bf16": True,
        }
    )
    cfg = VAEConfig.from_params(params)
    assert cfg.convblocks == ((2, 128), (3, 256), (5, 512))
    assert cfg.image_seq_len == 1024
    assert cfg.use_bf16 and cfg.recompute_grad

    # mtf-schema config (vae_example.json has num_layers/hidden_dim)
    params2 = Config.from_mapping(
        {
            "num_tokens": 512,
            "dataset": {"image_size": 32},
            "hidden_dim": 64,
            "num_layers": 3,
        }
    )
    cfg2 = VAEConfig.from_params(params2)
    assert len(cfg2.convblocks) == 3
    assert cfg2.image_seq_len == 16
