import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig


CFG = DalleConfig(
    n_embd=64,
    text_vocab_size=50,
    image_vocab_size=20,
    text_seq_len=8,
    image_seq_len=16,
    n_layers=2,
    n_heads=2,
)


def _tokens(key, b=2, cfg=CFG):
    return jax.random.randint(key, (b, cfg.total_seq_len), 0, cfg.total_tokens)


class TestDalleForward:
    def test_logits_shape_and_dtype(self):
        model = DALLE(CFG)
        params = model.init(jax.random.PRNGKey(0))
        logits = model.forward(params, _tokens(jax.random.PRNGKey(1)))
        assert logits.shape == (2, 24, CFG.total_tokens)
        assert logits.dtype == jnp.float32  # fp32 logits (reference :391-395)

    def test_vocab_is_text_plus_image_plus_eos(self):
        assert CFG.total_tokens == 50 + 20 + 1
        assert CFG.eos == 70

    def test_loss_labels_shifted_with_eos(self):
        """loss(tokens)[.., i] must be xent of predicting tokens[i+1], with the
        last label = EOS (reference models.py:407-411)."""
        model = DALLE(CFG)
        params = model.init(jax.random.PRNGKey(0))
        tokens = _tokens(jax.random.PRNGKey(1))
        loss, loss_batch = model.loss(params, tokens, train=False)
        assert loss_batch.shape == tokens.shape
        logits = model.forward(params, tokens, train=False)
        # manual last-position check: label is EOS
        lp = jax.nn.log_softmax(logits[:, -1], -1)
        expected_last = -lp[:, CFG.eos]
        np.testing.assert_allclose(
            np.asarray(loss_batch[:, -1]), np.asarray(expected_last), rtol=1e-5
        )

    def test_causality(self):
        model = DALLE(CFG)
        params = model.init(jax.random.PRNGKey(0))
        tokens = _tokens(jax.random.PRNGKey(1))
        logits1 = model.forward(params, tokens, train=False)
        # perturb the last token: logits at positions < last must not move
        tokens2 = tokens.at[:, -1].set((tokens[:, -1] + 1) % CFG.total_tokens)
        logits2 = model.forward(params, tokens2, train=False)
        np.testing.assert_allclose(
            np.asarray(logits1[:, :-1]), np.asarray(logits2[:, :-1]), atol=1e-5
        )

    def test_local_attention_variant_runs(self):
        cfg = DalleConfig(
            n_embd=64, text_vocab_size=50, image_vocab_size=20,
            text_seq_len=8, image_seq_len=16, n_layers=2, n_heads=2,
            attention_type="local", local_attention_radius=4,
        )
        model = DALLE(cfg)
        params = model.init(jax.random.PRNGKey(0))
        logits = model.forward(params, _tokens(jax.random.PRNGKey(1), cfg=cfg))
        assert np.isfinite(np.asarray(logits)).all()

    def test_recompute_grad_matches(self):
        tokens = _tokens(jax.random.PRNGKey(1))
        cfg_r = DalleConfig(
            n_embd=64, text_vocab_size=50, image_vocab_size=20,
            text_seq_len=8, image_seq_len=16, n_layers=2, n_heads=2,
            recompute_grad=True,
        )
        params = DALLE(CFG).init(jax.random.PRNGKey(0))
        g1 = jax.grad(lambda p: DALLE(CFG).loss(p, tokens, train=True)[0])(params)
        g2 = jax.grad(lambda p: DALLE(cfg_r).loss(p, tokens, train=True)[0])(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    @pytest.mark.parametrize(
        "policy", ["dots_except_mlp1", "save_attn", "save_attn_lean"]
    )
    def test_named_remat_policies_match(self, policy):
        """Every graded remat policy (incl. the ones that keep the Pallas
        attention kernel's named out/lse and elide its re-run) produces the
        same gradients as no-remat."""
        tokens = _tokens(jax.random.PRNGKey(1))
        cfg_r = DalleConfig(
            n_embd=64, text_vocab_size=50, image_vocab_size=20,
            text_seq_len=8, image_seq_len=16, n_layers=2, n_heads=2,
            recompute_grad=True, remat_policy=policy,
        )
        params = DALLE(CFG).init(jax.random.PRNGKey(0))
        g1 = jax.grad(lambda p: DALLE(CFG).loss(p, tokens, train=True)[0])(params)
        g2 = jax.grad(lambda p: DALLE(cfg_r).loss(p, tokens, train=True)[0])(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestIncrementalDecode:
    def test_prefill_then_decode_matches_parallel_forward(self):
        """KV-cache incremental logits == full parallel forward logits."""
        model = DALLE(CFG)
        params = model.init(jax.random.PRNGKey(0))
        tokens = _tokens(jax.random.PRNGKey(1), b=2)
        full_logits = model.forward(params, tokens, train=False)

        prompt_len = CFG.text_seq_len
        cache = model.init_cache(batch=2)
        logits_p, cache = model.prefill(params, tokens[:, :prompt_len], cache)
        np.testing.assert_allclose(
            np.asarray(logits_p), np.asarray(full_logits[:, prompt_len - 1]),
            atol=2e-4,
        )
        # decode the rest one token at a time
        for pos in range(prompt_len, CFG.total_seq_len):
            logits_i, cache = model.decode_step(
                params, cache, tokens[:, pos], jnp.asarray(pos)
            )
            np.testing.assert_allclose(
                np.asarray(logits_i), np.asarray(full_logits[:, pos]),
                atol=2e-4, err_msg=f"pos={pos}",
            )

    def test_cache_shapes(self):
        model = DALLE(CFG)
        cache = model.init_cache(batch=3)
        assert cache["k"].shape == (2, 3, 2, 24, 32)


class TestDalleTrains:
    def test_loss_decreases_overfit(self):
        model = DALLE(CFG)
        params = model.init(jax.random.PRNGKey(0))
        tokens = _tokens(jax.random.PRNGKey(1), b=4)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            loss, grads = jax.value_and_grad(
                lambda p: model.loss(p, tokens, train=True)[0]
            )(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        first = None
        for _ in range(40):
            params, opt_state, loss = step(params, opt_state)
            if first is None:
                first = float(loss)
        assert float(loss) < first * 0.5, (first, float(loss))


def test_activation_config():
    """activation_fn parity: the reference DALLE takes an activation_fn arg
    (models.py:147); here it's the 'activation' config key."""
    tokens = _tokens(jax.random.PRNGKey(1))
    params = DALLE(CFG).init(jax.random.PRNGKey(0))
    base = dict(
        n_embd=64, text_vocab_size=50, image_vocab_size=20,
        text_seq_len=8, image_seq_len=16, n_layers=2, n_heads=2,
    )
    l_relu = DALLE(DalleConfig(**base)).loss(params, tokens, train=False)[0]
    l_gelu = DALLE(DalleConfig(**base, activation="gelu")).loss(
        params, tokens, train=False
    )[0]
    assert float(l_relu) != float(l_gelu)
    assert np.isfinite(float(l_gelu))


def test_ln_dtype_activation_matches_f32():
    """ln_dtype="activation" is the reference's exact norm semantics
    (layers.py:30-33 runs mean/var/rsqrt in the activation dtype): at fp32
    activations the two settings are identical; under bf16 compute the
    loss must stay finite and within bf16 tolerance of the fp32-LN loss."""
    tokens = _tokens(jax.random.PRNGKey(1))
    params = DALLE(CFG).init(jax.random.PRNGKey(0))
    base = dict(
        n_embd=64, text_vocab_size=50, image_vocab_size=20,
        text_seq_len=8, image_seq_len=16, n_layers=2, n_heads=2,
    )
    l_f32 = DALLE(DalleConfig(**base)).loss(params, tokens, train=False)[0]
    l_act = DALLE(DalleConfig(**base, ln_dtype="activation")).loss(
        params, tokens, train=False
    )[0]
    # fp32 activations: "activation" IS fp32 — bitwise same graph
    assert float(l_f32) == float(l_act)

    l_bf = DALLE(DalleConfig(**base, bf_16=True)).loss(
        params, tokens, train=False
    )[0]
    l_bf_act = DALLE(
        DalleConfig(**base, bf_16=True, ln_dtype="activation")
    ).loss(params, tokens, train=False)[0]
    assert np.isfinite(float(l_bf_act))
    assert abs(float(l_bf_act) - float(l_bf)) < 0.05 * abs(float(l_bf))


def test_scan_unroll_full_matches_rolled():
    """scan_unroll="full" (→ n_layers, straight-line layers) is a pure
    scheduling change: loss and grads must match the rolled scan (up to
    f32 reassociation in the differently-fused backward).
    The BENCH.md unroll study measured it +7.8% on v5e under packed
    attention; this pins the numerics side of that default."""
    from dalle_mtf_tpu.utils.config import Config

    base = dict(
        n_embd=64, text_vocab_size=50, image_vocab_size=20,
        text_seq_len=8, image_seq_len=16, n_layers=2, n_heads=2,
        recompute_grad=True, remat_policy="dots_and_attn",
    )
    # config-string "full" maps to n_layers
    params_map = Config.from_mapping(
        {**base, "scan_unroll": "full", "layout": None}
    )
    assert DalleConfig.from_params(params_map, 16).scan_unroll == 2

    tokens = _tokens(jax.random.PRNGKey(1))
    p = DALLE(DalleConfig(**base)).init(jax.random.PRNGKey(0))

    def run(unroll):
        cfg = DalleConfig(**base, scan_unroll=unroll)
        loss, g = jax.value_and_grad(
            lambda q: DALLE(cfg).loss(q, tokens, train=True)[0]
        )(p)
        return loss, g

    l1, g1 = run(1)
    l2, g2 = run(2)
    # same math, different schedule: XLA fuses the straight-line backward
    # differently, so association (not semantics) can shift in f32
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_head_matmul_bias_vjp_matches_autodiff():
    """_head_matmul_bias (fused dw+db backward via the ones-column trick)
    must match plain autodiff of einsum + bias add: forward bit-identical,
    grads equal up to f32 reassociation (db is f32-accumulated in the
    fused form; the plain form reduces in bf16 under a bf16 cotangent)."""
    from dalle_mtf_tpu.models.dalle import _head_matmul_bias

    key = jax.random.PRNGKey(3)
    kx, kw, kb, kd = jax.random.split(key, 4)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jax.random.normal(kx, (2, 6, 16), dtype)
        w = jax.random.normal(kw, (16, 33), dtype)
        b = jax.random.normal(kb, (33,), jnp.float32)
        dy = jax.random.normal(kd, (2, 6, 33), dtype)

        def plain(x, w, b):
            return jnp.einsum("bse,ev->bsv", x, w) + b.astype(x.dtype)

        y1, vjp1 = jax.vjp(plain, x, w, b)
        y2, vjp2 = jax.vjp(_head_matmul_bias, x, w, b)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        g1, g2 = vjp1(dy), vjp2(dy)
        # db differs most under bf16: the PLAIN path reduces the bf16
        # cotangent with bf16 accumulation while the fused form
        # accumulates in f32 (strictly more accurate), so the tolerance
        # covers the plain path's own rounding
        for a, c in zip(g1, g2):
            assert a.dtype == c.dtype
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(c, np.float32),
                rtol=6e-2 if dtype == jnp.bfloat16 else 1e-6,
                atol=1e-6,
            )
        if dtype == jnp.bfloat16:
            # the fused db must be the MORE accurate one vs f32 ground truth
            ref = np.asarray(dy, np.float32).sum((0, 1))
            err_plain = np.abs(np.asarray(g1[2], np.float32) - ref).max()
            err_fused = np.abs(np.asarray(g2[2], np.float32) - ref).max()
            assert err_fused <= err_plain + 1e-6
