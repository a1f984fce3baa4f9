import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle_mtf_tpu.ops import (
    causal_attention,
    attention_reference,
    gumbel_softmax,
    mse_loss,
    softmax_cross_entropy_with_logits,
)

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


class TestGumbelSoftmax:
    def test_soft_sums_to_one(self):
        rng = jax.random.PRNGKey(0)
        logits = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 32))
        out = gumbel_softmax(rng, logits, temperature=0.5, hard=False)
        np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-5)

    def test_hard_is_one_hot(self):
        rng = jax.random.PRNGKey(0)
        logits = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 16))
        out = gumbel_softmax(rng, logits, temperature=1.0, hard=True)
        assert set(np.unique(np.asarray(out))) <= {0.0, 1.0} or np.allclose(
            np.asarray(out.sum(-1)), 1.0
        )
        np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-5)

    def test_straight_through_gradient_flows(self):
        # hard output in fwd, soft gradient in bwd (stop_gradient trick)
        logits = jnp.array([[2.0, 1.0, 0.5]])

        def f(lg):
            s = gumbel_softmax(jax.random.PRNGKey(0), lg, 1.0, hard=True)
            return (s * jnp.array([[1.0, 2.0, 3.0]])).sum()

        g = jax.grad(f)(logits)
        assert np.abs(np.asarray(g)).sum() > 0

    def test_low_temperature_recovers_argmax(self):
        logits = jnp.array([[10.0, 0.0, -10.0]])
        out = gumbel_softmax(jax.random.PRNGKey(3), logits, temperature=0.01, hard=True)
        assert int(jnp.argmax(out)) == 0


class TestLosses:
    def test_mse(self):
        a, b = jnp.ones((2, 3)), jnp.zeros((2, 3))
        assert float(mse_loss(a, b)) == 1.0

    def test_xent_matches_manual(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 13))
        targets = jax.random.randint(jax.random.PRNGKey(1), (4, 7), 0, 13)
        loss = softmax_cross_entropy_with_logits(logits, targets)
        log_probs = jax.nn.log_softmax(logits, -1)
        expected = -jnp.take_along_axis(log_probs, targets[..., None], -1)[..., 0]
        np.testing.assert_allclose(np.asarray(loss), np.asarray(expected), rtol=1e-5)

    def test_z_loss_increases_loss(self):
        logits = 5 + jax.random.normal(jax.random.PRNGKey(0), (4, 13))
        targets = jnp.zeros((4,), jnp.int32)
        l0 = softmax_cross_entropy_with_logits(logits, targets, z_loss=0.0)
        l1 = softmax_cross_entropy_with_logits(logits, targets, z_loss=1e-2)
        assert float(l1.mean()) > float(l0.mean())

    def test_frechet_feature_distance(self):
        from dalle_mtf_tpu.ops.losses import frechet_feature_distance

        f = jax.random.normal(jax.random.PRNGKey(0), (64, 16))
        # identical distributions score ~0 (eps floor only)
        assert float(frechet_feature_distance(f, f)) < 1e-3
        # grows monotonically with a mean shift
        d1 = float(frechet_feature_distance(f, f + 0.5))
        d2 = float(frechet_feature_distance(f, f + 1.0))
        assert 0.0 < d1 < d2
        # mean shift of delta in every dim contributes C * delta^2
        np.testing.assert_allclose(d1, 16 * 0.25, rtol=1e-4)
        # and with a variance change
        d3 = float(frechet_feature_distance(f, f * 2.0))
        assert d3 > 0.0


class TestAttention:
    @pytest.mark.parametrize("seq", [128, 256, 320])
    def test_pallas_matches_reference_causal(self, seq):
        b, h, d = 2, 2, 128
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, h, seq, d), jnp.float32)
        k = jax.random.normal(ks[1], (b, h, seq, d), jnp.float32)
        v = jax.random.normal(ks[2], (b, h, seq, d), jnp.float32)
        ref = attention_reference(q, k, v, causal=True)
        out = causal_attention(
            q, k, v, block_q=128, block_k=128, use_pallas=True, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("seq", [256, 320])
    def test_loop_kernels_match_reference(self, seq, monkeypatch):
        """The online-softmax loop kernels (long-seq path) stay correct for
        values AND grads even though short seqs now route to whole-row —
        forced here by dropping the dispatch threshold."""
        from dalle_mtf_tpu.ops import attention as attn_mod

        monkeypatch.setattr(attn_mod, "WHOLE_ROW_MAX_SEQ", 0)
        b, h, d = 2, 2, 128
        ks = jax.random.split(jax.random.PRNGKey(3), 4)
        q, k, v = (jax.random.normal(kk, (b, h, seq, d), jnp.float32) for kk in ks[:3])
        g = jax.random.normal(ks[3], (b, h, seq, d), jnp.float32)

        def loss_flash(q_, k_, v_):
            return (causal_attention(
                q_, k_, v_, block_q=128, block_k=128,
                use_pallas=True, interpret=True,
            ) * g).sum()

        def loss_ref(q_, k_, v_):
            return (attention_reference(q_, k_, v_, causal=True) * g).sum()

        out = causal_attention(
            q, k, v, block_q=128, block_k=128, use_pallas=True, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(attention_reference(q, k, v, True)),
            atol=2e-5,
        )
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)

    def test_pallas_matches_reference_local_window(self):
        b, h, seq, d = 1, 2, 256, 128
        ks = jax.random.split(jax.random.PRNGKey(7), 3)
        q, k, v = (jax.random.normal(kk, (b, h, seq, d), jnp.float32) for kk in ks)
        ref = attention_reference(q, k, v, causal=True, window=64)
        out = causal_attention(
            q, k, v, window=64, block_q=128, block_k=128,
            use_pallas=True, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_causal_no_future_leakage(self):
        b, h, seq, d = 1, 1, 64, 32
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        q, k, v = (jax.random.normal(kk, (b, h, seq, d), jnp.float32) for kk in ks)
        out1 = attention_reference(q, k, v, causal=True)
        # perturb the future half of k/v; first half of output must not change
        k2 = k.at[:, :, seq // 2 :].set(0.0)
        v2 = v.at[:, :, seq // 2 :].set(0.0)
        out2 = attention_reference(q, k2, v2, causal=True)
        np.testing.assert_allclose(
            np.asarray(out1[:, :, : seq // 2]),
            np.asarray(out2[:, :, : seq // 2]),
            atol=1e-6,
        )

    def test_gradients_flow_through_flash(self):
        b, h, seq, d = 1, 1, 128, 128
        ks = jax.random.split(jax.random.PRNGKey(5), 3)
        q, k, v = (jax.random.normal(kk, (b, h, seq, d), jnp.float32) for kk in ks)

        def loss_flash(q_, k_, v_):
            return causal_attention(
                q_, k_, v_, block_q=128, block_k=128,
                use_pallas=True, interpret=True,
            ).sum()

        def loss_ref(q_, k_, v_):
            return attention_reference(q_, k_, v_, causal=True).sum()

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)

    def test_pallas_backward_multiblock_and_window(self):
        """Fused dq/dkv kernels vs XLA grads across block boundaries and with
        a local window, including a non-block-multiple sequence."""
        for seq, window in [(320, None), (256, 64)]:
            b, h, d = 2, 2, 128
            ks = jax.random.split(jax.random.PRNGKey(11), 4)
            q, k, v = (jax.random.normal(kk, (b, h, seq, d), jnp.float32) for kk in ks[:3])
            g = jax.random.normal(ks[3], (b, h, seq, d), jnp.float32)

            def loss_flash(q_, k_, v_):
                return (causal_attention(
                    q_, k_, v_, window=window, block_q=128, block_k=128,
                    use_pallas=True, interpret=True,
                ) * g).sum()

            def loss_ref(q_, k_, v_):
                return (attention_reference(q_, k_, v_, True, window) * g).sum()

            gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
            gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
            for a, b_ in zip(gf, gr):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b_), atol=5e-4,
                    err_msg=f"seq={seq} window={window}",
                )


class TestWedgeKernels:
    """The wedge family (default short-seq path) at sizes that exercise
    MULTIPLE per-q-block calls (seq > WEDGE_MAX_BLOCK), including ragged
    padding and local windows, plus the selectable whole-row family."""

    @pytest.mark.parametrize("seq,window", [(768, None), (768, 200), (700, None)])
    def test_multicall_value_and_grad(self, seq, window):
        from dalle_mtf_tpu.ops import attention as attn_mod

        block, s_pad, n = attn_mod._wedge_layout(seq)
        assert n >= 2, "shape must exercise multiple wedge calls"
        b, h, d = 1, 2, 128
        ks = jax.random.split(jax.random.PRNGKey(11), 4)
        q, k, v = (jax.random.normal(kk, (b, h, seq, d), jnp.float32)
                   for kk in ks[:3])
        g = jax.random.normal(ks[3], (b, h, seq, d), jnp.float32)

        ref = attention_reference(q, k, v, causal=True, window=window)
        out = causal_attention(
            q, k, v, window=window, use_pallas=True, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

        gf = jax.grad(
            lambda *a: (causal_attention(
                *a, window=window, use_pallas=True, interpret=True) * g).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        gr = jax.grad(
            lambda *a: (attention_reference(
                *a, causal=True, window=window) * g).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)

    def test_whole_row_family_still_selectable(self, monkeypatch):
        from dalle_mtf_tpu.ops import attention as attn_mod

        monkeypatch.setattr(attn_mod, "SHORT_IMPL", "wr")
        b, h, seq, d = 1, 2, 256, 128
        ks = jax.random.split(jax.random.PRNGKey(13), 3)
        q, k, v = (jax.random.normal(kk, (b, h, seq, d), jnp.float32)
                   for kk in ks)
        ref = attention_reference(q, k, v, causal=True)
        out = causal_attention(q, k, v, use_pallas=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_wedge_layout_rules(self):
        from dalle_mtf_tpu.ops.attention import WEDGE_MAX_BLOCK, _wedge_layout

        for s, want in [(1280, (640, 1280, 2)), (128, (128, 128, 1)),
                        (2048, (512, 2048, 4)), (700, (384, 768, 2))]:
            got = _wedge_layout(s)
            assert got == want, (s, got, want)
            block, s_pad, n = got
            assert block <= WEDGE_MAX_BLOCK and block % 128 == 0
            assert s_pad >= s and s_pad == block * n


class TestHybridWedgeForward:
    """3072 < S ≤ WEDGE_FWD_MAX_SEQ runs the wedge FORWARD (causal-skip,
    VMEM-capped block) with the FUSED tiled backward (r5; the loop-kernel
    backward remains the DALLE_TPU_ATTN_LONG_BWD=loop escape and the
    fp32 / >WEDGE_FWD_MAX_SEQ path). Forced here at small shapes by
    shrinking both dispatch thresholds — the grad checks in this class
    exercise _hybrid_backward end to end."""

    @pytest.fixture(autouse=True)
    def _small_thresholds(self, monkeypatch):
        from dalle_mtf_tpu.ops import attention as attn_mod

        monkeypatch.setattr(attn_mod, "WHOLE_ROW_MAX_SEQ", 128)
        monkeypatch.setattr(attn_mod, "WEDGE_FWD_MAX_SEQ", 2560)
        attn_mod.set_tune_table({})
        yield
        attn_mod.set_tune_table(None)

    @pytest.mark.parametrize("seq,window", [(1536, None), (1536, 300), (1472, None)])
    def test_value_and_grad_match_reference(self, seq, window, monkeypatch):
        from dalle_mtf_tpu.ops import attention as attn_mod

        # observe the hybrid actually engaging (wedge fwd with a capped
        # block, loop bwd untouched)
        calls = {}
        orig = attn_mod._wedge_forward

        def spy(*a, **kw):
            calls["max_block"] = kw.get("max_block")
            return orig(*a, **kw)

        monkeypatch.setattr(attn_mod, "_wedge_forward", spy)

        b, h, d = 1, 2, 128
        ks = jax.random.split(jax.random.PRNGKey(21), 4)
        q, k, v = (jax.random.normal(kk, (b, h, seq, d)).astype(jnp.bfloat16)
                   for kk in ks[:3])
        g = jax.random.normal(ks[3], (b, h, seq, d), jnp.float32)

        ref = attention_reference(q, k, v, causal=True, window=window)
        out = causal_attention(
            q, k, v, window=window, use_pallas=True, interpret=True
        )
        s128 = -(-seq // 128) * 128
        assert calls["max_block"] == attn_mod._wedge_long_cap(s128) == 512
        assert attn_mod._wedge_layout(seq, 2, 512)[2] >= 3  # multi-call
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2,
        )

        def loss_pallas(q_, k_, v_):
            return (causal_attention(
                q_, k_, v_, window=window, use_pallas=True, interpret=True
            ).astype(jnp.float32) * g).sum()

        def loss_ref(q_, k_, v_):
            return (attention_reference(
                q_, k_, v_, causal=True, window=window
            ).astype(jnp.float32) * g).sum()

        gf = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a_, b_ in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a_, np.float32), np.asarray(b_, np.float32),
                atol=5e-2,
            )

    def test_fp32_falls_through_to_loop(self, monkeypatch):
        from dalle_mtf_tpu.ops import attention as attn_mod

        def boom(*a, **kw):
            raise AssertionError("wedge fwd must not run for fp32 hybrid")

        monkeypatch.setattr(attn_mod, "_wedge_forward", boom)
        b, h, seq, d = 1, 1, 256, 128
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q, k, v = (jax.random.normal(kk, (b, h, seq, d), jnp.float32)
                   for kk in ks)
        out = causal_attention(q, k, v, use_pallas=True, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out),
            np.asarray(attention_reference(q, k, v, causal=True)),
            atol=2e-5,
        )

    def test_fused_backward_engages(self, monkeypatch):
        """The default long-S backward is the ONE-call fused kernel, not
        the two-call loop family."""
        from dalle_mtf_tpu.ops import attention as attn_mod

        calls = {"hybrid": 0}
        orig = attn_mod._hybrid_backward

        def spy(*a, **kw):
            calls["hybrid"] += 1
            return orig(*a, **kw)

        monkeypatch.setattr(attn_mod, "_hybrid_backward", spy)
        b, h, seq, d = 1, 2, 1536, 128
        ks = jax.random.split(jax.random.PRNGKey(5), 4)
        q, k, v = (jax.random.normal(kk, (b, h, seq, d)).astype(jnp.bfloat16)
                   for kk in ks[:3])
        g = jax.random.normal(ks[3], (b, h, seq, d), jnp.float32)
        jax.grad(lambda q_: (causal_attention(
            q_, k, v, use_pallas=True, interpret=True
        ).astype(jnp.float32) * g).sum())(q)
        assert calls["hybrid"] == 1

    def test_loop_escape_hatch(self, monkeypatch):
        """DALLE_TPU_ATTN_LONG_BWD=loop keeps the streaming dq/dkv family
        selectable per deployment (and stays grad-correct)."""
        from dalle_mtf_tpu.ops import attention as attn_mod

        monkeypatch.setattr(attn_mod, "LONG_BWD_IMPL", "loop")

        def boom(*a, **kw):
            raise AssertionError("fused backward must not run under loop")

        monkeypatch.setattr(attn_mod, "_hybrid_backward", boom)
        b, h, seq, d = 1, 1, 1536, 128
        ks = jax.random.split(jax.random.PRNGKey(6), 4)
        q, k, v = (jax.random.normal(kk, (b, h, seq, d)).astype(jnp.bfloat16)
                   for kk in ks[:3])
        g = jax.random.normal(ks[3], (b, h, seq, d), jnp.float32)
        gf = jax.grad(lambda *a: (causal_attention(
            *a, use_pallas=True, interpret=True).astype(jnp.float32)
            * g).sum(), argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda *a: (attention_reference(
            *a, causal=True).astype(jnp.float32) * g).sum(),
            argnums=(0, 1, 2))(q, k, v)
        for a_, b_ in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a_, np.float32), np.asarray(b_, np.float32),
                atol=5e-2,
            )

    def test_fused_backward_block128_fallback(self, monkeypatch):
        """A tuned wedge cap of 512 at S=1100 gives forward blocks of 384
        (ceil(1152/3) rounded to 128) and s_pad 1152 — not a 256-multiple —
        so the fused backward must drop to block/tile 128 (the
        always-dividing fallback) and stay grad-correct."""
        from dalle_mtf_tpu.ops import attention as attn_mod

        attn_mod.set_tune_table({"wedge": {"1152,2": 512}})
        layouts = {}
        orig = attn_mod._hybrid_backward

        def spy(q, k, v, out, lse_flat, g_, window, interpret):
            layouts["s_pad"] = lse_flat.shape[1]
            return orig(q, k, v, out, lse_flat, g_, window, interpret)

        monkeypatch.setattr(attn_mod, "_hybrid_backward", spy)
        b, h, seq, d = 1, 1, 1100, 128
        ks = jax.random.split(jax.random.PRNGKey(8), 4)
        q, k, v = (jax.random.normal(kk, (b, h, seq, d)).astype(jnp.bfloat16)
                   for kk in ks[:3])
        g = jax.random.normal(ks[3], (b, h, seq, d), jnp.float32)
        gf = jax.grad(lambda *a: (causal_attention(
            *a, use_pallas=True, interpret=True).astype(jnp.float32)
            * g).sum(), argnums=(0, 1, 2))(q, k, v)
        assert layouts["s_pad"] == 1152 and layouts["s_pad"] % 256 != 0
        gr = jax.grad(lambda *a: (attention_reference(
            *a, causal=True).astype(jnp.float32) * g).sum(),
            argnums=(0, 1, 2))(q, k, v)
        for a_, b_ in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a_, np.float32), np.asarray(b_, np.float32),
                atol=5e-2,
            )

    def test_fused_backward_tuned_layout(self, monkeypatch):
        """A {"hybrid_bwd": {"<s128>,<itemsize>": [block, tile]}} table
        entry overrides the analytic block/tile when it divides the
        forward's padding; a non-dividing entry is ignored."""
        from dalle_mtf_tpu.ops import attention as attn_mod

        seen = []
        orig = attn_mod._hybrid_bwd_kernel

        def spy(*a, **kw):
            seen.append((kw["block"], kw["tile"]))
            return orig(*a, **kw)

        monkeypatch.setattr(attn_mod, "_hybrid_bwd_kernel", spy)
        b, h, seq, d = 1, 1, 1536, 128
        ks = jax.random.split(jax.random.PRNGKey(9), 4)
        q, k, v = (jax.random.normal(kk, (b, h, seq, d)).astype(jnp.bfloat16)
                   for kk in ks[:3])
        g = jax.random.normal(ks[3], (b, h, seq, d), jnp.float32)

        def run():
            seen.clear()
            jax.grad(lambda q_: (causal_attention(
                q_, k, v, use_pallas=True, interpret=True
            ).astype(jnp.float32) * g).sum())(q)
            return seen[0]

        attn_mod.set_tune_table(
            {"wedge": {"1536,2": 512}, "hybrid_bwd": {"1536,2": [512, 256]}}
        )
        assert run() == (512, 256)
        attn_mod.set_tune_table(
            {"wedge": {"1536,2": 512}, "hybrid_bwd": {"1536,2": [640, 640]}}
        )
        assert run() == (256, 512)  # 640 doesn't divide 1536 -> analytic

    def test_bwd_block_fallback_divides_fwd_padding(self):
        from dalle_mtf_tpu.ops import attention as attn_mod

        # bwd default 640 does not divide the wedge's padded 768 -> the
        # backward must fall back to a dividing block instead of crashing
        b, h, seq, d = 1, 1, 640, 128
        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        q, k, v = (jax.random.normal(kk, (b, h, seq, d)).astype(jnp.bfloat16)
                   for kk in ks[:3])
        g = jax.random.normal(ks[3], (b, h, seq, d), jnp.float32)
        gf = jax.grad(lambda *a: (causal_attention(
            *a, use_pallas=True, interpret=True).astype(jnp.float32)
            * g).sum(), argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda *a: (attention_reference(
            *a, causal=True).astype(jnp.float32) * g).sum(),
            argnums=(0, 1, 2))(q, k, v)
        for a_, b_ in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a_, np.float32), np.asarray(b_, np.float32),
                atol=5e-2,
            )


class TestAttentionAutotune:
    """Profile-guided block-size table (autotune_attention.py): the tuned
    cap overrides WEDGE_MAX_BLOCK per (s128, itemsize), the table loads
    from DALLE_TPU_ATTN_TUNE, a broken file falls back to defaults, and —
    the safety property the tuner relies on — block size never changes
    values or grads."""

    @pytest.fixture(autouse=True)
    def _reset_table(self, monkeypatch):
        from dalle_mtf_tpu.ops import attention as attn

        monkeypatch.delenv("DALLE_TPU_ATTN_TUNE", raising=False)
        attn.set_tune_table(None)
        yield
        attn.set_tune_table(None)

    def test_tuned_cap_overrides_default(self):
        from dalle_mtf_tpu.ops import attention as attn

        assert attn._wedge_layout(1280) == (640, 1280, 2)
        default_fp32 = attn._wedge_layout(1280, itemsize=4)
        attn.set_tune_table({"wedge": {"1280,2": 256}})
        assert attn._wedge_layout(1280) == (256, 1280, 5)
        # other shapes / itemsizes untouched
        assert attn._wedge_layout(2048) == (512, 2048, 4)
        assert attn._wedge_layout(1280, itemsize=4) == default_fp32
        attn.set_tune_table(None)
        assert attn._wedge_layout(1280) == (640, 1280, 2)

    def test_table_loads_from_env_file(self, tmp_path, monkeypatch):
        import json

        from dalle_mtf_tpu.ops import attention as attn

        p = tmp_path / "tune.json"
        p.write_text(json.dumps({"wedge": {"768,2": 384}}))
        monkeypatch.setenv("DALLE_TPU_ATTN_TUNE", str(p))
        attn.set_tune_table(None)
        assert attn._wedge_layout(700) == (384, 768, 2)

    def test_attn_tune_config_key_installs_table(self, tmp_path):
        import json

        from dalle_mtf_tpu.ops import attention as attn
        from dalle_mtf_tpu.train.tasks import make_dalle_task

        p = tmp_path / "tune.json"
        p.write_text(json.dumps({"wedge": {"1280,2": 384}}))
        params = {
            "model_type": "dalle", "attn_tune": str(p),
            "n_embd": 64, "text_vocab_size": 50, "image_vocab_size": 16,
            "text_seq_len": 8, "n_layers": 1, "n_heads": 2,
            "vae_params": {
                "dataset": {"image_size": 32}, "num_tokens": 16,
                "convblocks": [[1, 8]],
            },
        }
        make_dalle_task(params)
        assert attn._wedge_layout(1280) == (384, 1536, 4)
        # a config naming a missing table raises (unlike the lazy env load)
        attn.set_tune_table(None)
        with pytest.raises(OSError):
            make_dalle_task({**params, "attn_tune": str(tmp_path / "no.json")})

    def test_broken_table_file_warns_and_falls_back(self, tmp_path, monkeypatch):
        from dalle_mtf_tpu.ops import attention as attn

        p = tmp_path / "tune.json"
        p.write_text("{not json")
        monkeypatch.setenv("DALLE_TPU_ATTN_TUNE", str(p))
        attn.set_tune_table(None)
        with pytest.warns(UserWarning, match="unreadable"):
            got = attn._wedge_layout(1280)
        assert got == (640, 1280, 2)

    def test_loop_family_tuned_blocks(self, monkeypatch):
        """A {"loop": ...} table entry reaches _flash_attention's block
        arguments (bwd entries gated on dividing the fwd-padded length)
        and stays value/grad-preserving."""
        from dalle_mtf_tpu.ops import attention as attn_mod

        monkeypatch.setattr(attn_mod, "WHOLE_ROW_MAX_SEQ", 0)
        seen = {}
        orig = attn_mod._flash_attention

        def spy(q, k, v, window, bq, bk, bwq, bwk, *a):
            seen.update(bq=bq, bk=bk, bwq=bwq, bwk=bwk)
            return orig(q, k, v, window, bq, bk, bwq, bwk, *a)

        monkeypatch.setattr(attn_mod, "_flash_attention", spy)
        b, h, seq, d = 1, 2, 320, 128  # s128 = 384
        ks = jax.random.split(jax.random.PRNGKey(9), 4)
        q, k, v = (jax.random.normal(kk, (b, h, seq, d), jnp.float32)
                   for kk in ks[:3])
        g = jax.random.normal(ks[3], (b, h, seq, d), jnp.float32)

        attn_mod.set_tune_table({"loop": {"384,4": [128, 128, 128, 128]}})
        out = attn_mod.causal_attention(
            q, k, v, use_pallas=True, interpret=True
        )
        assert seen == {"bq": 128, "bk": 128, "bwq": 128, "bwk": 128}
        np.testing.assert_allclose(
            np.asarray(out),
            np.asarray(attention_reference(q, k, v, causal=True)),
            atol=2e-5,
        )
        gf = jax.grad(lambda *a: (attn_mod.causal_attention(
            *a, use_pallas=True, interpret=True) * g).sum(),
            argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda *a: (attention_reference(
            *a, causal=True) * g).sum(), argnums=(0, 1, 2))(q, k, v)
        for a_, b_ in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), atol=5e-4
            )
        # a bwd entry that does NOT divide s_pad is ignored (fallback)
        attn_mod.set_tune_table({"loop": {"384,4": [128, 128, 640, 640]}})
        attn_mod.causal_attention(q, k, v, use_pallas=True, interpret=True)
        assert (seen["bq"], seen["bwq"]) == (128, 128)

    def test_block_size_is_value_preserving(self):
        from dalle_mtf_tpu.ops import attention as attn

        b, h, seq, d = 1, 2, 640, 128
        ks = jax.random.split(jax.random.PRNGKey(5), 4)
        q, k, v = (jax.random.normal(kk, (b, h, seq, d), jnp.float32)
                   for kk in ks[:3])
        g = jax.random.normal(ks[3], (b, h, seq, d), jnp.float32)

        outs, grads = [], []
        for cap in (256, 640):
            attn.set_tune_table({"wedge": {"640,4": cap}})
            f = lambda *a: (causal_attention(  # noqa: E731
                *a, use_pallas=True, interpret=True) * g).sum()
            outs.append(np.asarray(causal_attention(
                q, k, v, use_pallas=True, interpret=True)))
            grads.append(jax.grad(f, argnums=(0, 1, 2))(q, k, v))
        np.testing.assert_allclose(outs[0], outs[1], atol=2e-5)
        for ga, gb in zip(grads[0], grads[1]):
            np.testing.assert_allclose(
                np.asarray(ga), np.asarray(gb), atol=3e-5
            )


class TestAttentionDropoutKernel:
    """Attention-weight dropout INSIDE the wedge kernels: a coordinate-hash
    keep mask regenerated identically by the forward, the dQ prefix half,
    and the transposed dK/dV suffix half — no [S, S] tensor anywhere."""

    def _dense_same_mask(self, q, k, v, seed, rate):
        import math

        from dalle_mtf_tpu.ops.attention import NEG_INF, _dropout_keep

        b, h, s, d = q.shape
        scale = 1.0 / math.sqrt(d)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        i = jnp.arange(s)[:, None]
        j = jnp.arange(s)[None, :]
        scores = jnp.where(j > i, NEG_INF, scores)
        w = jax.nn.softmax(scores, axis=-1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        keeps = jnp.stack([
            _dropout_keep(rows, cols, seed[0, 0] + bh, rate)
            for bh in range(b * h)
        ]).reshape(b, h, s, s)
        wd = jnp.where(keeps, w / (1 - rate), 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", wd, v)

    def test_keep_fraction(self):
        from dalle_mtf_tpu.ops.attention import _dropout_keep

        rows = jax.lax.broadcasted_iota(jnp.int32, (512, 512), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (512, 512), 1)
        for rate in (0.1, 0.5):
            keep = _dropout_keep(rows, cols, jnp.int32(7), rate)
            assert abs(float(keep.mean()) - (1 - rate)) < 0.01

    @pytest.mark.parametrize("seq", [256, 768])  # 768 -> multiple wedge calls
    def test_value_and_grad_match_dense_same_mask(self, seq):
        from dalle_mtf_tpu.ops.attention import _wedge_attention_dropout

        rate = 0.25
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        q, k, v = (jax.random.normal(kk, (1, 2, seq, 128), jnp.float32)
                   for kk in ks[:3])
        g = jax.random.normal(ks[3], q.shape, jnp.float32)
        seed = jnp.full((1, 1), 77, jnp.int32)

        with jax.default_matmul_precision("highest"):
            out = _wedge_attention_dropout(q, k, v, seed, None, True, rate)
            ref = self._dense_same_mask(q, k, v, seed, rate)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5
            )
            gp = jax.grad(
                lambda *a: (_wedge_attention_dropout(
                    *a, seed, None, True, rate) * g).sum(),
                argnums=(0, 1, 2),
            )(q, k, v)
            gr = jax.grad(
                lambda *a: (self._dense_same_mask(*a, seed, rate) * g).sum(),
                argnums=(0, 1, 2),
            )(q, k, v)
        for a, b_ in zip(gp, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-4
            )

    def test_rate_to_zero_limit_matches_plain_kernel(self):
        """The dropout KERNEL at rate->0 (everything kept, scale->1) must
        converge to the plain kernel — covers the keep-threshold arithmetic
        itself, not just the dispatch (rate == 0.0 never enters the dropout
        path by design)."""
        from dalle_mtf_tpu.ops.attention import (
            _wedge_attention_dropout,
            _wedge_forward,
        )

        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q, k, v = (jax.random.normal(kk, (1, 2, 256, 128), jnp.float32)
                   for kk in ks)
        plain = _wedge_forward(q, k, v, None, True)
        tiny = _wedge_attention_dropout(
            q, k, v, jnp.full((1, 1), 5, jnp.int32), None, True, 1e-7
        )
        np.testing.assert_allclose(
            np.asarray(tiny), np.asarray(plain), atol=1e-5
        )
        # and rate == 0.0 through the public API dispatches to the plain path
        d0 = causal_attention(
            q, k, v, use_pallas=True, interpret=True,
            dropout_rate=0.0, dropout_rng=jax.random.PRNGKey(2),
        )
        np.testing.assert_allclose(np.asarray(d0), np.asarray(plain),
                                   atol=1e-6)


class TestAttentionTPShardMap:
    """causal_attention_tp / packed batch+heads sharding: GSPMD cannot
    auto-partition Mosaic custom calls (found by the r5 dalle_12B AOT
    compile against a real v5e:8x16 topology — tools/aot_12b.py), so under
    a mesh that shards batch (DP) or heads (TP) the kernel must run inside
    a shard_map over exactly those axes. Exercised here with interpret
    kernels on the 8-fake-device mesh."""

    def _mesh(self):
        import numpy as np
        from jax.sharding import Mesh

        return Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "model"))

    def _qkv(self, b=4, h=4, s=256, d=128):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        return tuple(
            jax.random.normal(kk, (b, h, s, d)).astype(jnp.bfloat16)
            for kk in ks
        )

    def test_tp_wrap_matches_reference_and_uses_shard_map(self):
        from dalle_mtf_tpu.ops.attention import causal_attention_tp

        q, k, v = self._qkv()
        ref = attention_reference(q, k, v, causal=True)
        mesh = self._mesh()
        with mesh:
            fn = lambda q_, k_, v_: causal_attention_tp(  # noqa: E731
                q_, k_, v_, batch_axis="data", heads_axis="model",
                interpret=True,
            )
            jaxpr = str(jax.make_jaxpr(fn)(q, k, v))
            assert "shard_map" in jaxpr  # the wrap actually engaged
            out = jax.jit(fn)(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2,
        )

    def test_tp_wrap_grads_match_reference(self):
        from dalle_mtf_tpu.ops.attention import causal_attention_tp

        q, k, v = self._qkv(b=2, h=4, s=256)
        g = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)
        mesh = self._mesh()
        with mesh:
            gf = jax.grad(
                lambda *a: (causal_attention_tp(
                    *a, batch_axis="data", heads_axis="model", interpret=True
                ).astype(jnp.float32) * g).sum(),
                argnums=(0, 1, 2),
            )(q, k, v)
        gr = jax.grad(
            lambda *a: (attention_reference(*a, causal=True).astype(
                jnp.float32) * g).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a_, b_ in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a_, np.float32), np.asarray(b_, np.float32),
                atol=5e-2,
            )

    def test_packed_tp_wrap_matches_reference(self):
        from dalle_mtf_tpu.ops.attention_packed import causal_attention_packed

        b, h, s, d = 4, 4, 256, 128
        q, k, v = self._qkv(b, h, s, d)
        qp, kp, vp = (
            t.transpose(0, 2, 1, 3).reshape(b, s, h * d) for t in (q, k, v)
        )
        ref = attention_reference(q, k, v, causal=True)
        mesh = self._mesh()
        with mesh:
            fn = lambda q_, k_, v_: causal_attention_packed(  # noqa: E731
                q_, k_, v_, h, interpret=True,
                batch_axis="data", heads_axis="model",
            )
            jaxpr = str(jax.make_jaxpr(fn)(qp, kp, vp))
            assert "shard_map" in jaxpr
            out = jax.jit(fn)(qp, kp, vp)
        out4 = np.asarray(out, np.float32).reshape(b, s, h, d).transpose(
            0, 2, 1, 3
        )
        np.testing.assert_allclose(
            out4, np.asarray(ref, np.float32), atol=2e-2
        )

    def test_no_wrap_outside_mesh_or_on_undivisible(self):
        from dalle_mtf_tpu.ops.attention import causal_attention_tp

        q, k, v = self._qkv(b=2, h=4)
        # no mesh in scope -> plain path, no shard_map in the jaxpr
        jaxpr = str(jax.make_jaxpr(
            lambda *a: causal_attention_tp(
                *a, batch_axis="data", heads_axis="model", interpret=True
            )
        )(q, k, v))
        assert "shard_map" not in jaxpr
        # heads=3 does not divide model:4 -> dense-reference fallback,
        # exact match
        q3, k3, v3 = (t[:, :3] for t in (q, k, v))
        with self._mesh():
            out = causal_attention_tp(
                q3, k3, v3, batch_axis="data", heads_axis="model",
                interpret=True,
            )
        np.testing.assert_allclose(
            np.asarray(out, np.float32),
            np.asarray(attention_reference(q3, k3, v3, True), np.float32),
            atol=1e-5,
        )
