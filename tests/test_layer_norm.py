"""Fused Pallas LayerNorm (ops/layer_norm.py) — value + grad parity.

The kernel must match the model's fp32-compute XLA form (the reference's
normalize-then-affine, /root/reference/src/dalle_mtf/models.py:373-389)
bit-for-bit in fp32 and within bf16 rounding in bf16, including the dg/db
accumulation across the sequential row-block grid and the padded-rows path.
Kernels run under interpret=True on the CPU harness (same convention as
tests/test_ops.py for the attention kernels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle_mtf_tpu.ops.layer_norm import layer_norm, layer_norm_reference

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _make(r, e, dtype, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = (jax.random.normal(k1, (r, e), jnp.float32) * 2.0 + 0.3).astype(dtype)
    g = (1.0 + 0.1 * jax.random.normal(k2, (e,), jnp.float32)).astype(dtype)
    b = (0.05 * jax.random.normal(k3, (e,), jnp.float32)).astype(dtype)
    return x, g, b


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize(
    "r,e",
    [
        (256, 128),   # exactly one block
        (1024, 256),  # multi-block grid (dg/db accumulate across programs)
        (40, 128),    # r < block: small-rows path
        (300, 128),   # r % block != 0: padded tail rows
    ],
)
def test_forward_matches_reference(dtype, r, e):
    x, g, b = _make(r, e, dtype)
    y = layer_norm(x, g, b, use_pallas=True, interpret=True)
    y_ref = layer_norm_reference(x, g, b)
    assert y.dtype == dtype and y.shape == (r, e)
    if dtype == jnp.float32:
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)
    else:
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("r,e", [(256, 128), (640, 256), (300, 128)])
def test_grads_match_reference(dtype, r, e):
    x, g, b = _make(r, e, dtype, seed=1)
    w = jax.random.normal(jax.random.PRNGKey(7), (r, e), jnp.float32)

    def loss(fn):
        def f(x_, g_, b_):
            y = fn(x_, g_, b_)
            return jnp.sum(y.astype(jnp.float32) * w)
        return jax.grad(f, argnums=(0, 1, 2))(x, g, b)

    got = loss(lambda *a: layer_norm(*a, use_pallas=True, interpret=True))
    want = loss(layer_norm_reference)
    tol = dict(atol=1e-4, rtol=1e-4) if dtype == jnp.float32 else dict(
        atol=1.0, rtol=3e-2
    )
    for got_i, want_i, name in zip(got, want, ("dx", "dg", "db")):
        assert got_i.dtype == want_i.dtype, name
        np.testing.assert_allclose(
            np.asarray(got_i, np.float32), np.asarray(want_i, np.float32),
            err_msg=name, **tol,
        )


def test_leading_dims_and_fallback():
    # [B, S, E] inputs reshape through the kernel and back.
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 48, 128), jnp.bfloat16)
    g = jnp.ones((128,), jnp.bfloat16)
    b = jnp.zeros((128,), jnp.bfloat16)
    y = layer_norm(x, g, b, use_pallas=True, interpret=True)
    y_ref = layer_norm_reference(x, g, b)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )
    # E % 128 != 0 must fall back to the XLA reference exactly (padding
    # lanes would corrupt the row mean inside the kernel).
    x2 = jax.random.normal(jax.random.PRNGKey(3), (16, 96), jnp.float32)
    g2 = jnp.ones((96,), jnp.float32)
    b2 = jnp.zeros((96,), jnp.float32)
    y2 = layer_norm(x2, g2, b2, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(y2), np.asarray(layer_norm_reference(x2, g2, b2))
    )


def test_model_ln_impl_pallas_falls_back_on_cpu():
    # On the CPU harness the model's ln_impl="pallas" routes through
    # layer_norm(), which dispatches to the XLA reference (no TPU) — the
    # two impls must therefore produce identical logits here, proving the
    # config plumbing without a real chip.
    from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig

    def logits(ln_impl):
        cfg = DalleConfig(
            n_layers=2, n_heads=2, n_embd=128,
            text_vocab_size=64, image_vocab_size=32,
            text_seq_len=8, image_seq_len=8, ln_impl=ln_impl,
        )
        model = DALLE(cfg)
        params = model.init(jax.random.PRNGKey(0))
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 90)
        return model.forward(params, toks)

    np.testing.assert_array_equal(
        np.asarray(logits("xla")), np.asarray(logits("pallas"))
    )
