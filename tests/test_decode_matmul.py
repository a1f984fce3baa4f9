"""Streaming dequant matmul kernels (ops/decode_matmul.py) vs their einsum
references, in Pallas interpret mode on CPU. The model-level dispatch
(_streaming_eligible) only engages on a real TPU backend; these pin the
kernel numerics, including the ragged-N tail path (w_out's 50771 vocab)."""

import jax
import jax.numpy as jnp
import numpy as np

from dalle_mtf_tpu.ops.decode_matmul import int4_matmul, int8_matmul
from dalle_mtf_tpu.quantize import nibble_views, pack_int4


def _mk(m, k, n, seed=0):
    kx, kw = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(kx, (m, k), jnp.float32)
    w = jax.random.normal(kw, (k, n), jnp.float32) * 0.05
    return x, w


def _quant_int8(w):
    scale = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quant_int4(w):
    scale = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 7.0
    q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int8)
    return pack_int4(q, 0), scale


class TestInt8Matmul:
    def test_matches_einsum_aligned(self):
        x, w = _mk(4, 256, 1024)
        q, scale = _quant_int8(w)
        ref = jnp.einsum(
            "mk,kn->mn", x.astype(jnp.bfloat16),
            (q.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)),
            preferred_element_type=jnp.float32,
        )
        out = int8_matmul(x.astype(jnp.bfloat16), q, scale, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0.02, atol=0.02
        )

    def test_ragged_tail(self):
        # N = 1100: one 512-block pair + an 76-column einsum tail
        x, w = _mk(2, 256, 1100)
        q, scale = _quant_int8(w)
        ref = jnp.einsum(
            "mk,kn->mn", x.astype(jnp.bfloat16),
            (q.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)),
            preferred_element_type=jnp.float32,
        )
        out = int8_matmul(x.astype(jnp.bfloat16), q, scale, interpret=True)
        assert out.shape == (2, 1100)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0.02, atol=0.02
        )


class TestInt4Matmul:
    def test_matches_nibble_einsum(self):
        x, w = _mk(8, 512, 1024, seed=1)
        packed, scale = _quant_int4(w)
        lo, hi = nibble_views(packed)
        s16 = scale.astype(jnp.bfloat16)
        x16 = x.astype(jnp.bfloat16)
        kp = 256
        ref = jnp.einsum(
            "mk,kn->mn", x16[:, :kp], lo.astype(jnp.bfloat16) * s16,
            preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "mk,kn->mn", x16[:, kp:], hi.astype(jnp.bfloat16) * s16,
            preferred_element_type=jnp.float32,
        )
        out = int4_matmul(x16[:, :kp], x16[:, kp:], packed, scale, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0.02, atol=0.02
        )

    def test_ragged_tail_and_small_m(self):
        x, w = _mk(1, 512, 700, seed=2)
        packed, scale = _quant_int4(w)
        x16 = x.astype(jnp.bfloat16)
        out = int4_matmul(x16[:, :256], x16[:, 256:], packed, scale, interpret=True)
        assert out.shape == (1, 700)
        # dense dequant reference
        from dalle_mtf_tpu.quantize import unpack_int4

        wd = unpack_int4(packed, 0).astype(jnp.float32) * scale
        ref = jnp.einsum("mk,kn->mn", x, wd)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0.05, atol=0.05
        )
