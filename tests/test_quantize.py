import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
from dalle_mtf_tpu.quantize import (
    _PACK_AXIS,
    pack_int4,
    quantize_layers_int4,
    quantize_layers_int8,
    unpack_int4,
)
from dalle_mtf_tpu.sample import generate_image_tokens

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = DalleConfig(
    n_embd=64, text_vocab_size=40, image_vocab_size=32,
    text_seq_len=8, image_seq_len=16, n_layers=2, n_heads=2,
)


def test_quantized_weights_close():
    model = DALLE(CFG)
    params = model.init(jax.random.PRNGKey(0))
    qp = quantize_layers_int8(params)
    assert qp["layers"]["wq"].dtype == jnp.int8
    w = np.asarray(params["layers"]["wq"])
    wq = np.asarray(qp["layers"]["wq"]) * np.asarray(qp["layers"]["wq_scale"])
    # per-column int8: max error bounded by scale/2 = max|w|/254 per column
    col_max = np.abs(w).max(axis=1, keepdims=True)
    assert (np.abs(w - wq) <= col_max / 254 + 1e-8).all()


def test_quantized_forward_close_and_decode_runs():
    model = DALLE(CFG)
    params = model.init(jax.random.PRNGKey(0))
    qp = quantize_layers_int8(params)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (2, CFG.total_seq_len), 0, CFG.total_tokens
    )
    logits = model.forward(params, tokens, train=False)
    qlogits = model.forward(qp, tokens, train=False)
    # int8 weight noise perturbs logits mildly relative to their spread
    spread = float(np.asarray(logits).std())
    err = float(np.abs(np.asarray(logits) - np.asarray(qlogits)).max())
    assert err < 0.15 * spread + 0.05, (err, spread)

    text = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 40)
    toks = generate_image_tokens(model, qp, text, jax.random.PRNGKey(3), top_k=8)
    assert toks.shape == (1, 16)
    assert int(toks.min()) >= 0 and int(toks.max()) < CFG.image_vocab_size


def test_w_out_quantized_both_paths():
    """The output projection joins the quantized stream — at dalle_coco
    scale it is ~26% of the decode weight traffic and previously streamed
    as fp32 masters (dalle.py::_last_logits)."""
    model = DALLE(CFG)
    params = model.init(jax.random.PRNGKey(0))
    q8 = quantize_layers_int8(params)
    assert q8["w_out"].dtype == jnp.int8
    assert q8["w_out_scale"].shape == (1, CFG.total_tokens)
    q4 = quantize_layers_int4(params)
    assert q4["w_out"].dtype == jnp.int8
    assert q4["w_out"].shape[0] == params["w_out"].shape[0] // 2
    assert q4.get("w_out_int4") is not None
    # dequantized w_out within the int8 per-column bound
    w = np.asarray(params["w_out"])
    deq = np.asarray(q8["w_out"]) * np.asarray(q8["w_out_scale"])
    col_max = np.abs(w).max(axis=0, keepdims=True)
    assert (np.abs(w - deq) <= col_max / 254 + 1e-8).all()


def test_int4_pack_roundtrip_exact():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randint(-7, 8, (2, 6, 4)), jnp.int8)
    for ax in (1, 2):
        packed = pack_int4(q, ax)
        assert packed.shape[ax] == q.shape[ax] // 2
        back = unpack_int4(packed, ax)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(q))


def test_int4_weights_close_and_half_the_bytes():
    model = DALLE(CFG)
    params = model.init(jax.random.PRNGKey(0))
    qp = quantize_layers_int4(params)
    assert qp["layers"]["wq"].dtype == jnp.int8
    # packed: half the elements of the int8 form along the contraction axis
    assert qp["layers"]["wq"].shape[1] == params["layers"]["wq"].shape[1] // 2
    w = np.asarray(params["layers"]["w_mlp1"])
    deq = np.asarray(
        unpack_int4(qp["layers"]["w_mlp1"], _PACK_AXIS["w_mlp1"])
    ) * np.asarray(qp["layers"]["w_mlp1_scale"])
    # per-column int4: max error bounded by scale/2 = max|w|/14 per column
    col_max = np.abs(w).max(axis=1, keepdims=True)
    assert (np.abs(w - deq) <= col_max / 14 + 1e-8).all()


def test_int4_forward_close_and_decode_runs():
    model = DALLE(CFG)
    params = model.init(jax.random.PRNGKey(0))
    qp = quantize_layers_int4(params)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (2, CFG.total_seq_len), 0, CFG.total_tokens
    )
    logits = model.forward(params, tokens, train=False)
    qlogits = model.forward(qp, tokens, train=False)
    # int4 noise is ~18x int8's; still mild relative to logit spread at
    # these widths
    spread = float(np.asarray(logits).std())
    err = float(np.abs(np.asarray(logits) - np.asarray(qlogits)).max())
    assert err < 0.8 * spread + 0.2, (err, spread)

    text = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 40)
    toks = generate_image_tokens(model, qp, text, jax.random.PRNGKey(3), top_k=8)
    assert toks.shape == (1, 16)
    assert int(toks.min()) >= 0 and int(toks.max()) < CFG.image_vocab_size


def test_banded_logits_equal_full_slice_all_formats():
    """decode_step with band=(lo, hi) must return exactly the [lo:hi)
    column slice of the full-vocab logits, for fp32 master, int8, and
    packed-int4 w_out (the band slices the packed bytes / scales by
    OUTPUT column, which the split-half input-dim packing leaves intact)."""
    model = DALLE(CFG)
    params = model.init(jax.random.PRNGKey(0))
    lo = CFG.text_vocab_size
    hi = lo + CFG.image_vocab_size
    tok = jnp.array([lo + 3, lo + 7], jnp.int32)
    for name, pf in (
        ("fp32", lambda p: p),
        ("int8", quantize_layers_int8),
        ("int4", quantize_layers_int4),
    ):
        p = pf(params)
        cache = model.init_cache(2)
        pos = jnp.int32(CFG.text_seq_len)
        full, _ = model.decode_step(p, cache, tok, pos)
        banded, _ = model.decode_step(p, cache, tok, pos, band=(lo, hi))
        np.testing.assert_array_equal(
            np.asarray(full[:, lo:hi]), np.asarray(banded), err_msg=name
        )
