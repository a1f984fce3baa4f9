import jax
import jax.numpy as jnp
import numpy as np

from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
from dalle_mtf_tpu.quantize import quantize_layers_int8
from dalle_mtf_tpu.sample import generate_image_tokens

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
