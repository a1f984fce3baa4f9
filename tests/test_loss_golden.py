"""Golden loss fixtures — the offline substitute for an mtf reference run.

Two pins (see PARITY.md "Loss parity without an mtf runtime"):

1. init loss == ln(vocab): the analytically known value a correctly
   normalized softmax-xent produces on a freshly initialized model.
2. a fixed-seed 100-step loss curve, committed as a fixture: any change to
   model numerics (init, attention, loss, optimizer wiring) shows up as a
   diff here. Regenerate intentionally with REGEN_FIXTURES=1.

Both run on the suite's deterministic 8-CPU-device backend.
"""

import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "dalle_loss_curve.json")

CFG = DalleConfig(
    n_embd=64, text_vocab_size=48, image_vocab_size=32,
    text_seq_len=8, image_seq_len=16, n_layers=2, n_heads=2,
)


def test_init_loss_is_ln_vocab():
    model = DALLE(CFG)
    params = model.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (8, CFG.total_seq_len), 0, CFG.total_tokens,
        dtype=jnp.int32,
    )
    loss, _ = jax.jit(lambda p, t: model.loss(p, t, train=False))(params, tokens)
    expected = math.log(CFG.total_tokens)  # ln(81) here; ln(52307) at coco scale
    assert abs(float(loss) - expected) < 0.05, (float(loss), expected)


def _run_curve():
    model = DALLE(CFG)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    data_rng = np.random.RandomState(0)
    pool = data_rng.randint(0, CFG.total_tokens, (32, CFG.total_seq_len)).astype(
        np.int32
    )

    @jax.jit
    def step(params, opt_state, tokens, r):
        def loss_fn(p):
            loss, _ = model.loss(p, tokens, r, train=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(2)
    curve = []
    for i in range(100):
        idx = np.random.RandomState(100 + i).randint(0, 32, 8)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(pool[idx]), jax.random.fold_in(key, i)
        )
        if (i + 1) % 10 == 0:
            curve.append(round(float(loss), 6))
    return curve


def test_fixed_seed_loss_curve_matches_fixture():
    curve = _run_curve()
    if os.environ.get("REGEN_FIXTURES"):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        with open(FIXTURE, "w") as f:
            json.dump({"curve_every10": curve}, f, indent=1)
    with open(FIXTURE) as f:
        golden = json.load(f)["curve_every10"]
    # overfit must actually happen (the curve is informative)...
    assert curve[-1] < curve[0] * 0.7
    # ...and match the committed trajectory (loose enough for XLA version
    # drift in fastmath fusions, tight enough to catch numerics changes)
    np.testing.assert_allclose(curve, golden, rtol=2e-3)
