"""Golden loss fixtures for the NON-DEFAULT numerics arms (VERDICT r3 #8).

test_loss_golden.py pins the default dense-loss arm; these pin the other
shipped numerics modes with their own committed 100-step trajectories, so
slow drift in any of them fails the suite, not just step-1 exactness:

- fused_xent=true (chunked streaming loss, ops/xent_fused.py)
- ring sequence parallelism on a data:2,seq:4 mesh (ops/ring_attention.py)
- pipeline parallelism on a pipe:2,data:2 mesh (parallel/pipeline.py)
- attn_packed=false (the r1-r3 [B,H,S,D] attention layout — its qkv
  projection contracts in a different f32 association order than the r4
  packed default, so it keeps its own pinned trajectory; the fixture
  equals the pre-r4 default-arm fixture bit for bit)

All three use the same tiny model/data/optimizer schedule as the default
fixture. Regenerate intentionally with REGEN_FIXTURES=1 (all four fixtures
regenerate through the same env knob; see PARITY.md).
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
from dalle_mtf_tpu.parallel.mesh import build_mesh

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")

CFG = DalleConfig(
    n_embd=64, text_vocab_size=48, image_vocab_size=32,
    text_seq_len=8, image_seq_len=16, n_layers=2, n_heads=2,
)


def _run_curve(cfg, mesh=None, fused_xent=False, batch=8):
    model = DALLE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    data_rng = np.random.RandomState(0)
    pool = data_rng.randint(
        0, cfg.total_tokens, (32, cfg.total_seq_len)
    ).astype(np.int32)

    @jax.jit
    def step(params, opt_state, tokens, r):
        def loss_fn(p):
            loss, _ = model.loss(
                p, tokens, r, train=True, fused_xent=fused_xent
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(2)
    curve = []
    from contextlib import nullcontext

    with mesh if mesh is not None else nullcontext():
        for i in range(100):
            idx = np.random.RandomState(100 + i).randint(0, 32, batch)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(pool[idx]),
                jax.random.fold_in(key, i),
            )
            if (i + 1) % 10 == 0:
                curve.append(round(float(loss), 6))
    return curve


def _assert_curve(name, curve):
    path = os.path.join(FIXDIR, name)
    if os.environ.get("REGEN_FIXTURES"):
        os.makedirs(FIXDIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump({"curve_every10": curve}, f, indent=1)
    with open(path) as f:
        golden = json.load(f)["curve_every10"]
    assert curve[-1] < curve[0] * 0.7
    np.testing.assert_allclose(curve, golden, rtol=2e-3)


@pytest.mark.slow
def test_fused_xent_loss_curve_matches_fixture():
    curve = _run_curve(CFG, fused_xent=True)
    _assert_curve("dalle_loss_curve_fused_xent.json", curve)


@pytest.mark.slow
def test_ring_sp_loss_curve_matches_fixture():
    cfg = dataclasses.replace(
        CFG, attention_type="ring", ring_seq_axis="seq",
        ring_batch_axis="data",
    )
    mesh = build_mesh("data:2,seq:4")
    curve = _run_curve(cfg, mesh=mesh)
    _assert_curve("dalle_loss_curve_ring_sp.json", curve)


@pytest.mark.slow
def test_unpacked_attn_loss_curve_matches_fixture():
    cfg = dataclasses.replace(CFG, attn_packed=False)
    curve = _run_curve(cfg)
    _assert_curve("dalle_loss_curve_unpacked.json", curve)


@pytest.mark.slow
def test_pipeline_loss_curve_matches_fixture():
    cfg = dataclasses.replace(CFG, pipe_axis="pipe")
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("pipe", "data"))
    curve = _run_curve(cfg, mesh=mesh)
    _assert_curve("dalle_loss_curve_pipeline.json", curve)
