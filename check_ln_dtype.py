"""Matched-params precision check for ln_dtype="activation".

The reference's norm (layers.py:30-33) computes mean/var/rsqrt in the
ACTIVATION dtype — bf16 under `bf_16` — so ln_dtype="activation" is the
ref-exact layernorm; our default ("float32") upcasts and is strictly more
precise. Before shipping the activation-dtype LN as a perf default this
harness bounds its numeric effect the same way PARITY_AB.md bounds the
bf16 policy: train one bf16 model briefly (activation-LN arm, same seeds
and synthetic data as parity_ab.py), then evaluate the SAME final params
under both LN dtypes. The delta isolates the LN compute dtype from
optimization noise.

Prints one JSON line; ~3 min on one v5e chip.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from parity_ab import synth_images

STEPS = 100
EVAL_BATCHES = 4


def main():
    import dataclasses

    from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
    from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig

    vae_cfg = VAEConfig.from_params(
        {
            "dataset": {"image_size": 256},
            "num_tokens": 2048,
            "convblocks": [[2, 128], [3, 256], [5, 512]],
            "use_bf16": True,
        }
    )
    vae = DiscreteVAE(vae_cfg)
    vae_params = jax.jit(vae.init)(jax.random.PRNGKey(7))

    cfg = DalleConfig(
        n_embd=1024, text_vocab_size=50258, image_vocab_size=2048,
        text_seq_len=256, image_seq_len=vae_cfg.image_seq_len,
        n_layers=12, n_heads=8, bf_16=True, recompute_grad=True,
        ln_dtype="activation",
    )
    model = DALLE(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))

    batch = 8
    rng = np.random.RandomState(0)
    pool_imgs = synth_images(rng, 64, 256)
    pool_caps = rng.randint(
        0, cfg.text_vocab_size, (64, cfg.text_seq_len)
    ).astype(np.int32)

    def tokens_of(imgs, caps):
        t = vae.encode_tokens(vae_params, imgs)
        t = jax.lax.stop_gradient(t) + cfg.text_vocab_size
        return jnp.concatenate([caps, t], axis=1)

    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(1e-4, b1=0.9, b2=0.999, weight_decay=0.0),
    )
    opt_state = jax.jit(opt.init)(params)

    @jax.jit
    def train_step(params, opt_state, imgs, caps, r):
        toks = tokens_of(imgs, caps)

        def loss_fn(p):
            loss, _ = model.loss(p, toks, r, train=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(STEPS):
        idx = np.random.RandomState(100 + i).randint(0, 64, batch)
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(pool_imgs[idx]),
            jnp.asarray(pool_caps[idx]), jax.random.fold_in(key, i),
        )

    model_act = DALLE(cfg)
    model_f32 = DALLE(dataclasses.replace(cfg, ln_dtype="float32"))
    model_full = DALLE(
        dataclasses.replace(cfg, ln_dtype="float32", bf_16=False)
    )

    @jax.jit
    def eval_three(params, imgs, caps):
        toks = tokens_of(imgs, caps)
        la, _ = model_act.loss(params, toks, train=False)
        lf, _ = model_f32.loss(params, toks, train=False)
        lz, _ = model_full.loss(params, toks, train=False)
        return la, lf, lz

    ev_a, ev_f, ev_z = [], [], []
    for j in range(EVAL_BATCHES):
        idx = np.random.RandomState(900 + j).randint(0, 64, batch)
        la, lf, lz = eval_three(
            params, jnp.asarray(pool_imgs[idx]), jnp.asarray(pool_caps[idx])
        )
        ev_a.append(float(la))
        ev_f.append(float(lf))
        ev_z.append(float(lz))
    a, f, z = float(np.mean(ev_a)), float(np.mean(ev_f)), float(np.mean(ev_z))
    print(json.dumps({
        "eval_ln_activation": round(a, 5),
        "eval_ln_float32": round(f, 5),
        "eval_full_fp32": round(z, 5),
        "ln_matched_params_delta_pct": round(abs(a - f) / f * 100, 4),
        "vs_full_fp32_delta_pct": round(abs(a - z) / z * 100, 4),
        "train_loss_final": round(float(loss), 4),
        "wall_s": round(time.perf_counter() - t0, 1),
    }))


if __name__ == "__main__":
    main()
