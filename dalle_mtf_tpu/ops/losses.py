"""Losses.

- ``mse_loss``: reference src/vae_tf/layers.py:24-25.
- ``softmax_cross_entropy_with_logits``: numerically-stable xent with optional
  z-loss, matching ``mtf.layers.softmax_cross_entropy_with_logits(...,
  z_loss=0.0)`` as used by the DALLE loss (src/dalle_mtf/models.py:348-351).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse_loss(prediction: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(prediction - target))


def softmax_cross_entropy_with_logits(
    logits: jax.Array,
    targets: jax.Array,
    z_loss: float = 0.0,
) -> jax.Array:
    """Per-position cross entropy of integer ``targets`` under ``logits``.

    logits: [..., vocab] (fp32 — the model casts before the loss, mirroring
    dalle_mtf/models.py:391-395). targets: integer [...]. Returns [...] fp32.

    z_loss penalizes log(Z)^2 to keep the partition function near 1 — same
    knob mtf exposes; the reference passes 0.0 (models.py:350) but the
    capability is part of the surface.
    """
    # Gather the target logit in the INPUT dtype, upcasting only the [N]
    # result: conversion commutes with the gather (identical loss bits),
    # but gather is a kCustom call XLA cannot fuse a convert into — with
    # the upcast-then-gather order the whole [B, S, V] fp32 convert gets
    # materialized (4.7 GB write + read at dalle_coco scale) solely to
    # feed it (r4 profile, fusion.268: 10.75 ms/step). The lse path's
    # convert stays inside its reduce fusion either way. Under bf16 the
    # gradient differs only at bf16-rounding of the one-hot term —
    # dlogits is cast to bf16 before the dx/dw matmuls regardless.
    target_logits = jnp.take_along_axis(
        logits, targets[..., None].astype(jnp.int32), axis=-1
    )[..., 0].astype(jnp.float32)
    logits = logits.astype(jnp.float32)
    log_z = jax.nn.logsumexp(logits, axis=-1)
    loss = log_z - target_logits
    if z_loss:
        loss = loss + z_loss * jnp.square(log_z)
    return loss


def frechet_feature_distance(
    feats_a: jax.Array, feats_b: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """Diagonal-covariance Fréchet distance between two feature batches.

    feats_*: [N, C] fp32. The FID recipe (Fréchet distance between Gaussian
    fits of feature distributions) with a DIAGONAL covariance — the form
    that is well-posed per eval batch (a full CxC covariance needs N >> C)
    and runs offline with no Inception network (zero egress here): the
    features come from the VAE's own frozen encoder (encoder_features).
    Lower is better; identical batches score 0. This is a tracked relative
    quality signal, not a comparable-to-literature Inception FID.

        d = |mu_a - mu_b|^2 + sum(var_a + var_b - 2*sqrt(var_a*var_b))
    """
    fa = feats_a.astype(jnp.float32)
    fb = feats_b.astype(jnp.float32)
    mu_a, mu_b = fa.mean(0), fb.mean(0)
    va, vb = fa.var(0), fb.var(0)
    cov_term = va + vb - 2.0 * jnp.sqrt(jnp.maximum(va * vb, eps * eps))
    return jnp.sum(jnp.square(mu_a - mu_b)) + jnp.sum(cov_term)
