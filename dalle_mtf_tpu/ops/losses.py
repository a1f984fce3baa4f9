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
    logits = logits.astype(jnp.float32)
    log_z = jax.nn.logsumexp(logits, axis=-1)
    target_logits = jnp.take_along_axis(
        logits, targets[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    loss = log_z - target_logits
    if z_loss:
        loss = loss + z_loss * jnp.square(log_z)
    return loss
