"""Gumbel-softmax with straight-through estimator.

Numerics mirror the reference (src/vae_tf/layers.py:4-21 — the production
path): logits are cast to fp32, Gumbel noise is ``-log(-log(U))`` with U drawn
from [1e-9, 1), the softmax is taken over ``(logits + g) / temperature``, and
the hard path uses the straight-through trick
``stop_gradient(one_hot - soft) + soft`` (also src/dalle_mtf/layers.py:5-23).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_softmax(
    rng: jax.Array,
    logits: jax.Array,
    temperature: float | jax.Array = 1.0,
    hard: bool = True,
    axis: int = -1,
) -> jax.Array:
    logits = logits.astype(jnp.float32)
    smol = 1e-9
    u = jax.random.uniform(
        rng, logits.shape, dtype=logits.dtype, minval=smol, maxval=1.0
    )
    g = -jnp.log(-jnp.log(u))
    sample = jax.nn.softmax((logits + g) / temperature, axis=axis)
    if hard:
        idx = jnp.argmax(sample, axis=axis)
        sample_hard = jax.nn.one_hot(
            idx, sample.shape[axis], axis=axis, dtype=sample.dtype
        )
        sample = jax.lax.stop_gradient(sample_hard - sample) + sample
    return sample
