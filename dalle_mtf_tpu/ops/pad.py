"""Constant pad with an explicit custom gradient.

Parity demonstration for the reference's one custom op,
``CustomPadOperation`` (src/dalle_mtf/ops.py:13-68): an mtf Operation that
pads one named dimension with a constant, defines its gradient as the
inverse slice, and lowers per-slice. In JAX the same capability — adding an
op with its own lowering and gradient — is ``jax.custom_vjp``; this module
is the direct equivalent (and the attention kernel in ops/attention.py is
the production-scale example of the same pattern).

The reference op refused to pad a mesh-split dimension (ops.py:41-42);
under GSPMD that restriction is obsolete — XLA re-shards the padded result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def pad(x: jax.Array, paddings: tuple[int, int], axis: int, pad_value=0.0):
    """Pad ``axis`` of ``x`` by (before, after) with ``pad_value``."""
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = tuple(paddings)
    return jnp.pad(x, cfg, constant_values=pad_value)


def _pad_fwd(x, paddings, axis, pad_value):
    return pad(x, paddings, axis, pad_value), None


def _pad_bwd(paddings, axis, _pad_value, _res, g):
    # gradient of pad = slice back to the original extent (ops.py:33-37)
    before, after = paddings
    size = g.shape[axis] - before - after
    return (jax.lax.slice_in_dim(g, before, before + size, axis=axis),)


pad.defvjp(_pad_fwd, _pad_bwd)


def exists(x) -> bool:
    """reference ops.py:72-73."""
    return x is not None
