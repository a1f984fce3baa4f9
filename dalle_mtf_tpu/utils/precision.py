"""Mixed-precision policy.

The reference uses mtf's three-dtype ``VariableDType(master, slice,
activation)``: with bf_16 on it stores checkpoints in bf16, does optimizer
math in fp32, and computes activations in bf16 (reference:
src/dalle_mtf/ops.py:76-82); logits and gradients are cast to fp32
(dalle_mtf/models.py:391-395, optimizers.py:44); the TF-VAE path wraps the
forward in ``tf.tpu.bfloat16_scope`` (model_fns_tf.py:48-53).

We keep the same three roles but make the master dtype fp32 even when bf16
compute is on: storing masters in bf16 (as mtf does) loses precision across
checkpoint round-trips for zero TPU-side benefit — the MXU reads bf16
activations either way, and optimizer state dominates checkpoint size. This
is a deliberate, documented divergence in service of the "eval loss within
1%" parity budget.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Three-dtype precision policy (master / compute / output)."""

    master_dtype: jnp.dtype  # parameter storage + optimizer math
    compute_dtype: jnp.dtype  # activations and matmul inputs
    output_dtype: jnp.dtype  # logits / losses / gradients

    def cast_to_compute(self, tree):
        import jax

        def cast(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(self.compute_dtype)
            return x

        return jax.tree_util.tree_map(cast, tree)

    def cast_to_output(self, x):
        return x.astype(self.output_dtype)


def get_policy(bf_16: bool | None) -> Policy:
    """JAX equivalent of the reference's ``get_variable_dtype(bf_16)``
    (src/dalle_mtf/ops.py:76-82)."""
    if bf_16:
        return Policy(
            master_dtype=jnp.float32,
            compute_dtype=jnp.bfloat16,
            output_dtype=jnp.float32,
        )
    return Policy(
        master_dtype=jnp.float32,
        compute_dtype=jnp.float32,
        output_dtype=jnp.float32,
    )
