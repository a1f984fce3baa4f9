"""Pipeline parallelism: the layer stack sharded over a ``pipe`` mesh axis.

Absent from the reference (mtf's shipped layouts never split the layer dim;
SURVEY §2.3) — this is a beyond-parity capability for models whose layer
stack outgrows one chip's HBM even with TP (dalle_12B and beyond).

Design (GPipe schedule, TPU-first):

- the stacked layer params [L, ...] are sharded on their leading dim over
  the ``pipe`` axis (layout rule ``layers:pipe``) — GSPMD places each
  stage's L/P layers on its devices; no parameter copies.
- inside a ``shard_map`` manual over ``pipe`` only (other mesh axes stay
  automatic, so data/tensor sharding of the ops is unchanged), the batch is
  split into M microbatches and run on a rolled schedule of M+P−1 steps:
  stage 0 ingests microbatch t, every stage processes what it last
  received, and activations hop stage→stage via neighbor ``ppermute`` (ICI
  traffic only). The last stage's outputs are gathered by slot and made
  uniform with one ``psum`` over the pipe axis (every stage holds zeros in
  those slots except the last).
- the whole schedule is a ``lax.scan`` over the step index, so the GPipe
  BACKWARD schedule emerges from autodiff: ppermute transposes to the
  reverse hop, and the scan re-runs stages in reverse order. Remat applies
  per block exactly as in the sequential path (the caller passes the
  already-checkpoint-wrapped block body).

Bubble fraction is (P−1)/(M+P−1); M defaults to the pipe size and is
configurable (``pipeline_microbatches``). The final layer norm / logits /
loss head is NOT replicated over ``pipe``: the model re-shards the hidden
states' batch rows over (data, pipe) after the pipeline
(models/dalle.py::_shard_head_rows), so every downstream head op computes
each row exactly once across the pipe group — the reference computed its
loss once too (models.py:391-416). When the batch doesn't divide
(data × pipe) the re-shard is skipped with a logged warning and the head
falls back to pipe-replicated compute.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def pipeline_apply(body, layers_local, rngs_local, x, axis_name: str,
                   num_microbatches: int, scan_unroll: int = 1):
    """Run the layer stack as a GPipe pipeline. Call INSIDE shard_map.

    body: (x, (layer_params, layer_rng)) -> (x, None) — one block, already
    remat-wrapped by the caller; layer_rng is folded with the microbatch id
    so dropout draws differ per microbatch.
    layers_local: this stage's stacked params [L/P, ...];
    rngs_local: [L/P, 2]; x: [B, S, E] (batch may be sharded over auto
    mesh axes). Returns [B, S, E].
    """
    n_pipe = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    m = num_microbatches
    b = x.shape[0]
    if b % m != 0:
        raise ValueError(
            f"pipeline: batch {b} not divisible by {m} microbatches"
        )
    x_mb = x.reshape(m, b // m, *x.shape[1:])
    t_total = m + n_pipe - 1

    def local_stack(h0, mb_id):
        def scanned_body(h, pr):
            p, r = pr
            return body(h, (p, jax.random.fold_in(r, mb_id)))

        h, _ = jax.lax.scan(scanned_body, h0, (layers_local, rngs_local),
                            unroll=scan_unroll)
        return h

    perm = [(i, (i + 1) % n_pipe) for i in range(n_pipe)]

    def step(carry, t):
        act, outs = carry
        inp = jnp.where(idx == 0, x_mb[jnp.clip(t, 0, m - 1)], act)
        mb_id = jnp.clip(t - idx, 0, m - 1)
        out = local_stack(inp, mb_id)
        slot = jnp.clip(t - (n_pipe - 1), 0, m - 1)
        write = jnp.logical_and(idx == n_pipe - 1, t >= n_pipe - 1)
        cur = jax.lax.dynamic_index_in_dim(outs, slot, 0, keepdims=False)
        outs = jax.lax.dynamic_update_index_in_dim(
            outs, jnp.where(write, out, cur), slot, 0
        )
        act = jax.lax.ppermute(out, axis_name, perm)
        return (act, outs), None

    outs0 = jnp.zeros_like(x_mb)
    act0 = jnp.zeros_like(x_mb[0])
    (act, outs), _ = jax.lax.scan(
        step, (act0, outs0), jnp.arange(t_total)
    )
    # every stage holds zeros in outs except the last → one psum makes the
    # result uniform across the pipe axis
    outs = jax.lax.psum(outs, axis_name)
    return outs.reshape(b, *x.shape[1:])


def pipeline_hidden(body, layers, layer_rngs, x, mesh, pipe_axis: str,
                    num_microbatches: int | None = None,
                    scan_unroll: int = 1):
    """shard_map wrapper: shard the stacked layer params/rngs over
    ``pipe_axis`` (all other mesh axes stay automatic) and run the GPipe
    schedule. layers: full stacked pytree [L, ...]; x: [B, S, E]."""
    from jax import shard_map  # noqa: PLC0415
    from jax.sharding import PartitionSpec as P  # noqa: PLC0415

    n_pipe = mesh.shape[pipe_axis]
    if num_microbatches is None:
        num_microbatches = n_pipe
    layer_specs = jax.tree_util.tree_map(lambda _: P(pipe_axis), layers)
    fn = shard_map(
        partial(pipeline_apply, body, axis_name=pipe_axis,
                num_microbatches=num_microbatches, scan_unroll=scan_unroll),
        mesh=mesh,
        in_specs=(layer_specs, P(pipe_axis), P()),
        out_specs=P(),
        # manual over the pipe axis only — data/model/seq axes stay
        # automatic so GSPMD shards the in-stage ops as usual
        axis_names=frozenset({pipe_axis}),
        check_vma=False,
    )
    return fn(layers, layer_rngs, x)
