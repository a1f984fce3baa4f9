"""Optimizer factory — reference semantics (src/optimizers.py:19-104).

Defaults: cosine decay to 10% of base LR (alpha=0.1), 3000 linear warmup
steps applied multiplicatively on top of the decayed LR, global-norm clip 1.0,
Adam(W) with weight decay excluded from anything norm- or bias-like
(exclude_from_weight_decay=["norm", "bias"], optimizers.py:89), optional
Adafactor. Optimizer math is fp32 on fp32 master params (the reference casts
grads to the slice dtype fp32, optimizers.py:44).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import optax


def lr_schedule(params: Mapping[str, Any]) -> Callable[[jax.Array], jax.Array]:
    """Build the step -> learning-rate function.

    Exact reference behavior (optimizers.py:46-76): decay first (linear
    polynomial to 10% of base, or cosine with alpha=0.1, over
    ``lr_decay_end``/``train_steps`` steps), then during warmup multiply the
    *decayed* LR by step/warmup_steps.
    """
    base_lr = params["lr"]
    end_step = params.get("lr_decay_end") or params.get("train_steps") or 10_000
    decay = params.get("lr_decay") if params.get("lr_decay") is not None else "cosine"
    warmup_steps = params.get("warmup_steps")
    if warmup_steps is None:
        warmup_steps = 3000

    def schedule(step: jax.Array) -> jax.Array:
        step_f = jnp.asarray(step, jnp.float32)
        frac = jnp.minimum(step_f / end_step, 1.0)
        if decay == "linear":
            lr = base_lr - (base_lr - base_lr * 0.1) * frac
        elif decay == "cosine":
            alpha = 0.1
            cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
            lr = base_lr * ((1.0 - alpha) * cosine + alpha)
        elif decay in (None, "none", "constant"):
            lr = jnp.asarray(base_lr, jnp.float32)
        else:
            raise ValueError(f"unknown lr_decay {decay!r}")
        if warmup_steps and warmup_steps > 0:
            pct = step_f / float(warmup_steps)
            lr = jnp.where(step_f < warmup_steps, lr * pct, lr)
        return lr

    return schedule


def _no_weight_decay(path: tuple, _leaf) -> bool:
    """True if this param is excluded from weight decay.

    mtf excluded variables whose name matched r"norm|bias"
    (optimizers.py:89). Our trees name norm scales ln*_g/ln*_b and biases
    b/o_b/b_*; the codebook and embeddings get decay like mtf's would.
    """
    for k in path:
        name = getattr(k, "key", getattr(k, "name", str(k)))
        if name is None:
            continue
        name = str(name)
        if (
            "ln" in name
            or "norm" in name
            or "bias" in name
            or name == "b"
            or name == "o_b"
            or name.startswith("b_")
        ):
            return True
    return False


def decay_mask(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: not _no_weight_decay(path, leaf), params
    )


def fused_adamw(
    schedule: Callable[[jax.Array], jax.Array],
    b1: float,
    b2: float,
    eps: float,
    weight_decay: float,
    mask_fn: Callable[[Any], Any] | None,
    clip: float | None,
) -> optax.GradientTransformation:
    """Single-pass AdamW + global-norm clip, math-identical to the default
    ``optax.chain(clip_by_global_norm, adamw(learning_rate=schedule))``.

    The optax chain runs the update as several tree passes (clip scaling,
    moment updates, bias correction, decayed weights, LR scaling), each a
    separate read-modify-write over the 180M-param state. The r4b profile
    measured the whole update at 10.4 ms vs a ~6.3 ms traffic floor
    (read g/m/v/p + write m/v/p once). Here everything after the global
    norm (one unavoidable full read of g) happens in ONE fused per-leaf
    expression, so XLA emits a single loop per leaf:

        g'  = g * clip/max(|g|_2, clip)
        m'  = b1*m + (1-b1)*g';          v' = b2*v + (1-b2)*g'^2
        u   = -lr(t) * (m'/(1-b1^(t+1)) / (sqrt(v'/(1-b2^(t+1))) + eps)
                        + wd*mask*p)

    Equivalence is pinned by tests/test_trainer.py (same trajectories as
    the optax chain within float tolerance). Selected via config
    ``fused_optimizer: true`` — the default stays the optax chain, whose
    trajectories the committed loss fixtures pin bitwise.

    Two scoped caveats vs the optax chain:
    - moments are always f32 here, while ``optax.adamw(mu_dtype=None)``
      keeps them in the param dtype. The trainer's precision policy makes
      master params f32 (utils/precision.py), so the two coincide on
      every shipped path; a hypothetical non-f32-param run would diverge
      (and get f32 moments — the safer choice).
    - the opt state is a {count, m, v} dict, not optax's tuple-of-states:
      flipping ``fused_optimizer`` mid-run makes checkpoint restore fail
      loudly on the tree mismatch (start a fresh run to switch).
    """

    def init(params):
        return {
            "count": jnp.zeros((), jnp.int32),
            "m": jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, jnp.float32), params
            ),
            "v": jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, jnp.float32), params
            ),
        }

    def update(grads, state, params=None):
        count = state["count"]
        count_inc = count + 1
        if clip:
            gnorm = jnp.sqrt(
                sum(
                    jnp.sum(jnp.square(g.astype(jnp.float32)))
                    for g in jax.tree_util.tree_leaves(grads)
                )
            )
            gscale = clip / jnp.maximum(gnorm, clip)
        else:
            gscale = jnp.float32(1.0)
        # optax.scale_by_schedule calls schedule with its PRE-increment
        # count (first update sees t=0), scale_by_adam bias-corrects with
        # the post-increment count
        lr = schedule(count)
        bc1 = 1.0 - b1 ** count_inc.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count_inc.astype(jnp.float32)
        mask = mask_fn(params) if (mask_fn is not None and weight_decay) else None

        def leaf(g, m, v, p, use_decay):
            g = g.astype(jnp.float32) * gscale
            m_new = b1 * m + (1.0 - b1) * g
            v_new = b2 * v + (1.0 - b2) * jnp.square(g)
            u = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
            if weight_decay and use_decay:
                u = u + weight_decay * p.astype(jnp.float32)
            return (-lr * u).astype(p.dtype), m_new, v_new

        if mask is None:
            out = jax.tree_util.tree_map(
                lambda g, m, v, p: leaf(g, m, v, p, bool(weight_decay)),
                grads, state["m"], state["v"], params,
            )
        else:
            out = jax.tree_util.tree_map(
                lambda g, m, v, p, d: leaf(g, m, v, p, d),
                grads, state["m"], state["v"], params, mask,
            )
        treedef = jax.tree_util.tree_structure(grads)
        updates, ms, vs = (
            jax.tree_util.tree_unflatten(
                treedef, [t[i] for t in jax.tree_util.tree_leaves(
                    out, is_leaf=lambda x: isinstance(x, tuple))]
            )
            for i in range(3)
        )
        return updates, {"count": count_inc, "m": ms, "v": vs}

    return optax.GradientTransformation(init, update)


def get_optimizer(
    params: Mapping[str, Any]
) -> tuple[optax.GradientTransformation, Callable[[jax.Array], jax.Array]]:
    """Returns (optax transformation, lr schedule fn).

    Config keys honored (same schema as the reference): ``optimizer``
    ("adam"|"adafactor"), ``lr``, ``lr_decay``, ``lr_decay_end``,
    ``warmup_steps``, ``gradient_clipping``, ``weight_decay``, ``beta_1``,
    ``beta_2``, ``epsilon``. New (beyond the reference):
    ``skip_nonfinite_updates`` — an int N > 0 wraps the whole chain in
    ``optax.apply_if_finite``: a step whose gradients contain NaN/inf is
    SKIPPED (params and inner optimizer state untouched) rather than
    poisoning the run, up to N consecutive skips before the bad updates
    are applied anyway (surfacing the divergence instead of silently
    freezing). Production guard for loss spikes at 12B scale; the
    reference would NaN the whole parameter tree.
    """
    schedule = lr_schedule(params)
    name = (params.get("optimizer") or "adam").lower()
    clip = params.get("gradient_clipping")
    if clip is None:
        clip = 1.0

    if name == "adam" and params.get("fused_optimizer"):
        # single-pass clip+AdamW (see fused_adamw) — opt-in so the default
        # trajectories stay bitwise-pinned by the committed loss fixtures
        tx = fused_adamw(
            schedule,
            b1=params.get("beta_1") or 0.9,
            b2=params.get("beta_2") or 0.999,
            eps=params.get("epsilon") or 1e-6,
            weight_decay=params.get("weight_decay") or 0.0,
            mask_fn=decay_mask,
            clip=clip or None,
        )
        skip = params.get("skip_nonfinite_updates")
        if skip:
            tx = optax.apply_if_finite(tx, max_consecutive_errors=int(skip))
        return tx, schedule

    chain = []
    if clip:
        chain.append(optax.clip_by_global_norm(clip))
    if name == "adam":
        chain.append(
            optax.adamw(
                learning_rate=schedule,
                b1=params.get("beta_1") or 0.9,
                b2=params.get("beta_2") or 0.999,
                eps=params.get("epsilon") or 1e-6,
                weight_decay=params.get("weight_decay") or 0.0,
                mask=decay_mask,
            )
        )
    elif name == "adafactor":
        # The reference wires mtf Adafactor with decay_rate=weight_decay
        # (default 0.0), which disables the second-moment decay entirely — a
        # latent bug we do not copy; optax's default decay schedule is used
        # unless an explicit adafactor_decay_rate is given.
        chain.append(
            optax.adafactor(
                learning_rate=schedule,
                decay_rate=params.get("adafactor_decay_rate") or 0.8,
                clipping_threshold=params.get("adafactor_clipping") or 1.0,
                eps=params.get("epsilon_1") or 1e-30,
            )
        )
    else:
        raise ValueError(f"{name} not recognized")
    tx = optax.chain(*chain)
    skip = params.get("skip_nonfinite_updates")
    if skip:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=int(skip))
    return tx, schedule
