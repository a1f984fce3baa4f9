"""Mesh construction and mtf-style layout rules.

The reference shards with two config strings (README.md:121-122):
  ``"mesh_shape": "data:16,model:2"`` — mapping of processors to named mesh
  axes (mtf.convert_to_shape, model_fns.py:81), and
  ``"layout": "batch_dim:data"`` — which named *logical* tensor dimensions are
  split over which mesh axes (mtf.convert_to_layout_rules, model_fns.py:82).

We keep the exact same schema but resolve it to a ``jax.sharding.Mesh`` and
``NamedSharding``s: every tensor in the framework carries a tuple of logical
dimension names, and ``logical_to_pspec`` maps those through the layout rules
to a ``PartitionSpec``. XLA GSPMD then inserts the ICI collectives that mtf's
SimdMeshImpl lowering used to emit (utils/utils.py:163-182).
"""

from __future__ import annotations

import logging
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

logger = logging.getLogger(__name__)

P = PartitionSpec


def parse_mesh_shape(mesh_shape: str | None) -> list[tuple[str, int]]:
    """Parse ``"data:16,model:2"`` into ``[("data", 16), ("model", 2)]``.

    Same grammar as ``mtf.convert_to_shape`` at the call site
    (model_fns.py:81); a missing/empty string means a 1-axis data mesh.
    """
    if not mesh_shape:
        return [("data", 1)]
    out = []
    for part in mesh_shape.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, size = part.partition(":")
        out.append((name.strip(), int(size)))
    if not out:
        return [("data", 1)]
    return out


def parse_layout(layout: str | None) -> dict[str, str]:
    """Parse ``"batch_dim:data,heads_dim:model"`` into a logical-dim -> mesh-axis map.

    Same grammar as ``mtf.convert_to_layout_rules`` at the call site
    (model_fns.py:82). Unlisted logical dims are replicated (mtf semantics).
    """
    if not layout:
        return {}
    rules: dict[str, str] = {}
    for part in layout.split(","):
        part = part.strip()
        if not part:
            continue
        logical, _, axis = part.partition(":")
        rules[logical.strip()] = axis.strip()
    return rules


def build_mesh(
    mesh_shape: str | Sequence[tuple[str, int]] | None,
    devices: Sequence[jax.Device] | None = None,
    allow_resize: bool = True,
) -> Mesh:
    """Build a ``jax.sharding.Mesh`` from an mtf-style mesh_shape string.

    The reference sized its mesh from the TPU topology handed over by
    TPUEstimator (utils/utils.py:163-182). Here the device list comes from
    ``jax.devices()``; if the requested axis product doesn't match the number
    of available devices and ``allow_resize`` is set, the *first* axis (data,
    by convention) is rescaled to fit so that configs written for a v3-32 run
    unchanged on any slice — model-parallel axes keep their requested size.
    """
    axes = parse_mesh_shape(mesh_shape) if isinstance(mesh_shape, (str, type(None))) else list(mesh_shape)
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    requested = int(np.prod([s for _, s in axes]))
    if requested != n:
        if not allow_resize:
            raise ValueError(
                f"mesh_shape {axes} needs {requested} devices but {n} are available"
            )
        # Keep non-leading (model/…) axes; clamp them to what fits, then give
        # the leading axis the rest.
        names = [name for name, _ in axes]
        tail = 1
        new_axes = [(names[0], 1)]
        for name, size in axes[1:]:
            size = min(size, max(1, n // tail))
            while size > 1 and (n % (tail * size)) != 0:
                size -= 1
            tail *= size
            new_axes.append((name, size))
        new_axes[0] = (names[0], n // tail)
        if new_axes != axes:
            logger.warning("resized mesh %s -> %s for %d devices", axes, new_axes, n)
        axes = new_axes
    shape = tuple(s for _, s in axes)
    names = tuple(name for name, _ in axes)
    dev_array = _device_mesh(shape, list(devices))
    return Mesh(dev_array, names)


def _device_mesh(shape: tuple[int, ...], devices: list) -> np.ndarray:
    """Topology-aware device layout.

    The reference relied on the TPUEstimator ``device_assignment`` so mtf's
    mesh respected the physical torus (utils/utils.py:163-182). The JAX
    equivalent is ``mesh_utils.create_device_mesh``, which orders devices so
    the *last* (model) axis rides the shortest ICI hops — an
    enumeration-order reshape can straddle the model axis across
    non-adjacent chips, taxing every TP collective. Falls back to a plain
    reshape for backends mesh_utils doesn't understand (CPU fake devices,
    device sublists).
    """
    try:
        from jax.experimental import mesh_utils  # noqa: PLC0415

        return mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception as e:  # pragma: no cover - backend specific
        logger.debug("mesh_utils.create_device_mesh unavailable (%s)", e)
        return np.asarray(devices).reshape(shape)


def logical_to_pspec(
    logical_axes: Sequence[str | None],
    rules: dict[str, str],
    mesh: Mesh | None = None,
) -> PartitionSpec:
    """Map a tuple of logical dimension names to a PartitionSpec via layout rules.

    mtf semantics (the layout solver's user-facing contract): a tensor
    dimension named ``d`` is split over mesh axis ``rules[d]`` if that rule
    exists and the axis is present in the mesh; otherwise the dimension is
    replicated. A mesh axis may be used at most once per tensor (mtf raises
    in that case; we also raise to surface layout bugs early).
    """
    mesh_axes = set(mesh.axis_names) if mesh is not None else None
    spec: list[str | None] = []
    used: set[str] = set()
    for dim in logical_axes:
        axis = rules.get(dim) if dim is not None else None
        if axis is not None and mesh_axes is not None and axis not in mesh_axes:
            axis = None
        if axis is not None:
            if axis in used:
                raise ValueError(
                    f"mesh axis {axis!r} used twice in logical shape {tuple(logical_axes)}"
                )
            used.add(axis)
        spec.append(axis)
    # Trim trailing Nones for cleanliness.
    while spec and spec[-1] is None:
        spec.pop()
    return PartitionSpec(*spec)


def named_sharding(
    mesh: Mesh, rules: dict[str, str], logical_axes: Sequence[str | None]
) -> NamedSharding:
    return NamedSharding(mesh, logical_to_pspec(logical_axes, rules, mesh))


def tree_shardings(mesh: Mesh, rules: dict[str, str], logical_tree):
    """Map a pytree of logical-axes tuples to a pytree of NamedShardings."""
    return jax.tree_util.tree_map(
        lambda axes: named_sharding(mesh, rules, axes),
        logical_tree,
        is_leaf=lambda x: isinstance(x, tuple),
    )


def shard_params(params, mesh: Mesh, rules: dict[str, str], logical_tree):
    """device_put a param pytree with shape-aware shardings.

    Unlike ``tree_shardings`` this checks divisibility: a dimension whose
    size doesn't divide by its mesh axis is replicated instead (mtf's layout
    solver likewise refused non-divisible splits). Needed for explicit
    ``jax.device_put`` — inside jit, with_sharding_constraint pads
    transparently, but host-side placement does not.
    """
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_a = jax.tree_util.tree_leaves(
        logical_tree, is_leaf=lambda x: isinstance(x, tuple)
    )
    out = []
    for leaf, axes in zip(flat_p, flat_a):
        spec = []
        for dim, name in zip(leaf.shape, axes):
            axis = rules.get(name)
            if axis is not None and axis in mesh.shape and dim % mesh.shape[axis] == 0:
                spec.append(axis)
            else:
                spec.append(None)
        out.append(
            jax.device_put(leaf, NamedSharding(mesh, PartitionSpec(*spec)))
        )
    return jax.tree_util.tree_unflatten(treedef, out)


def constrain(x, mesh: Mesh, rules: dict[str, str], *logical_axes: str | None):
    """`with_sharding_constraint` by logical dimension names (inside jit)."""
    return jax.lax.with_sharding_constraint(
        x, named_sharding(mesh, rules, logical_axes)
    )


def make_constrain(params, mesh: Mesh | None = None):
    """(mesh, constrain) from a config's ``mesh_shape``/``layout`` strings.

    The closure maps logical dimension names -> mesh axes through the layout
    rules, skipping constraints that don't divide (mtf's solver likewise
    refused non-divisible splits) so tiny debug shapes never crash.
    """
    if mesh is None:
        mesh = build_mesh(params.get("mesh_shape"))
    rules = parse_layout(params.get("layout"))

    def _constrain(x, *logical_axes):
        spec = []
        for dim, name in zip(x.shape, logical_axes):
            axis = rules.get(name) if name is not None else None
            if axis is not None and axis in mesh.shape and dim % mesh.shape[axis] == 0:
                spec.append(axis)
            else:
                spec.append(None)
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec(*spec))
        )

    return mesh, _constrain
