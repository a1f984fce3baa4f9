"""Model/graph introspection — the reference's ``get_graph_info``
(src/utils/utils.py:55-100) printed the parameter count and every mtf
dimension name so a human could sanity-check the sharding layout at startup.
Here: a table of parameter paths, shapes, logical dimension names, and the
resolved PartitionSpec per the active layout rules.
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import numpy as np

from dalle_mtf_tpu.parallel.mesh import logical_to_pspec

logger = logging.getLogger(__name__)


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "name", k))))
    return "/".join(parts)


def describe_params(
    params: Any, logical_axes: Any, rules: dict[str, str] | None = None, mesh=None
) -> str:
    """Human-readable param table + totals. Logs and returns the text."""
    rules = rules or {}
    lines = []
    total = 0
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    axes_leaves = jax.tree_util.tree_leaves(
        logical_axes, is_leaf=lambda x: isinstance(x, tuple)
    )
    for (path, leaf), axes in zip(leaves, axes_leaves):
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        spec = logical_to_pspec(axes, rules, mesh) if axes else ()
        lines.append(
            f"  {_path_str(path):<40s} {str(leaf.shape):<24s} "
            f"{str(tuple(axes)):<60s} -> {spec}"
        )
    lines.append(f"N_PARAMS: {total:,} ({total / 1e6:.2f}M)")
    text = "\n".join(lines)
    logger.info("parameter layout:\n%s", text)
    return text


def count_params(params: Any) -> int:
    return sum(
        int(np.prod(x.shape)) if getattr(x, "shape", None) else 1
        for x in jax.tree_util.tree_leaves(params)
    )
