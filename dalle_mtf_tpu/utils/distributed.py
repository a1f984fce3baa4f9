"""Multi-host runtime setup.

The reference reached pods through TPUEstimator's cluster resolver + gRPC
control plane (train_dalle.py:51-55) and BROADCAST infeed. The JAX
equivalent is ``jax.distributed.initialize`` — one process per host, DCN for
the control plane, ICI for collectives — plus per-host data sharding
(data/pipeline.py handles that via jax.process_index()).

Also hosts the profiler endpoint (SURVEY §5: the reference had no tracing;
here ``jax.profiler`` is one flag away).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def maybe_initialize_distributed():
    """Initialize jax.distributed when running under a multi-host launcher.

    No-op on a single host. Honors the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or TPU
    pod metadata autodetection.
    """
    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        # explicit world spec (the elastic supervisor sets these per
        # attempt, utils/elastic.py) beats autodetection
        kwargs = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kwargs = dict(
                coordinator_address=os.environ.get("JAX_COORDINATOR_ADDRESS")
                or os.environ.get("COORDINATOR_ADDRESS"),
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ.get("JAX_PROCESS_ID") or 0),
            )
        jax.distributed.initialize(**kwargs)
        logger.info(
            "jax.distributed initialized: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
        return True
    return False


def maybe_enable_compilation_cache(params) -> str | None:
    """Point XLA's persistent compilation cache at a durable directory.

    On by default (set ``"compilation_cache": false`` to disable;
    ``"compilation_cache_dir"`` overrides the location). The reference's
    TPUEstimator recompiled the full program on every process start — at
    12B scale that is minutes of XLA work repeated on every crash-resume
    and every elastic-supervisor relaunch (utils/elastic.py), where the
    program being compiled is byte-identical. The cache is keyed on the
    serialized HLO + compile options + backend version, so config or
    topology changes miss safely and recompile.

    Returns the cache dir when enabled, else None.
    """
    import jax

    if params.get("compilation_cache") is False:
        return None
    cache_dir = params.get("compilation_cache_dir") or os.path.join(
        os.path.expanduser("~"), ".cache", "dalle_mtf_tpu", "xla_cache"
    )
    if "://" not in cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default min-compile-time gate (1s) would skip exactly the smoke
        # and unit-test compiles that prove the cache works; the big train
        # step programs clear any threshold, so cache everything
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - older jax without the flags
        logger.warning("compilation cache unavailable: %s", e)
        return None
    logger.info("persistent XLA compilation cache at %s", cache_dir)
    return cache_dir


def maybe_start_profiler_server(params) -> bool:
    """Start the jax profiler server when ``profiler_port`` is configured.

    Connect with TensorBoard's profile plugin or
    ``jax.profiler.trace`` pointing at the port for on-demand traces of a
    live training job.
    """
    import jax

    port = params.get("profiler_port")
    if not port:
        return False
    jax.profiler.start_server(int(port))
    logger.info("jax profiler server listening on :%d", port)
    return True
