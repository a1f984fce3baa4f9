import os

import jax
import numpy as np

from dalle_mtf_tpu.utils.distributed import (
    maybe_initialize_distributed,
    maybe_start_profiler_server,
)
from dalle_mtf_tpu.utils.logging_utils import remove_model_dir, setup_logging
from dalle_mtf_tpu.utils.summaries import MetricsWriter
from dalle_mtf_tpu.utils.config import Config


def test_metrics_writer_writes_event_files(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.scalars(1, {"loss": 1.5, "lr": 1e-4})
    w.images(1, {"recon": np.random.rand(2, 8, 8, 3).astype(np.float32)})
    w.flush()
    files = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert files, "no TensorBoard event file written"


def test_remove_model_dir_noninteractive(tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    (d / "x.txt").write_text("y")
    remove_model_dir(str(d), interactive=False)
    assert not d.exists()
    # removing a nonexistent dir is a no-op
    remove_model_dir(str(d), interactive=False)


def test_setup_logging_creates_log_file(tmp_path):
    logger = setup_logging("unittest_cfg", log_dir=str(tmp_path))
    logger.info("hello")
    assert (tmp_path / "unittest_cfg.log").exists()


def test_distributed_noops_on_single_host(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert maybe_initialize_distributed() is False
    assert maybe_start_profiler_server(Config()) is False


def test_checkpoint_manager_retains_max_to_keep(tmp_path):
    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(
        str(tmp_path / "ck"),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )
    state = {"step": np.int32(0), "w": np.zeros((4,), np.float32)}
    for step in range(1, 7):
        state["step"] = np.int32(step)
        mngr.save(step, args=ocp.args.StandardSave(state))
    mngr.wait_until_finished()
    assert mngr.all_steps() == [4, 5, 6]
    mngr.close()


def test_compilation_cache_writes_and_disables(tmp_path):
    """maybe_enable_compilation_cache points XLA's persistent cache at the
    configured dir (a compile then materializes a cache entry on disk) and
    honors compilation_cache=false. Why it exists: crash-resume and elastic
    relaunches re-execute byte-identical compiles (minutes at 12B scale)."""
    import jax
    import jax.numpy as jnp

    from dalle_mtf_tpu.utils.distributed import maybe_enable_compilation_cache

    assert maybe_enable_compilation_cache({"compilation_cache": False}) is None

    cache_dir = tmp_path / "xla_cache"
    prev = {
        name: getattr(jax.config, name)
        for name in (
            "jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes",
        )
    }
    try:
        got = maybe_enable_compilation_cache(
            {"compilation_cache_dir": str(cache_dir)}
        )
        assert got == str(cache_dir)

        @jax.jit
        def f(x):
            return jnp.sin(x) * 41.173  # unique constant -> unique cache key

        f(jnp.arange(8.0)).block_until_ready()
        entries = list(cache_dir.iterdir())
        assert entries, "compile produced no persistent cache entry"
    finally:
        for name, val in prev.items():
            jax.config.update(name, val)
