"""Elastic restarts: a checkpoint written on one mesh must restore onto a
DIFFERENT-sized mesh (pod resize after preemption) and continue training
with identical numerics — orbax reshards through the new state template's
shardings (trainer.py::restore). The reference had no recovery story at
all beyond TPUEstimator restarts on a fixed topology."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dalle_mtf_tpu.parallel.mesh import build_mesh
from dalle_mtf_tpu.train.tasks import make_vae_task
from dalle_mtf_tpu.train.trainer import Trainer
from dalle_mtf_tpu.utils.config import Config

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _fixed_mesh(n):
    """A mesh pinned to exactly n devices (no auto-resize — the point is
    restoring across genuinely different world sizes)."""
    return build_mesh(f"data:{n}", devices=jax.devices()[:n],
                      allow_resize=False)


def _params(mesh_shape, model_path):
    return Config.from_mapping(
        {
            "config_name": "elastic",
            "model_type": "vae",
            "dataset": {"image_size": 16},
            "num_tokens": 32,
            "convblocks": [[1, 8], [1, 16]],
            "n_channels": 3,
            "train_batch_size": 8,
            "train_steps": 4,
            "steps_per_checkpoint": 2,
            "lr": 1e-3,
            "warmup_steps": 0,
            "mesh_shape": mesh_shape,
            "layout": "batch_dim:data",
            "temp": 1.0,
            "model_path": model_path,
        }
    )


def _batch(i):
    rng = np.random.RandomState(100 + i)
    return {
        "image": jnp.asarray(
            rng.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)
        )
    }


def _steps(trainer, state, lo, hi):
    for i in range(lo, hi):
        state, m = trainer.train_step(state, _batch(i), jax.random.PRNGKey(i))
    return state


def test_restore_onto_resized_mesh(tmp_path):
    # uninterrupted run on 2 devices = the golden trajectory
    p_ref = _params("data:2", str(tmp_path / "ref"))
    _v, init_fn, loss_fn, _e, axes = make_vae_task(p_ref)
    t_ref = Trainer(p_ref, init_fn, loss_fn, axes,
                    model_dir=str(tmp_path / "ref"), seq_len=16,
                    mesh=_fixed_mesh(2))
    s_ref = _steps(t_ref, t_ref.init_state(jax.random.PRNGKey(0)), 0, 4)
    golden = jax.device_get(s_ref["params"])
    t_ref.close()

    # elastic run: 2 steps on a 2-device mesh, checkpoint, then the "pod"
    # resizes — restore the SAME model dir onto a 4-device mesh and finish
    shared_dir = str(tmp_path / "elastic")
    p_small = _params("data:2", shared_dir)
    t_small = Trainer(p_small, init_fn, loss_fn, axes,
                      model_dir=shared_dir, seq_len=16, mesh=_fixed_mesh(2))
    s = _steps(t_small, t_small.init_state(jax.random.PRNGKey(0)), 0, 2)
    t_small.save(s)
    t_small.wait_for_checkpoints()
    t_small.close()

    p_big = _params("data:4", shared_dir)
    t_big = Trainer(p_big, init_fn, loss_fn, axes,
                    model_dir=shared_dir, seq_len=16, mesh=_fixed_mesh(4))
    template = t_big.init_state(jax.random.PRNGKey(42))  # different seed:
    # the template's VALUES must not matter, only shapes/shardings
    s2 = t_big.restore(template)
    assert int(jax.device_get(s2["step"])) == 2
    # params took the big mesh's sharding (restore reshards via template)
    for leaf in jax.tree_util.tree_leaves(s2["params"]):
        assert len(leaf.sharding.device_set) == 4
        break
    s2 = _steps(t_big, s2, 2, 4)
    final = jax.device_get(s2["params"])
    t_big.close()

    for a, b in zip(
        jax.tree_util.tree_leaves(golden), jax.tree_util.tree_leaves(final)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_restore_onto_smaller_mesh(tmp_path):
    """Shrink direction (8 -> 2 devices) — the preemption-survival case."""
    shared_dir = str(tmp_path / "shrink")
    p8 = _params("data:8", shared_dir)
    _v, init_fn, loss_fn, _e, axes = make_vae_task(p8)
    t8 = Trainer(p8, init_fn, loss_fn, axes, model_dir=shared_dir,
                 seq_len=16, mesh=_fixed_mesh(8))
    s = _steps(t8, t8.init_state(jax.random.PRNGKey(0)), 0, 2)
    t8.save(s)
    t8.wait_for_checkpoints()
    t8.close()

    p2 = _params("data:2", shared_dir)
    t2 = Trainer(p2, init_fn, loss_fn, axes, model_dir=shared_dir,
                 seq_len=16, mesh=_fixed_mesh(2))
    s2 = t2.restore(t2.init_state(jax.random.PRNGKey(9)))
    assert int(jax.device_get(s2["step"])) == 2
    s2, m = t2.train_step(s2, _batch(2), jax.random.PRNGKey(2))
    assert np.isfinite(float(jax.device_get(m["loss"])))
    assert int(jax.device_get(s2["step"])) == 3
    t2.close()
