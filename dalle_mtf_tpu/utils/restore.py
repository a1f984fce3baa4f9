"""Cross-model checkpoint restore: pull the frozen stage-1 VAE's params out
of its training checkpoint for use inside another program (DALLE training,
sampling, serving, the offline dataset encoder).

The reference did this with ``tf.train.init_from_checkpoint`` over the
"vae" variable scope (model_fns.py:11-52); here the VAE's TrainState
checkpoint is an orbax tree and we restore only its ``params`` subtree
against the model's own template.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger(__name__)


def _ckpt_dir(model_dir: str) -> str:
    d = (
        model_dir
        if "://" in model_dir
        else os.path.abspath(os.path.expanduser(model_dir))
    )
    return os.path.join(d, "checkpoints")


def restore_vae_params(vae, vae_dir: str):
    """Latest-checkpoint VAE params from ``vae_dir`` (a model_path whose
    ``checkpoints/`` subdir holds the orbax tree), validated against the
    model's param-tree structure."""
    import orbax.checkpoint as ocp

    template = jax.eval_shape(vae.init, jax.random.PRNGKey(0))
    mngr = ocp.CheckpointManager(
        _ckpt_dir(vae_dir), options=ocp.CheckpointManagerOptions(create=False)
    )
    latest = mngr.latest_step()
    if latest is None:
        raise FileNotFoundError(
            f"no VAE checkpoint found under {vae_dir} — train the VAE first"
        )
    restored = mngr.restore(latest)
    vae_params = restored["params"]
    got = jax.tree_util.tree_structure(vae_params)
    want = jax.tree_util.tree_structure(template)
    if got != want:
        raise ValueError(
            f"VAE checkpoint at {vae_dir} doesn't match the vae config "
            f"(param tree mismatch)"
        )
    logger.info("restored frozen VAE from %s @ step %d", vae_dir, latest)
    return vae_params
