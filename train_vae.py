"""Train the discrete VAE (stage 1).

Same CLI surface as the reference (train_vae_tf.py:10-23 / train_vae.py:
11-24): --model names a configs/*.json file, --new wipes the model dir,
--tpu/--gpu_ids are accepted for compatibility (device selection is JAX's
job here — whatever backend `jax.devices()` reports is used).

Note the reference shipped *two* VAE drivers: train_vae_tf.py (working,
data-parallel only) and train_vae.py (mtf model-parallel path, broken at
import — it imports a vae_model_fn that doesn't exist, train_vae.py:8).
This single driver covers both capabilities: the mesh comes from the
config's mesh_shape/layout strings, so data-parallel and model-parallel
runs are the same code path.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from dalle_mtf_tpu.data.pipeline import vae_input_fn
from dalle_mtf_tpu.train.tasks import make_vae_task
from dalle_mtf_tpu.train.trainer import Trainer
from dalle_mtf_tpu.utils.config import fetch_model_params
from dalle_mtf_tpu.utils.logging_utils import remove_model_dir, setup_logging


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tpu", type=str, help="Name of TPU to train on (compat; unused under JAX)")
    parser.add_argument("--gpu_ids", nargs="+", type=str, help="(compat; unused under JAX)")
    parser.add_argument("--model", type=str, required=True, help="JSON model config name or path")
    parser.add_argument("--new", action="store_true", help="If set, deletes previous checkpoint, if it exists, and "
                                                           "starts a new training run")
    parser.add_argument("--yes", action="store_true", help="skip the --new confirmation prompt")
    return parser.parse_args()


def _normalize_summary_batch(batch: dict) -> dict:
    """uint8 transfer mode (dataset.uint8_images): the loader ships raw
    uint8 pixels and the TASK normalizes on device (tasks._image); the
    checkpoint image-summary path bypasses the task, so normalize here
    with the identical (x-127.5)/127.5 expression — otherwise recon_fn
    and denorm would see 0..255 values as if they were [-1, 1]."""
    if batch["image"].dtype == np.uint8:
        batch = dict(batch)
        batch["image"] = (batch["image"].astype(np.float32) - 127.5) / 127.5
    return batch


def main():
    args = parse_args()
    from dalle_mtf_tpu.utils.distributed import (
        maybe_enable_compilation_cache,
        maybe_initialize_distributed,
        maybe_start_profiler_server,
    )

    maybe_initialize_distributed()
    params = fetch_model_params(args.model)
    maybe_enable_compilation_cache(params)
    maybe_start_profiler_server(params)
    assert params["model_type"] in (None, "vae"), f"config {args.model} is not a vae config"
    logger = setup_logging(params["config_name"] or args.model)

    model_dir = params["model_path"]
    if args.new:
        remove_model_dir(model_dir, interactive=not args.yes)

    vae, init_fn, loss_fn, eval_loss_fn, axes = make_vae_task(params)
    trainer = Trainer(
        params, init_fn, loss_fn, axes,
        model_dir=model_dir,
        seq_len=vae.cfg.image_seq_len,
        eval_loss_fn=eval_loss_fn,
    )

    # deterministic data resume: skip the already-trained prefix of this
    # host's stream (I/O only, no decode) instead of re-feeding it
    start_step = trainer.latest_step()
    if start_step:
        logger.info("resume at step %d: data stream skips trained prefix", start_step)
    train_iter = iter(vae_input_fn(params, eval=False, skip_steps=start_step))
    eval_steps = params.get("eval_steps") or 0
    eval_iter = iter(vae_input_fn(params, eval=True)) if eval_steps else None

    # image summaries at every checkpoint — the reference's host_call wrote
    # input vs reconstruction images (model_fns_tf.py:68-78). A dedicated
    # pipeline, NOT next(train_iter): that batch would shift the resumable
    # train stream's sample accounting
    summary_batch = _normalize_summary_batch(
        next(iter(vae_input_fn(params, eval=False)))
    )
    # jit once; a fresh jax.jit per checkpoint would recompile every time
    recon_fn = jax.jit(
        vae.forward, static_argnames=("hard_gumbel", "train")
    )

    def summary_fn(tr: Trainer, state, step):
        import jax.numpy as jnp

        from dalle_mtf_tpu.models.vae import temperature_schedule

        temp = temperature_schedule(params, jnp.asarray(step))
        _loss, recon = recon_fn(
            state["params"], jnp.asarray(summary_batch["image"]),
            jax.random.PRNGKey(step), temperature=temp,
            hard_gumbel=True, train=False,
        )
        denorm = lambda x: (np.asarray(jax.device_get(x)) + 1.0) / 2.0  # noqa: E731
        tr.writer.images(
            step,
            {
                "input_image": denorm(summary_batch["image"]),
                "reconstruction_image": denorm(recon),
            },
        )

    logger.info("starting VAE training: %s", params["config_name"])
    trainer.run(
        train_iter, jax.random.PRNGKey(params.get("seed") or 0),
        eval_data_iter=eval_iter, summary_fn=summary_fn,
    )
    trainer.close()


if __name__ == "__main__":
    main()
