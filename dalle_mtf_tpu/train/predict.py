"""Predict-every-checkpoint for DALLE training.

The reference's train loop stopped at every checkpoint to run
``predict_steps`` prediction batches — and then raised
``NotImplementedError`` (reference train_dalle.py:80-89,
model_fns.py:135-136). This module completes that surface: when
``predict_steps > 0``, a fixed set of golden captions (taken from the
first ``predict_steps`` data batches at startup, so the TensorBoard
timeline shows the SAME prompts converging) is sampled into images at
every checkpoint. Image grids go to TensorBoard and PNGs to
``<model_path>/predict/step_<N>/``.

Optional config keys: ``predict_batch_size`` (rows per predict batch,
reference key), ``predict_temperature`` (default 1.0) and
``predict_top_k`` (default 64) for the sampler.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from dalle_mtf_tpu.sample import generate_images

logger = logging.getLogger(__name__)


def make_predict_summary_fn(
    params, dalle, vae, vae_params, data_iter, tokenizer=None
):
    """Build a ``summary_fn(trainer, state, step)`` for ``Trainer.run``,
    or return None when ``predict_steps`` is unset/0.

    ``data_iter`` supplies the golden captions (its first
    ``predict_steps`` batches are consumed once, here); pass the eval
    iterator when there is one, else the train iterator.
    """
    predict_steps = int(params.get("predict_steps") or 0)
    if predict_steps <= 0:
        return None
    rows = int(
        params.get("predict_batch_size")
        or params.get("eval_batch_size")
        or 4
    )
    temperature = float(
        params["predict_temperature"]
        if params.get("predict_temperature") is not None
        else 1.0
    )
    top_k = int(
        params["predict_top_k"]
        if params.get("predict_top_k") is not None
        else 64
    )
    captions = []
    for _ in range(predict_steps):
        batch = next(data_iter)
        captions.append(np.asarray(batch["caption"])[:rows].astype(np.int32))

    # decode prompts once for the sidecar text file (offline tokenizer
    # fallbacks can decode whatever they encoded)
    prompt_lines: list[str] = []
    for i, cap in enumerate(captions):
        for j, row in enumerate(cap):
            text = ""
            if tokenizer is not None:
                ids = [t for t in row.tolist() if t != tokenizer.pad_token_id]
                try:
                    text = tokenizer.decode(ids)
                except Exception:  # noqa: BLE001 — prompts are cosmetic
                    text = ""
            prompt_lines.append(f"batch{i}_row{j}: {text}")

    # one executable for the whole run: params/vae_params are traced
    # arguments (NOT closed-over constants — closing over the frozen VAE
    # tree would bake ~100 MB of weights into the jaxpr), so every
    # checkpoint reuses the compile.
    @jax.jit
    def _gen(dalle_params, frozen_vae, text, rng):
        return generate_images(
            dalle, dalle_params, vae, frozen_vae, text, rng,
            temperature=temperature, top_k=top_k,
        )

    model_path = params.get("model_path") or "."

    def summary_fn(trainer, state, step):
        out_dir = os.path.join(model_path, "predict", f"step_{step:07d}")
        if "://" not in out_dir:
            os.makedirs(out_dir, exist_ok=True)  # prompts.txt needs it even
            # when PIL is unavailable and _save_pngs writes nothing
        for i, text in enumerate(captions):
            imgs = _gen(
                state["params"], vae_params, jnp.asarray(text),
                jax.random.fold_in(jax.random.PRNGKey(step), i),
            )
            imgs = np.asarray(jax.device_get(imgs))
            trainer.writer.images(
                step, {f"predict/batch_{i}": imgs}, max_outputs=rows
            )
            _save_pngs(out_dir, i, imgs)
        if "://" not in model_path:
            with open(os.path.join(out_dir, "prompts.txt"), "w") as f:
                f.write("\n".join(prompt_lines) + "\n")
        logger.info(
            "predict: %d batch(es) of %d image(s) at step %d -> %s",
            len(captions), rows, step, out_dir,
        )

    return summary_fn


def _save_pngs(out_dir: str, batch_idx: int, imgs: np.ndarray):
    """imgs f32[B, H, W, C] in [0, 1] -> PNGs. Remote model_path (gs://)
    skips the PNG sidecars — TensorBoard carries the images there."""
    if "://" in out_dir:
        return
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError:
        logger.warning("PIL unavailable; predict PNGs skipped")
        return
    os.makedirs(out_dir, exist_ok=True)
    arr = np.clip(imgs * 255.0, 0, 255).astype(np.uint8)
    for j in range(arr.shape[0]):
        Image.fromarray(arr[j]).save(
            os.path.join(out_dir, f"batch{batch_idx}_row{j}.png")
        )
