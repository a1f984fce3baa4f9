"""Train DALLE (stage 2) on [text ; image-token] sequences.

Same CLI and config surface as the reference train_dalle.py:12-31: --model
names a DALLE config whose "vae_model" key points at the stage-1 VAE config;
the frozen VAE weights are restored from the VAE's checkpoint directory (or
"vae_checkpoint_path" override, reference model_fns.py:36-41) and used
on-device to tokenize images every step (model_fns.py:72-77).
"""

from __future__ import annotations

import argparse
import logging

import jax

from dalle_mtf_tpu.data.pipeline import dalle_input_fn
from dalle_mtf_tpu.data.tokenizer import get_tokenizer
from dalle_mtf_tpu.train.tasks import make_dalle_task
from dalle_mtf_tpu.train.trainer import Trainer
from dalle_mtf_tpu.utils.config import fetch_model_params
from dalle_mtf_tpu.utils.logging_utils import remove_model_dir, setup_logging

logger = logging.getLogger(__name__)


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tpu", type=str, help="Name of TPU to train on (compat; unused under JAX)")
    parser.add_argument("--gpu_ids", nargs="+", type=str, help="(compat; unused under JAX)")
    parser.add_argument("--model", type=str, required=True, help="JSON model config name or path")
    parser.add_argument("--new", action="store_true", help="If set, deletes previous checkpoint, if it exists, and "
                                                           "starts a new training run")
    parser.add_argument("--yes", action="store_true", help="skip the --new confirmation prompt")
    return parser.parse_args()


def load_vae_params(params, vae):
    """Restore the frozen stage-1 VAE weights (reference load_vae_model +
    initialize_vae_weights, model_fns.py:11-52; cross-model restore lives
    in utils/restore.py)."""
    from dalle_mtf_tpu.utils.restore import restore_vae_params

    vae_dir = params.get("vae_checkpoint_path") or params["vae_params"]["model_path"]
    return restore_vae_params(vae, vae_dir)


def _ckpt_dir(model_dir: str) -> str:
    from dalle_mtf_tpu.utils.restore import _ckpt_dir as _impl

    return _impl(model_dir)


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
    assert params["model_type"] == "dalle", f"config {args.model} is not a dalle config"
    assert params["vae_params"] is not None, "vae model config must be supplied (vae_model key)"
    setup_logging(params["config_name"] or args.model)

    if args.new:
        remove_model_dir(params["model_path"], interactive=not args.yes)

    # tokenizer vocab check + padding id (reference train_dalle.py:47-49)
    tokenizer = get_tokenizer()
    assert params["text_vocab_size"] == len(tokenizer), (
        f"config text_vocab_size {params['text_vocab_size']} != tokenizer vocab {len(tokenizer)}"
    )
    params["padding_id"] = tokenizer.pad_token_id

    # Activation sharding constraints: the mesh + layout rules bind the
    # model's logical-axis constrain() calls (qkv, attention out, residual
    # stream) so large activations can't drift into GSPMD-chosen layouts at
    # scale — the reference applied its layout rules to every tensor via
    # mtf's solver (model_fns.py:81-94).
    from dalle_mtf_tpu.parallel.mesh import make_constrain

    mesh, constrain = make_constrain(params)
    dalle, vae, init_fn, loss_fn, eval_loss_fn, axes = make_dalle_task(
        params, constrain=constrain
    )
    # pre-tokenized mode (dataset.tokens: true): records already carry VAE
    # token ids (data/encode_dataset.py) so the training step never runs
    # the frozen VAE — its weights are only needed when predict-every-
    # checkpoint must decode sampled tokens back to pixels
    tokens_mode = bool(params["dataset"].get("tokens"))
    if tokens_mode and not params.get("predict_steps"):
        vae_params = None
    else:
        vae_params = load_vae_params(params, vae)

    trainer = Trainer(
        params, init_fn, loss_fn, axes,
        model_dir=params["model_path"],
        seq_len=dalle.cfg.total_seq_len,
        frozen_params=vae_params,
        mesh=mesh,
        eval_loss_fn=eval_loss_fn,
    )
    # deterministic data resume: skip the already-trained prefix of this
    # host's stream (I/O only, no decode) instead of re-feeding it — the
    # reference restarted its tf.data pipeline from the top on every
    # crash-resume (train_dalle.py:80-98 + input_fns.py, no iterator state)
    start_step = trainer.latest_step()
    if start_step:
        logger.info("resume at step %d: data stream skips trained prefix", start_step)
    train_iter = iter(dalle_input_fn(params, eval=False, skip_steps=start_step))
    eval_steps = params.get("eval_steps") or 0
    eval_iter = iter(dalle_input_fn(params, eval=True)) if eval_steps else None

    # predict_steps > 0: sample golden-caption images at every checkpoint
    # (the reference stopped training for this and then raised
    # NotImplementedError, train_dalle.py:80-89)
    from dalle_mtf_tpu.train.predict import make_predict_summary_fn

    predict_fn = None
    if params.get("predict_steps"):
        # a dedicated pipeline (never train_iter): predict consumes one
        # batch for its golden captions, which would silently shift the
        # resumable train stream's sample accounting
        predict_fn = make_predict_summary_fn(
            params, dalle, vae, vae_params,
            data_iter=iter(
                dalle_input_fn(
                    params, eval=bool(params["dataset"].get("eval_path"))
                )
            ),
            tokenizer=tokenizer,
        )

    logger.info(
        "starting DALLE training: %s (total_seq_len=%d, image_seq_len=%d)",
        params["config_name"], dalle.cfg.total_seq_len, dalle.cfg.image_seq_len,
    )
    trainer.run(
        train_iter, jax.random.PRNGKey(params.get("seed") or 0),
        eval_data_iter=eval_iter, summary_fn=predict_fn,
    )
    trainer.close()


if __name__ == "__main__":
    main()
