"""Task definitions binding models to the generic Trainer.

The reference's model_fns (src/model_fns_tf.py for the VAE,
src/model_fns.py for DALLE) collapse to these small closures: a loss
function over (params, frozen_params, batch, rng, step).

Batch format (produced by dalle_mtf_tpu.data.pipeline):
  {"image": f32[B, H, W, C] in [-1, 1], "caption": i32[B, text_seq_len]}
(the VAE ignores "caption"; for VAE runs label==input, input_fns.py:64,100).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig, temperature_schedule


def _image(batch):
    """Batch images in compute range [-1, 1].

    f32 batches pass through (host-normalized, the reference's semantics).
    uint8 batches (``dataset.uint8_images`` — a 4x smaller host->device
    transfer, the H2D win for image-mode training on thin links) are
    normalized ON DEVICE with the identical (x - 127.5) / 127.5 f32
    expression the host path uses, so values are bit-equal for
    PIL-decoded data (tests/test_data.py pins the loss equality)."""
    x = batch["image"]
    if x.dtype == jnp.uint8:
        return (x.astype(jnp.float32) - 127.5) / 127.5
    return x


def make_vae_task(params: Mapping[str, Any]):
    """Returns (vae, init_fn, train_loss_fn, eval_loss_fn, logical_axes).

    Training semantics follow model_fns_tf.py:9-66: Gumbel temperature
    annealed by global step, train/eval gumbel hardness from config.
    """
    cfg = VAEConfig.from_params(params)
    vae = DiscreteVAE(cfg)
    train_hard = params.get("train_gumbel_hard")
    train_hard = True if train_hard is None else bool(train_hard)
    eval_hard = params.get("eval_gumbel_hard")
    eval_hard = True if eval_hard is None else bool(eval_hard)

    def train_loss(p, _frozen, batch, rng, step):
        temp = temperature_schedule(params, step)
        loss, _recon = vae.forward(
            p, _image(batch), rng, temperature=temp,
            hard_gumbel=train_hard, train=True,
        )
        return loss, {}

    def eval_loss(p, _frozen, batch, rng, step):
        """Eval with quality metrics beyond MSE (the reference only had a
        loss metric_fn, model_fns_tf.py:80-96): PSNR of the reconstruction
        (on the [-1, 1] scale, peak = 2), codebook perplexity —
        exp(entropy) of the hard-token usage distribution, the standard
        VQ-health signal (collapse shows up as perplexity << num_tokens) —
        and an FID-style Fréchet feature distance between real and
        reconstructed images in the encoder's own pooled feature space
        (diagonal covariance; losses.py::frechet_feature_distance)."""
        temp = temperature_schedule(params, step)
        img = _image(batch)
        loss, recon = vae.forward(
            p, img, rng, temperature=temp,
            hard_gumbel=eval_hard, train=False,
        )
        mse = jnp.mean(
            jnp.square(img.astype(jnp.float32) - recon)
        )
        psnr = 10.0 * jnp.log10(4.0 / jnp.maximum(mse, 1e-10))
        tokens = vae.encode_tokens(p, img)
        counts = jnp.bincount(
            tokens.reshape(-1), length=cfg.num_tokens
        ).astype(jnp.float32)
        probs = counts / jnp.maximum(counts.sum(), 1.0)
        entropy = -jnp.sum(jnp.where(probs > 0, probs * jnp.log(probs), 0.0))
        from dalle_mtf_tpu.ops.losses import (  # noqa: PLC0415
            frechet_feature_distance,
        )

        ffd = frechet_feature_distance(
            vae.encoder_features(p, img),
            vae.encoder_features(p, recon),
        )
        return loss, {
            "psnr": psnr,
            "codebook_perplexity": jnp.exp(entropy),
            "frechet_feature_distance": ffd,
        }

    return vae, vae.init, train_loss, eval_loss, vae.logical_axes()


def make_dalle_task(params: Mapping[str, Any], constrain=None):
    """Returns (dalle, vae, init_fn, train_loss_fn, eval_loss_fn, logical_axes).

    The frozen stage-1 VAE tokenizes images on-device inside the loss
    (reference runs the VAE encoder + argmax in the same graph,
    model_fns.py:72-77); image tokens are offset by text_vocab_size before
    concatenation with the caption tokens (model_fns.py:119).
    ``frozen_params`` passed to the Trainer must be the VAE param tree.
    """
    # per-chip attention block-size table (autotune_attention.py): the
    # `attn_tune` config key installs it for every driver that builds a
    # DALLE task (train/sample/serve) — no env plumbing needed
    if params.get("attn_tune"):
        from dalle_mtf_tpu.ops.attention import load_tune_table  # noqa: PLC0415

        load_tune_table(params["attn_tune"])
    vae_cfg = VAEConfig.from_params(params["vae_params"])
    cfg = DalleConfig.from_params(params, vae_cfg.image_seq_len)
    # Hard guard: VAE token ids are offset into [text_vocab, text_vocab +
    # image_vocab); a mismatch silently clamps 3/4 of image tokens onto the
    # EOS embedding row. (The reference ships exactly this latent bug:
    # its dalle_coco.json says image_vocab_size 512 against vae_coco's
    # num_tokens 2048.)
    assert cfg.image_vocab_size == vae_cfg.num_tokens, (
        f"image_vocab_size ({cfg.image_vocab_size}) must equal the VAE's "
        f"num_tokens ({vae_cfg.num_tokens}) — fix the dalle config"
    )
    dalle = DALLE(cfg)
    vae = DiscreteVAE(vae_cfg)
    z_loss = params.get("z_loss") or 0.0
    fused_xent = bool(params.get("fused_xent"))

    def tokens_of(frozen_vae, batch):
        if "tokens" in batch:
            # pre-tokenized dataset (data/encode_dataset.py: images were
            # encoded through the frozen VAE ONCE, offline) — the per-step
            # VAE forward the reference pays forever (model_fns.py:72-77)
            # is skipped entirely. Token ids in records are raw codebook
            # ids; the text-vocab offset applies here exactly as in the
            # in-graph path, so both modes produce identical sequences.
            img_tokens = batch["tokens"].astype(jnp.int32) + cfg.text_vocab_size
        else:
            img_tokens = vae.encode_tokens(frozen_vae, _image(batch))
            img_tokens = (
                jax.lax.stop_gradient(img_tokens) + cfg.text_vocab_size
            )
        return jnp.concatenate(
            [batch["caption"].astype(jnp.int32), img_tokens], axis=1
        )

    text_len = cfg.text_seq_len

    def _split_losses(loss_batch):
        # loss_batch[:, i] scores the prediction of token i+1, so image
        # modeling starts at position text_seq_len - 1 (the first image
        # token's prediction).
        return {
            "loss_text": loss_batch[:, : text_len - 1].mean(),
            "loss_image": loss_batch[:, text_len - 1 :].mean(),
        }

    def train_loss(p, frozen_vae, batch, rng, step):
        tokens = tokens_of(frozen_vae, batch)
        loss, loss_batch = dalle.loss(
            p, tokens, rng, train=True, constrain=constrain,
            z_loss=z_loss, fused_xent=fused_xent,
        )
        return loss, _split_losses(loss_batch)

    def eval_loss(p, frozen_vae, batch, rng, step):
        """Eval with metrics beyond mean loss (the reference exposed an eval
        metric_fn, model_fns_tf.py:80-96): text/image loss split and
        next-token accuracy (overall + image positions)."""
        tokens = tokens_of(frozen_vae, batch)
        if fused_xent:
            # streamed eval (loss + argmax correctness per chunk) — same
            # metric schema as the dense path below, still no [B, S, vocab]
            # logits tensor (ops/xent_fused.py::chunked_xent_eval_auto)
            loss_batch, correct = dalle.fused_eval(
                p, tokens, rng, constrain=constrain, z_loss=z_loss,
            )
            return loss_batch.mean(), {
                **_split_losses(loss_batch),
                "acc": correct.mean(),
                "acc_image": correct[:, text_len - 1 :].mean(),
            }
        from dalle_mtf_tpu.ops.losses import (  # noqa: PLC0415
            softmax_cross_entropy_with_logits,
        )

        logits = dalle.forward(p, tokens, rng, train=False, constrain=constrain)
        labels = dalle.shifted_labels(tokens)
        loss_batch = softmax_cross_entropy_with_logits(logits, labels, z_loss)
        correct = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
        aux = {
            **_split_losses(loss_batch),
            "acc": correct.mean(),
            "acc_image": correct[:, text_len - 1 :].mean(),
        }
        return loss_batch.mean(), aux

    return dalle, vae, dalle.init, train_loss, eval_loss, dalle.logical_axes()
