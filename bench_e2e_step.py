"""End-to-end train-step benchmark: the REAL Trainer.train_step at
dalle_coco scale, including on-device frozen-VAE tokenization of 256px
images (the path production training actually runs), on synthetic data.

bench.py's headline times a bare model-level step on pre-made tokens; this
harness corroborates it by construction — same Trainer, same task closure,
same config knobs as `python train_dalle.py --model dalle_coco`, minus the
input pipeline (synthetic device-resident batch) so it isolates device work.

Prints ONE JSON line (tokens/sec/chip over the combined 1280-token seq).
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import jax
import numpy as np

# BENCH_E2E_CONFIG selects any dalle config (default dalle_coco); e.g.
# dalle_4k runs the REAL trainer step at S=4352 through the hybrid/loop
# attention regime end-to-end. BENCH_E2E_BATCH overrides per-chip batch.
CONFIG = os.environ.get("BENCH_E2E_CONFIG", "dalle_coco")
PER_CHIP_BATCH = int(os.environ.get("BENCH_E2E_BATCH", 16))
# BENCH_E2E_ITERATIONS=K times Trainer.train_multi (the compiled K-step
# device loop production runs; Trainer caps chunks at 32) instead of
# per-step train_step dispatch. 0 = per-step (default).
ITERATIONS = int(os.environ.get("BENCH_E2E_ITERATIONS", "0"))
# BENCH_E2E_TOKENS=1: pre-tokenized dataset mode (dataset.tokens: true) —
# batches carry VAE token ids, no images, no per-step frozen-VAE forward.
TOKENS_MODE = bool(int(os.environ.get("BENCH_E2E_TOKENS", "0")))
# BENCH_E2E_U8=1: uint8 image transfer (dataset.uint8_images) — 4x smaller
# host->device batches, normalize on device (tasks._image).
U8_MODE = bool(int(os.environ.get("BENCH_E2E_U8", "0")))
WARMUP_STEPS = 3
BENCH_STEPS = 10


def main():
    from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig
    from dalle_mtf_tpu.parallel.mesh import build_mesh
    from dalle_mtf_tpu.train.tasks import make_dalle_task
    from dalle_mtf_tpu.train.trainer import Trainer
    from dalle_mtf_tpu.utils.config import fetch_model_params

    n_chips = jax.device_count()
    batch = PER_CHIP_BATCH * n_chips
    params = fetch_model_params(CONFIG)
    params["train_batch_size"] = batch
    params["mesh_shape"] = f"data:{n_chips}"
    params["layout"] = "batch_dim:data"

    mesh = build_mesh(params["mesh_shape"])
    if TOKENS_MODE:
        vae_params = None  # loss never touches the frozen VAE in tokens mode
    else:
        vae_cfg = VAEConfig.from_params(params["vae_params"])
        vae_params = jax.jit(DiscreteVAE(vae_cfg).init)(jax.random.PRNGKey(7))
    dalle, _vae, init_fn, loss_fn, _ev, axes = make_dalle_task(params)
    seq = dalle.cfg.total_seq_len

    rng = np.random.RandomState(0)
    size = params["dataset"]["image_size"]
    # HOST numpy batches, exactly what the production data pipeline yields —
    # the r4 version passed device-resident jnp arrays, which made the
    # ITERATIONS mode's stage_batches np.asarray() pull them BACK to host
    # (a D2H artifact production never pays) and understated train_multi
    caption = rng.randint(
        0, params["text_vocab_size"], (batch, dalle.cfg.text_seq_len)
    ).astype(np.int32)
    if TOKENS_MODE:
        batch_data = {
            "tokens": rng.randint(
                0, dalle.cfg.image_vocab_size,
                (batch, dalle.cfg.image_seq_len),
            ).astype(np.int32),
            "caption": caption,
        }
    elif U8_MODE:
        batch_data = {
            "image": rng.randint(0, 256, (batch, size, size, 3)).astype(
                np.uint8
            ),
            "caption": caption,
        }
    else:
        batch_data = {
            "image": rng.uniform(-1, 1, (batch, size, size, 3)).astype(
                np.float32
            ),
            "caption": caption,
        }

    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(
            params, init_fn, loss_fn, axes,
            model_dir=tmp, seq_len=seq, frozen_params=vae_params, mesh=mesh,
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        if ITERATIONS:
            # production form: compiled K-step device loops with one-chunk-
            # ahead staging, exactly the run() loop's double buffering —
            # chunk i+1's host stack + H2D transfer overlap chunk i's compute
            batches = [batch_data] * ITERATIONS
            state, metrics = trainer.train_multi(state, batches, key)
            float(jax.device_get(metrics["loss"]))
            calls = int(os.environ.get("BENCH_E2E_CALLS", "3"))
            staged = trainer.stage_batches(batches)
            t0 = time.perf_counter()
            for i in range(calls):
                state, metrics = trainer.train_multi(
                    state, rng_base=jax.random.fold_in(key, 100 + i),
                    staged=staged,
                )
                if i < calls - 1:
                    staged = trainer.stage_batches(batches)
            float(jax.device_get(metrics["loss"]))
            dt = time.perf_counter() - t0
            steps_timed = calls * ITERATIONS
        else:
            for i in range(WARMUP_STEPS):
                state, metrics = trainer.train_step(
                    state, batch_data, jax.random.fold_in(key, i)
                )
            float(jax.device_get(metrics["loss"]))  # force (block_until_ready
            # does not synchronize on tunneled runtimes)

            t0 = time.perf_counter()
            for i in range(BENCH_STEPS):
                state, metrics = trainer.train_step(
                    state, batch_data, jax.random.fold_in(key, 100 + i)
                )
            float(jax.device_get(metrics["loss"]))
            dt = time.perf_counter() - t0
            steps_timed = BENCH_STEPS

    tokens_per_sec_chip = batch * seq * steps_timed / dt / n_chips
    mode = "_tokens" if TOKENS_MODE else ("_u8" if U8_MODE else "")
    print(
        json.dumps(
            {
                "metric": f"{CONFIG}{mode}_e2e_trainer_step_tokens_per_sec_per_chip",
                "value": round(tokens_per_sec_chip, 1),
                "unit": "tokens/sec/chip",
                "vs_baseline": round(tokens_per_sec_chip / 24_500.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
