"""Secondary benchmark: VAE training throughput (images/sec/chip) at
vae_coco scale (256px, convblocks [[2,128],[3,256],[5,512]], 2048-token
codebook, bf16 + recompute — configs/vae_coco.json).

The reference publishes no VAE numbers either; BASELINE.md requires the
harness to exist. Prints one JSON line like bench.py (the driver's headline
metric stays bench.py's tokens/sec/chip).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import optax

from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig
from dalle_mtf_tpu.train.optim import get_optimizer
from dalle_mtf_tpu.utils.config import Config

import os  # noqa: E402

PER_CHIP_BATCH = int(os.environ.get("BENCH_VAE_BATCH", 32))
RECOMPUTE = bool(int(os.environ.get("BENCH_VAE_RECOMPUTE", "1")))
# 384 benches the dalle_12B stage-1 (configs/vae_coco384.json — same
# convblocks/codebook, 48x48 = 2304-token grid)
IMAGE_SIZE = int(os.environ.get("BENCH_VAE_IMAGE_SIZE", 256))
WARMUP = 2
STEPS = 10


def main():
    n_chips = jax.device_count()
    cfg = VAEConfig(
        num_tokens=2048,
        image_size=IMAGE_SIZE,
        convblocks=((2, 128), (3, 256), (5, 512)),
        use_bf16=True,
        recompute_grad=RECOMPUTE,
    )
    vae = DiscreteVAE(cfg)
    batch = PER_CHIP_BATCH * n_chips

    opt, _ = get_optimizer(
        Config.from_mapping({"lr": 1e-4, "train_steps": 100_000, "warmup_steps": 0})
    )
    params = jax.jit(vae.init)(jax.random.PRNGKey(0))
    opt_state = jax.jit(opt.init)(params)
    img = jax.random.uniform(
        jax.random.PRNGKey(1), (batch, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32, -1.0, 1.0
    )

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            loss, _ = vae.forward(
                p, img, rng, temperature=0.5, hard_gumbel=False, train=True
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(2)
    for i in range(WARMUP):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(rng, i))
    float(loss)  # host fetch = real sync (see bench.py)

    t0 = time.perf_counter()
    for i in range(STEPS):
        params, opt_state, loss = step(
            params, opt_state, jax.random.fold_in(rng, 100 + i)
        )
    float(loss)
    dt = time.perf_counter() - t0

    imgs_per_sec_chip = batch * STEPS / dt / n_chips
    print(
        json.dumps(
            {
                "metric": f"vae_coco{IMAGE_SIZE if IMAGE_SIZE != 256 else ''}_train_images_per_sec_per_chip",
                "value": round(imgs_per_sec_chip, 2),
                "unit": "images/sec/chip",
                "vs_baseline": None,  # no reference number exists (BASELINE.md)
            }
        )
    )


if __name__ == "__main__":
    main()
