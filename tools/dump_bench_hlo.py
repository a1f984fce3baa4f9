"""Dump the optimized HLO of the bench.py train step (for profile-name
mapping). Writes /tmp/bench_step_hlo.txt."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
from dalle_mtf_tpu.parallel.mesh import build_mesh
from dalle_mtf_tpu.train.optim import get_optimizer
from dalle_mtf_tpu.utils.config import Config

# mirror bench.py's env-driven knobs so the HLO joins the trace 1:1
PER_CHIP_BATCH = int(os.environ.get("BENCH_BATCH", 22))

cfg = DalleConfig(
    n_embd=1024, text_vocab_size=50258, image_vocab_size=512,
    text_seq_len=256, image_seq_len=1024, n_layers=12, n_heads=8,
    bf_16=True, recompute_grad=True,
    remat_policy=os.environ.get("BENCH_REMAT_POLICY", "dots_and_attn"),
    ln_dtype=os.environ.get("BENCH_LN_DTYPE", "float32"),
    ln_impl=os.environ.get("BENCH_LN_IMPL", "xla"),
    attn_packed=bool(int(os.environ.get("BENCH_ATTN_PACKED", "1"))),
    scan_unroll=int(os.environ.get("BENCH_SCAN_UNROLL", "12")),
)
model = DALLE(cfg)
n_chips = jax.device_count()
batch = PER_CHIP_BATCH * n_chips
seq = cfg.total_seq_len
opt, _ = get_optimizer(Config.from_mapping(
    {"lr": 1e-4, "train_steps": 100_000, "warmup_steps": 3000}))
mesh = build_mesh(f"data:{n_chips}")
from jax.sharding import NamedSharding, PartitionSpec

repl = NamedSharding(mesh, PartitionSpec())
params = jax.jit(model.init, out_shardings=repl)(jax.random.PRNGKey(0))
opt_state = jax.jit(opt.init, out_shardings=repl)(params)
tokens = jax.device_put(
    jax.random.randint(jax.random.PRNGKey(1), (batch, seq), 0,
                       cfg.total_tokens, jnp.int32),
    NamedSharding(mesh, PartitionSpec("data")),
)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def train_step(params, opt_state, tokens, rng):
    def loss_fn(p):
        loss, _ = model.loss(p, tokens, rng, train=True)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


txt = train_step.lower(
    params, opt_state, tokens, jax.random.PRNGKey(2)
).compile().as_text()
with open("/tmp/bench_step_hlo.txt", "w") as f:
    f.write(txt)
print("wrote", len(txt), "bytes")
