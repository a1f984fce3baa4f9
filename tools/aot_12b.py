"""dalle_12B evidence: AOT-compile the FULL train step against a real TPU
pod topology and report the compiler's per-device HBM analysis.

The CPU dryrun (__graft_entry__._dryrun_12b_compile_impl) proves the 12B
layouts compile, but its memory numbers are meaningless (dense-attention
fallback, fp32 buffers). This probe uses jax.experimental.topologies to
target `v5e:8x16` (128 chips, the dalle_12B mesh `data:16,model:8`) from
the single-chip dev box: the TPU compiler lowers the REAL program — Pallas
wedge kernels, bf16, vocab-sharded fused xent, grad-accum scan, AdamW
update — and `compiled.memory_analysis()` is the authoritative per-device
HBM footprint. No 128-chip hardware is ever touched.

Usage:
  python tools/aot_12b.py            # full step (frozen-VAE tokenize)
  TOKENS=1 python tools/aot_12b.py   # pre-tokenized dataset mode

Prints one JSON line; exits nonzero if the topology client cannot compile
(recorded as environment-blocked, per VERDICT r4 #5b).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec  # noqa: E402

TOKENS = bool(int(os.environ.get("TOKENS", "0")))
TOPOLOGY = os.environ.get("TOPOLOGY", "v5e:8x16")


def main():
    from jax.experimental import topologies

    from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig
    from dalle_mtf_tpu.parallel.mesh import make_constrain, parse_layout
    from dalle_mtf_tpu.train.optim import get_optimizer
    from dalle_mtf_tpu.train.tasks import make_dalle_task
    from dalle_mtf_tpu.utils.config import fetch_model_params

    topo = topologies.get_topology_desc(platform="tpu", topology_name=TOPOLOGY)
    params = fetch_model_params("dalle_12B")
    params["fused_xent"] = True
    if TOKENS:
        params["dataset"]["tokens"] = True
    if not bool(int(os.environ.get("ATTN_PACKED", "1"))):
        # the packed kernel's one-program unrolled wedge exceeds the AOT
        # compiler's scoped-vmem accounting at S=2560 (16.32M vs 16.00M on
        # v5p) — the per-call wedge family compiles; see BENCH.md r5 12B
        params["attn_packed"] = False

    from dalle_mtf_tpu.parallel.mesh import parse_mesh_shape

    shape = parse_mesh_shape(params["mesh_shape"])  # [("data",16),("model",8)]
    dims = tuple(n for _, n in shape)
    names = tuple(n for n, _ in shape)
    assert int(np.prod(dims)) == len(topo.devices), (dims, len(topo.devices))
    mesh = Mesh(np.asarray(topo.devices).reshape(dims), names)
    rules = parse_layout(params["layout"])
    _, constrain = make_constrain(params, mesh=mesh)
    dalle, vae, init_fn, loss_fn, _ev, axes = make_dalle_task(
        params, constrain=constrain
    )
    opt, _sched = get_optimizer(params)

    p_shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    flat_p, treedef = jax.tree_util.tree_flatten(p_shapes)
    flat_a = jax.tree_util.tree_leaves(
        axes, is_leaf=lambda x: isinstance(x, tuple)
    )
    p_shard_flat = []
    for leaf, la in zip(flat_p, flat_a):
        spec = []
        for dim, name in zip(leaf.shape, la):
            ax = rules.get(name)
            if ax is not None and ax in mesh.shape and dim % mesh.shape[ax] == 0:
                spec.append(ax)
            else:
                spec.append(None)
        p_shard_flat.append(NamedSharding(mesh, PartitionSpec(*spec)))
    p_shard = jax.tree_util.tree_unflatten(treedef, p_shard_flat)

    opt_shapes = jax.eval_shape(opt.init, p_shapes)
    # optimizer moments mirror the param tree's sharding; scalar counts
    # replicate. Map by shape: a leaf shaped like a param gets its spec.
    by_shape = {}
    for leaf, s in zip(flat_p, p_shard_flat):
        by_shape.setdefault((leaf.shape, str(leaf.dtype)), s)
    repl = NamedSharding(mesh, PartitionSpec())

    def opt_spec(leaf):
        return by_shape.get((leaf.shape, str(leaf.dtype)), repl)

    opt_shard = jax.tree_util.tree_map(opt_spec, opt_shapes)

    b = params["train_batch_size"]
    if TOKENS:
        batch_shapes = {
            "tokens": jax.ShapeDtypeStruct(
                (b, dalle.cfg.image_seq_len), jnp.int32
            ),
            "caption": jax.ShapeDtypeStruct(
                (b, params["text_seq_len"]), jnp.int32
            ),
        }
        vae_shapes = None
    else:
        img = params["vae_params"]["dataset"]["image_size"]
        batch_shapes = {
            "image": jax.ShapeDtypeStruct((b, img, img, 3), jnp.float32),
            "caption": jax.ShapeDtypeStruct(
                (b, params["text_seq_len"]), jnp.int32
            ),
        }
        vae_shapes = jax.eval_shape(
            DiscreteVAE(VAEConfig.from_params(params["vae_params"])).init,
            jax.random.PRNGKey(0),
        )
    batch_shard = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, PartitionSpec("data")), batch_shapes
    )

    # the Trainer's step at 12B semantics: grad-accum scan over num_mb
    # microbatches (tokens_per_mb_per_replica), mean grads, AdamW update
    from dalle_mtf_tpu.train.trainer import num_microbatches

    dp = mesh.shape.get("data", 1)
    num_mb = num_microbatches(params, b, dalle.cfg.total_seq_len, dp)

    def train_step(state, frozen, batch, rng):
        step = state["step"]
        p = state["params"]

        def compute(p_, mb, r):
            return loss_fn(p_, frozen, mb, r, step)

        if num_mb > 1:
            def split_mb(x):
                x = x.reshape(x.shape[0] // num_mb, num_mb, *x.shape[1:])
                x = jnp.swapaxes(x, 0, 1)
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, PartitionSpec(None, "data"))
                )

            mbs = jax.tree_util.tree_map(split_mb, batch)
            rngs = jax.random.split(rng, num_mb)
            zero = jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, jnp.float32), p
            )

            def body(acc, xs):
                mb, r = xs
                (loss, _aux), g = jax.value_and_grad(
                    compute, has_aux=True)(p, mb, r)
                return (jax.tree_util.tree_map(jnp.add, acc[0], g),
                        acc[1] + loss), None

            (grads, loss_sum), _ = jax.lax.scan(
                body, (zero, jnp.zeros((), jnp.float32)), (mbs, rngs)
            )
            grads = jax.tree_util.tree_map(lambda g: g / num_mb, grads)
            loss = loss_sum / num_mb
        else:
            (loss, _aux), grads = jax.value_and_grad(
                compute, has_aux=True)(p, batch, rng)
        updates, new_opt = opt.update(grads, state["opt_state"], p)
        import optax

        return {
            "step": step + 1,
            "params": optax.apply_updates(p, updates),
            "opt_state": new_opt,
        }, loss

    def sds(tree, shardings=None):
        if shardings is None:
            return tree
        return jax.tree_util.tree_map(
            lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s),
            tree, shardings,
            is_leaf=lambda x: isinstance(
                x, (jax.ShapeDtypeStruct, NamedSharding)
            ),
        )

    state_shapes = {
        "step": jax.ShapeDtypeStruct((), jnp.int32),
        "params": sds(p_shapes, p_shard),
        "opt_state": sds(opt_shapes, opt_shard),
    }
    rng_s = jax.ShapeDtypeStruct((2,), jnp.uint32)

    with mesh:
        lowered = jax.jit(train_step, donate_argnums=(0,)).lower(
            state_shapes,
            vae_shapes,
            sds(batch_shapes, batch_shard),
            rng_s,
        )
        compiled = lowered.compile()
    mem = compiled.memory_analysis()
    rec = {
        "metric": f"dalle_12B_aot_{TOPOLOGY.replace(':', '_')}",
        "topology": TOPOLOGY,
        "mode": "tokens" if TOKENS else "images",
        "num_microbatches": int(num_mb),
        "ok": True,
    }
    if mem is not None:
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, k, None)
            if v is not None:
                rec[k.replace("_in_bytes", "_gib")] = round(v / 2**30, 3)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
