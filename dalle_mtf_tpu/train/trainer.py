"""Generic sharded training loop.

Replaces the reference's TPUEstimator + mtf.Lowering stack (train_dalle.py:
57-98, model_fns.py:79-229) with a plain host loop dispatching a jit-compiled
SPMD train step:

- mesh + layout from the config's ``mesh_shape``/``layout`` strings;
- microbatch gradient accumulation via ``lax.scan``
  (mtf.serialize_training_step, model_fns.py:156-166);
- donated state buffers, async dispatch (the XLA device loop the reference
  got from ``iterations_per_loop`` falls out of JAX's async dispatch — the
  host runs ahead and only blocks on fetched metrics);
- orbax sharded checkpointing with crash-resume (the manual tf.train.Saver +
  MtfCheckpointSaverListener machinery, model_fns.py:204-229), max_to_keep=5
  like the reference;
- TensorBoard scalars/images via the metrics writer (host_call equivalent,
  utils/utils.py:103-161).
"""

from __future__ import annotations

import datetime
import logging
import os
import time
from typing import Any, Callable, Iterator, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from dalle_mtf_tpu.parallel.mesh import (
    build_mesh,
    logical_to_pspec,
    named_sharding,
    parse_layout,
)
from dalle_mtf_tpu.train.optim import get_optimizer
from dalle_mtf_tpu.utils.summaries import MetricsWriter

logger = logging.getLogger(__name__)

TrainState = dict  # {"step": i32[], "params": pytree, "opt_state": pytree}

# loss_fn(params, frozen_params, batch, rng, step) -> (loss, aux_scalars)
LossFn = Callable[[Any, Any, Any, jax.Array, jax.Array], tuple[jax.Array, Mapping]]


def num_microbatches(
    params: Mapping[str, Any], global_batch: int, seq_len: int, data_parallelism: int
) -> int:
    """Microbatch count from ``tokens_per_mb_per_replica``.

    Mirrors mtf_transformer.utils.serialize_num_microbatches as used at
    model_fns.py:141-154: tokens per microbatch per data-parallel replica
    caps the per-step working set; None/0 disables accumulation.
    """
    tokens_per_mb = params.get("tokens_per_mb_per_replica")
    if not tokens_per_mb:
        return 1
    batch_per_replica = max(1, global_batch // max(1, data_parallelism))
    tokens_per_replica = batch_per_replica * seq_len
    n = max(1, int(np.ceil(tokens_per_replica / tokens_per_mb)))
    # must divide the global batch
    n0 = n
    while global_batch % n != 0:
        n += 1
    if n != n0:
        # rounding up to a divisor shrinks the realized microbatch — at
        # e.g. batch 10 the requested 3 microbatches become 5, silently
        # halving tokens/microbatch vs the configured budget. Surface it.
        logger.warning(
            "num_microbatches rounded %d -> %d to divide global batch %d: "
            "realized %d rows (%d tokens) per microbatch per replica vs "
            "tokens_per_mb_per_replica=%d",
            n0, n, global_batch, max(1, batch_per_replica // n),
            max(1, batch_per_replica // n) * seq_len, tokens_per_mb,
        )
    return n


def global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


class Trainer:
    def __init__(
        self,
        params: Mapping[str, Any],
        init_fn: Callable[[jax.Array], Any],
        loss_fn: LossFn,
        logical_axes: Any,
        model_dir: str,
        seq_len: int,
        frozen_params: Any = None,
        mesh: Mesh | None = None,
        eval_loss_fn: LossFn | None = None,
    ):
        self.params = params
        self.init_fn = init_fn
        self.loss_fn = loss_fn
        self.eval_loss_fn = eval_loss_fn or loss_fn
        # gs:// dirs pass through untouched (reference writes to GCS too)
        self.model_dir = (
            model_dir
            if "://" in model_dir
            else os.path.abspath(os.path.expanduser(model_dir))
        )
        self.mesh = mesh if mesh is not None else build_mesh(params.get("mesh_shape"))
        self.rules = parse_layout(params.get("layout"))
        self.logical_axes = logical_axes
        self.batch_size = params["train_batch_size"]
        dp = self.mesh.shape.get("data", 1)
        self.num_mb = num_microbatches(params, self.batch_size, seq_len, dp)
        self.opt, self.schedule = get_optimizer(params)
        self.frozen_params = frozen_params
        self.writer = MetricsWriter(self.model_dir)
        self._train_step = None
        self._train_multi_fn = None
        self._eval_step = None
        self._ckpt_mngr = None

        self.batch_sharding = NamedSharding(
            self.mesh, PartitionSpec(self.rules.get("batch_dim", "data"))
        )
        logger.info(
            "trainer: mesh=%s layout=%s microbatches=%d",
            dict(self.mesh.shape), self.rules, self.num_mb,
        )

    # ------------------------------------------------------------- sharding
    # (activation constraints are built by parallel.mesh.make_constrain and
    # passed into the task's loss closure by the driver — the Trainer only
    # shards params and batches)

    def _param_shardings(self):
        return jax.tree_util.tree_map(
            lambda axes: named_sharding(self.mesh, self.rules, axes),
            self.logical_axes,
            is_leaf=lambda x: isinstance(x, tuple),
        )

    # ----------------------------------------------------------------- state

    def init_state(self, rng: jax.Array) -> TrainState:
        shardings = self._param_shardings()

        def make(rng_):
            params = self.init_fn(rng_)
            params = jax.tree_util.tree_map(
                jax.lax.with_sharding_constraint, params, shardings
            )
            opt_state = self.opt.init(params)
            return {
                "step": jnp.zeros((), jnp.int32),
                "params": params,
                "opt_state": opt_state,
            }

        with self.mesh:
            state = jax.jit(make)(rng)
        # materialize before anything else (notably orbax's background
        # threads) runs: leaving this async can starve the execution for
        # minutes on tunneled/remote TPU runtimes
        jax.block_until_ready(state)
        return state

    def param_count(self, state: TrainState) -> int:
        return sum(x.size for x in jax.tree_util.tree_leaves(state["params"]))

    # ------------------------------------------------------------ train step

    def _raw_step_fn(self):
        opt = self.opt
        num_mb = self.num_mb
        loss_fn = self.loss_fn
        schedule = self.schedule
        mesh = self.mesh
        batch_axis = self.rules.get("batch_dim", "data")

        def step_fn(state, frozen, batch, rng):
            step = state["step"]
            params = state["params"]

            def compute(p, mb, r):
                return loss_fn(p, frozen, mb, r, step)

            if num_mb > 1:
                # grad accumulation — mtf.serialize_training_step equivalent.
                # Split [B, ...] -> [num_mb, B/num_mb, ...] with the
                # microbatch as the MINOR batch stride (row b of microbatch i
                # is global row b*num_mb + i): each device's local rows then
                # spread over all microbatches, so every microbatch keeps the
                # per-replica batch sharding and GSPMD never reshards the
                # batch across devices. Grouping doesn't change the averaged
                # gradient — it is the mean over all B rows either way.
                def split_mb(x):
                    x = x.reshape(x.shape[0] // num_mb, num_mb, *x.shape[1:])
                    x = jnp.swapaxes(x, 0, 1)
                    return jax.lax.with_sharding_constraint(
                        x,
                        NamedSharding(mesh, PartitionSpec(None, batch_axis)),
                    )

                mbs = jax.tree_util.tree_map(split_mb, batch)
                rngs = jax.random.split(rng, num_mb)
                zero_grads = jax.tree_util.tree_map(
                    lambda x: jnp.zeros(x.shape, jnp.float32), params
                )
                mb0 = jax.tree_util.tree_map(lambda x: x[0], mbs)
                aux_shapes = jax.eval_shape(compute, params, mb0, rngs[0])[1]
                zero_aux = jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, jnp.float32), aux_shapes
                )

                def body(carry, xs):
                    g_acc, loss_acc, aux_acc = carry
                    mb, r = xs
                    (loss, aux_mb), g = jax.value_and_grad(compute, has_aux=True)(
                        params, mb, r
                    )
                    g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                    aux_acc = jax.tree_util.tree_map(
                        lambda a, v: a + v.astype(jnp.float32), aux_acc, aux_mb
                    )
                    return (g_acc, loss_acc + loss, aux_acc), None

                (grads, loss_sum, aux_sum), _ = jax.lax.scan(
                    body,
                    (zero_grads, jnp.zeros((), jnp.float32), zero_aux),
                    (mbs, rngs),
                )
                grads = jax.tree_util.tree_map(lambda g: g / num_mb, grads)
                loss = loss_sum / num_mb
                aux = jax.tree_util.tree_map(lambda a: a / num_mb, aux_sum)
                aux = dict(aux)
            else:
                (loss, aux), grads = jax.value_and_grad(compute, has_aux=True)(
                    params, batch, rng
                )
                aux = dict(aux)

            updates, new_opt_state = opt.update(grads, state["opt_state"], params)
            new_params = optax.apply_updates(params, updates)
            metrics = {
                "loss": loss.astype(jnp.float32),
                "grad_norm": global_norm(grads),
                "lr": schedule(step),
                **aux,
            }
            new_state = {
                "step": step + 1,
                "params": new_params,
                "opt_state": new_opt_state,
            }
            return new_state, metrics

        return step_fn

    def _build_train_step(self):
        return jax.jit(self._raw_step_fn(), donate_argnums=(0,))

    def _build_train_multi(self):
        """K training steps in ONE compiled program (lax.scan over pre-staged
        batches) — the reference's ``iterations_per_loop`` device loop
        (train_dalle.py:62-66). Async dispatch already keeps the device busy;
        this additionally removes the per-step host dispatch + next(data)
        from the critical path (worth several ms/step on tunneled runtimes).
        Returns the LAST step's metrics, like the reference which only
        surfaced host_call output at loop boundaries."""
        step_fn = self._raw_step_fn()

        def multi_fn(state, frozen, batches, rng_base):
            def body(st, mb):
                r = jax.random.fold_in(rng_base, st["step"])
                return step_fn(st, frozen, mb, r)

            state, ms = jax.lax.scan(body, state, batches)
            last = jax.tree_util.tree_map(lambda x: x[-1], ms)
            return state, last

        return jax.jit(multi_fn, donate_argnums=(0,))

    def _build_eval_step(self):
        eval_loss_fn = self.eval_loss_fn

        def eval_fn(state, frozen, batch, rng):
            loss, aux = eval_loss_fn(
                state["params"], frozen, batch, rng, state["step"]
            )
            return {"loss": loss.astype(jnp.float32), **aux}

        return jax.jit(eval_fn)

    def _put_batch(self, batch):
        """Place a host batch onto the mesh.

        Single process: plain device_put. Multi-host: each process holds
        1/process_count of the global batch (data/pipeline.py feeds per-host
        shards) and the global array is assembled without any cross-host
        transfer — the improvement over the reference's BROADCAST input
        (train_dalle.py:69).
        """
        if jax.process_count() == 1:
            return jax.device_put(batch, self.batch_sharding)
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                self.batch_sharding, np.asarray(x)
            ),
            batch,
        )

    def train_step(self, state, batch, rng):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        batch = self._put_batch(batch)
        with self.mesh:
            return self._train_step(state, self.frozen_params, batch, rng)

    def stage_batches(self, batches):
        """Stack K host batches to [K, B, ...] and start their transfer to
        the mesh (microstep dim replicated, batch dim sharded; per-host
        shards on multi-host, same as _put_batch).

        This is deliberately SEPARATE from dispatch: ``run()`` stages chunk
        i+1 while chunk i computes (the double-buffering TPUEstimator's
        infeed thread provided) — the r4d drive measured the unoverlapped
        form at 37.6k vs 97.0k tok/s/chip on image batches, because the
        whole [K, B, 256, 256, 3] super-batch otherwise lands on the
        critical path between chunks."""
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches
        )
        sharding = NamedSharding(
            self.mesh,
            PartitionSpec(None, self.rules.get("batch_dim", "data")),
        )
        if jax.process_count() == 1:
            return jax.device_put(stacked, sharding)
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            stacked,
        )

    def train_multi(self, state, batches=None, rng_base=None, staged=None):
        """Run a chunk of steps in one compiled device loop.

        Pass raw host ``batches`` (staged here, simple form) or an already
        ``staged`` super-batch from :meth:`stage_batches` (what ``run()``
        does, so staging overlaps the previous chunk's compute).

        ``rng_base`` is the same base key ``run()`` folds per step — the
        fold happens inside the scan body by the carried step counter, so a
        multi-step chunk reproduces the exact sequence of single steps.
        """
        if self._train_multi_fn is None:
            self._train_multi_fn = self._build_train_multi()
        if staged is None:
            staged = self.stage_batches(batches)
        with self.mesh:
            return self._train_multi_fn(
                state, self.frozen_params, staged, rng_base
            )

    def eval_step(self, state, batch, rng):
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        batch = self._put_batch(batch)
        with self.mesh:
            return self._eval_step(state, self.frozen_params, batch, rng)

    # ------------------------------------------------------------ checkpoint

    @property
    def ckpt_mngr(self):
        import orbax.checkpoint as ocp

        if self._ckpt_mngr is None:
            # retention mirrors the reference's sharded Saver: max_to_keep=5
            # plus keep_checkpoint_every_n_hours=2 (model_fns.py:204-208) —
            # orbax's keep_time_interval exempts one checkpoint per interval
            # from max_to_keep eviction, so long runs keep a sparse history
            hours = self.params.get("keep_checkpoint_every_n_hours")
            self._ckpt_mngr = ocp.CheckpointManager(
                os.path.join(self.model_dir, "checkpoints"),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.params.get("max_to_keep") or 5,
                    keep_time_interval=(
                        datetime.timedelta(hours=float(hours))
                        if hours else None
                    ),
                    create=True,
                ),
            )
        return self._ckpt_mngr

    def save(self, state: TrainState, step: int | None = None):
        import orbax.checkpoint as ocp

        if step is None:
            # external callers (elastic workers) pass no step; the run()
            # loop supplies its host-side counter so saving never blocks
            # on a device fetch (the tunneled-runtime wedge point)
            step = int(jax.device_get(state["step"]))
        self.ckpt_mngr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, state: TrainState) -> TrainState:
        """Restore latest checkpoint into the (sharded) template ``state``."""
        import orbax.checkpoint as ocp

        latest = self.ckpt_mngr.latest_step()
        if latest is None:
            return state
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, state
        )
        restored = self.ckpt_mngr.restore(
            latest, args=ocp.args.StandardRestore(abstract)
        )
        logger.info("restored checkpoint at step %d", latest)
        return restored

    def latest_step(self) -> int:
        latest = self.ckpt_mngr.latest_step()
        return 0 if latest is None else latest

    def wait_for_checkpoints(self):
        self.ckpt_mngr.wait_until_finished()

    # ------------------------------------------------------------- main loop

    def run(
        self,
        data_iter: Iterator[Any],
        rng: jax.Array,
        eval_data_iter: Iterator[Any] | None = None,
        summary_fn: Callable | None = None,
    ) -> TrainState:
        """Train until ``train_steps``, checkpointing and resuming.

        The reference's outer resume loop (train_dalle.py:80-98) collapses to:
        restore-latest, then run; a crash restarts from the last checkpoint.
        """
        p = self.params
        train_steps = p["train_steps"]
        steps_per_ckpt = p.get("steps_per_checkpoint") or 1000
        # "iterations" was the reference's device-loop length and therefore
        # its step-rate log cadence (log_step_count_steps=iterations,
        # train_dalle.py:62); honored here as the default log cadence.
        log_every = (
            p.get("log_every")
            or min(p.get("iterations") or 100, steps_per_ckpt)
        )
        eval_steps = p.get("eval_steps") or 0

        state = self.init_state(rng)
        state = self.restore(state)
        # the restored step is known host-side (init sets 0, restore sets
        # latest_step) — a device_get here would be a needless blocking
        # fetch at startup, the one operation tunneled runtimes wedge on
        start = self.latest_step()
        # startup layout dump (reference get_graph_info, utils/utils.py:55-100)
        from dalle_mtf_tpu.utils.introspect import describe_params  # noqa: PLC0415

        describe_params(state["params"], self.logical_axes, self.rules, self.mesh)
        logger.info(
            "training %s from step %d to %d (%.2fM params)",
            p.get("config_name"), start, train_steps,
            self.param_count(state) / 1e6,
        )

        step_rng = jax.random.fold_in(rng, 1)
        # device-loop length: the reference ran "iterations" steps per host
        # round-trip (train_dalle.py:62-66). Async dispatch already keeps
        # the device busy; chunks > 1 additionally take the per-step host
        # dispatch + next(data_iter) off the critical path via train_multi.
        # Capped so the two in-flight staged [K, B, ...] super-batches stay
        # modest (double-buffering keeps the current + next chunk resident).
        iterations = min(int(p.get("iterations") or 1), 32)
        # ...but the device loop only pays when the staged super-batch is
        # SMALL (token-mode batches: ~KBs/step). At image-batch sizes the
        # monolithic [K, B, 256, 256, 3] H2D transfer cannot hide behind
        # one chunk's compute even double-buffered, while per-step async
        # dispatch pipelines each step's 10-MB-class transfer with compute:
        # measured per-step 260 ms/step vs K=32 chunks 620-730 ms/step at
        # dalle_coco scale (BENCH.md r5 real-trainer table; VERDICT r4 #1).
        # Gate on bytes, not on key names, so any small-record task gets
        # the loop; "device_loop_max_stage_mb" overrides (0 disables).
        import itertools  # noqa: PLC0415

        peek = next(data_iter, None)
        if peek is not None:  # put the peeked batch back at the stream head
            data_iter = itertools.chain([peek], data_iter)
        if iterations > 1 and peek is not None:
            max_stage_mb = p.get("device_loop_max_stage_mb")
            max_stage_mb = 64.0 if max_stage_mb is None else float(max_stage_mb)
            batch_mb = sum(
                np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(peek)
            ) / 2**20
            if batch_mb * iterations > max_stage_mb:
                logger.info(
                    "device loop disabled: staging %d x %.1f MB batches "
                    "(> device_loop_max_stage_mb=%.0f) would stall the "
                    "critical path; using per-step async dispatch",
                    iterations, batch_mb, max_stage_mb,
                )
                iterations = 1

        def _chunk_lengths():
            # k is FIXED at `iterations` (or 1): every distinct chunk length
            # is a separate XLA compile of the K-step scanned program —
            # minutes per variant at scale — so instead of shrinking chunks
            # to hit log/ckpt boundaries exactly, logging and checkpointing
            # land on the nearest chunk boundary (only the final partial
            # chunk falls back to single steps, which reuse the first-step
            # executable). The first chunk is a single step so its metrics
            # surface immediately.
            s = start
            first = True
            while s < train_steps:
                k = min(iterations, train_steps - s)
                if k < iterations:
                    k = 1
                if first:
                    k = 1
                    first = False
                yield k
                s += k

        data_done = False

        def _stage(k):
            # k>1: host-stack + start the H2D transfer of the super-batch;
            # k==1: raw host batch (train_step stages it itself, cheap).
            # A finite (non-repeating) data iterator may exhaust here —
            # staging runs BEFORE the current chunk's log/checkpoint
            # bookkeeping, so exhaustion must not raise through it: return
            # None and let the loop finish the chunk cleanly instead.
            nonlocal data_done
            try:
                if k > 1:
                    return self.stage_batches(
                        [next(data_iter) for _ in range(k)]
                    )
                return next(data_iter)
            except StopIteration:
                data_done = True
                return None

        t0 = time.time()
        window_start_step = start
        step = start
        first = True
        last_saved = None
        chunk_iter = _chunk_lengths()
        k = next(chunk_iter, None)
        staged = _stage(k) if k else None
        if k and staged is None:
            k = None  # empty stream: nothing to train
        while k:
            k_next = next(chunk_iter, None)
            if k > 1:
                state, metrics = self.train_multi(
                    state, rng_base=step_rng, staged=staged
                )
            else:
                # async dispatch: fetching metrics only happens on log
                # steps, so the device runs ahead of the host
                state, metrics = self.train_step(
                    state, staged, jax.random.fold_in(step_rng, step)
                )
            # stage the NEXT chunk before any metric fetch blocks the host:
            # its host stacking + H2D transfer overlap this chunk's compute
            staged = _stage(k_next) if k_next else None
            if k_next and staged is None:
                logger.info(
                    "data stream exhausted after step %d; stopping early",
                    step + k,
                )
                k_next = None
            step += k
            if (step // log_every) > ((step - k) // log_every) or first:
                first = False
                m = {k_: float(jax.device_get(v)) for k_, v in metrics.items()}
                now = time.time()
                steps_done = step - window_start_step
                sps = steps_done / max(now - t0, 1e-9)
                t0, window_start_step = now, step
                self.writer.scalars(step, {**m, "steps_per_sec": sps})
                logger.info(
                    "step %d loss %.5f lr %.2e grad_norm %.3f %.2f steps/s",
                    step, m.get("loss", float("nan")),
                    m.get("lr", 0.0), m.get("grad_norm", 0.0), sps,
                )

            if (step // steps_per_ckpt) > ((step - k) // steps_per_ckpt) or step == train_steps:
                self.save(state, step)
                last_saved = step
                if eval_steps and eval_data_iter is not None:
                    eval_rng = jax.random.fold_in(rng, 2)
                    sums: dict[str, list[float]] = {}
                    for i in range(eval_steps):
                        em = self.eval_step(
                            state, next(eval_data_iter),
                            jax.random.fold_in(eval_rng, i),
                        )
                        for mk, v in em.items():
                            sums.setdefault(mk, []).append(
                                float(jax.device_get(v))
                            )
                    means = {
                        f"eval_{mk}": float(np.mean(v))
                        for mk, v in sums.items()
                    }
                    self.writer.scalars(step, means)
                    logger.info(
                        "step %d %s", step,
                        " ".join(
                            f"{mk} {v:.5f}" for mk, v in sorted(means.items())
                        ),
                    )
                if summary_fn is not None:
                    summary_fn(self, state, step)
            k = k_next
        if data_done and step > start and last_saved != step:
            # early exhaustion between checkpoint boundaries: persist the
            # trained state rather than dropping the tail
            self.save(state, step)
        self.wait_for_checkpoints()
        return state

    def close(self):
        self.writer.close()
        if self._ckpt_mngr is not None:
            self._ckpt_mngr.close()
