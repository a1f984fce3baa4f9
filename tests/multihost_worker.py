"""Worker process for tests/test_multihost.py.

Runs ONE sharded DALLE training step as one of two cooperating processes
(jax.distributed over localhost, 4 fake CPU devices each = 8 global),
feeding only this process's shard of the global batch through the
Trainer's per-host path (make_array_from_process_local_data — the
improvement over the reference's BROADCAST input, train_dalle.py:69).
Prints one JSON line of metrics for the host test to compare.

Usage: python multihost_worker.py <process_id> <coordinator_port>
"""

import json
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    )
    + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    f"localhost:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig  # noqa: E402
from dalle_mtf_tpu.train.tasks import make_dalle_task  # noqa: E402
from dalle_mtf_tpu.train.trainer import Trainer  # noqa: E402
from dalle_mtf_tpu.utils.config import Config  # noqa: E402
from tests.multihost_common import GLOBAL_BATCH, make_global_batch, task_params  # noqa: E402


def main():
    params = task_params()
    vae_cfg = VAEConfig.from_params(params["vae_params"])
    vae_params = DiscreteVAE(vae_cfg).init(jax.random.PRNGKey(7))
    dalle, _v, init_fn, loss_fn, _e, axes = make_dalle_task(params)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(
            params, init_fn, loss_fn, axes,
            model_dir=tmp, seq_len=dalle.cfg.total_seq_len,
            frozen_params=vae_params,
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = make_global_batch()
        # this process contributes only its half of the global batch
        lo = pid * (GLOBAL_BATCH // 2)
        hi = lo + GLOBAL_BATCH // 2
        local = {k: v[lo:hi] for k, v in batch.items()}
        state, metrics = trainer.train_step(state, local, jax.random.PRNGKey(1))
        # every process sees identical (replicated) metrics + updated params
        out = {
            "pid": pid,
            "loss": float(jax.device_get(metrics["loss"])),
            "grad_norm": float(jax.device_get(metrics["grad_norm"])),
            "param_sum": float(
                sum(
                    np.abs(np.asarray(jax.device_get(x), np.float64)).sum()
                    for x in jax.tree_util.tree_leaves(state["params"])
                )
            ),
        }
        trainer.close()
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
