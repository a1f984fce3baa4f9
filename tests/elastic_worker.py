"""Worker for tests/test_elastic_supervisor.py: a small deterministic
training run (6 steps, checkpoint every 2) that the elastic supervisor
launches and relaunches. World membership comes from the supervisor's env
(JAX_NUM_PROCESSES / JAX_PROCESS_ID / JAX_COORDINATOR_ADDRESS); each
process feeds its contiguous slice of the same step-keyed global batch.
``ELASTIC_KILL`` = "<pid>:<after_step>" makes that process write its
``<host>.gone`` roster marker and die right after that step's checkpoint —
the injected preemption. Prints ``RESULT {json}`` on completion.
"""

import json
import os
import sys

n_procs = int(os.environ.get("JAX_NUM_PROCESSES") or 1)
pid = int(os.environ.get("JAX_PROCESS_ID") or 0)
local_devices = int(os.environ["ELASTIC_LOCAL_DEVICES"])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={local_devices}"
)
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dalle_mtf_tpu.utils.distributed import maybe_initialize_distributed  # noqa: E402

maybe_initialize_distributed()

import numpy as np  # noqa: E402

from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig  # noqa: E402
from dalle_mtf_tpu.train.tasks import make_dalle_task  # noqa: E402
from dalle_mtf_tpu.train.trainer import Trainer  # noqa: E402
from tests.multihost_common import GLOBAL_BATCH, task_params  # noqa: E402

TRAIN_STEPS = 6
CKPT_EVERY = 2


def make_step_batch(step: int) -> dict:
    rng = np.random.RandomState(100 + step)
    return {
        "image": np.asarray(
            rng.uniform(-1, 1, (GLOBAL_BATCH, 16, 16, 3)), np.float32
        ),
        "caption": np.asarray(rng.randint(0, 40, (GLOBAL_BATCH, 8)), np.int32),
    }


def main():
    model_dir = os.environ["ELASTIC_MODEL_DIR"]
    kill = os.environ.get("ELASTIC_KILL")  # "<pid>:<after_step>" or unset
    kill_pid, kill_after = (-1, -1)
    if kill:
        kill_pid, kill_after = (int(x) for x in kill.split(":"))

    params = task_params()
    vae_cfg = VAEConfig.from_params(params["vae_params"])
    vae_params = DiscreteVAE(vae_cfg).init(jax.random.PRNGKey(7))
    dalle, _v, init_fn, loss_fn, _e, axes = make_dalle_task(params)
    trainer = Trainer(
        params, init_fn, loss_fn, axes,
        model_dir=model_dir, seq_len=dalle.cfg.total_seq_len,
        frozen_params=vae_params,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = trainer.restore(state)
    start = int(jax.device_get(state["step"]))
    print(f"worker pid={pid}/{n_procs} resuming at step {start}", flush=True)

    rows_per = GLOBAL_BATCH // n_procs
    for step in range(start, TRAIN_STEPS):
        batch = make_step_batch(step)
        local = {
            k: v[pid * rows_per:(pid + 1) * rows_per] for k, v in batch.items()
        }
        state, metrics = trainer.train_step(
            state, local, jax.random.fold_in(jax.random.PRNGKey(1), step)
        )
        done = step + 1
        if done % CKPT_EVERY == 0 or done == TRAIN_STEPS:
            trainer.save(state)
            trainer.wait_for_checkpoints()
        if pid == kill_pid and done == kill_after:
            # permanent preemption: leave the roster, then die without any
            # shutdown handshake (the supervisor + peers react)
            host = os.environ["ELASTIC_HOST_ID"]
            roster_dir = os.environ["ELASTIC_ROSTER_DIR"]
            with open(os.path.join(roster_dir, f"{host}.gone"), "w") as f:
                f.write("preempted")
            print(f"worker pid={pid}: injected kill after step {done}",
                  flush=True)
            os._exit(17)

    out = {
        "pid": pid,
        "loss": float(jax.device_get(metrics["loss"])),
        "param_sum": float(
            sum(
                np.abs(np.asarray(jax.device_get(x), np.float64)).sum()
                for x in jax.tree_util.tree_leaves(state["params"])
            )
        ),
    }
    trainer.close()
    print("RESULT " + json.dumps(out), flush=True)
    if pid == 0:  # for the supervisor test (child stdout isn't captured)
        with open(os.path.join(model_dir, "result.json"), "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
