"""Two-process multi-host training step (VERDICT r1 item 10).

Spawns two cooperating CPU processes (jax.distributed over localhost, 4
fake devices each = 8 global). Each feeds only its half of the global batch
through the Trainer's per-host path (make_array_from_process_local_data),
and the resulting loss/grad-norm/updated-params must match a plain
single-process run on the same global batch — proving the per-host feed
assembles the same global step as the reference's BROADCAST input, without
any cross-host batch transfer.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

# long-running: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    from dalle_mtf_tpu.models.vae import DiscreteVAE, VAEConfig
    from dalle_mtf_tpu.train.tasks import make_dalle_task
    from dalle_mtf_tpu.train.trainer import Trainer
    from tests.multihost_common import make_global_batch, task_params

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
        state, metrics = trainer.train_step(
            state, make_global_batch(), jax.random.PRNGKey(1)
        )
        out = {
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
    return out


def test_two_process_step_matches_single_process(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(worker)),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.skip("multihost worker timed out (port/backend issue)")
        if p.returncode != 0:
            if "address in use" in stdout.lower() or "unavailable" in stdout.lower():
                pytest.skip(f"distributed init unavailable: {stdout[-300:]}")
            raise AssertionError(f"worker failed:\n{stdout[-3000:]}")
        line = [ln for ln in stdout.splitlines() if ln.startswith("RESULT ")][-1]
        outs.append(json.loads(line[len("RESULT "):]))

    # both processes agree with each other...
    assert abs(outs[0]["loss"] - outs[1]["loss"]) < 1e-6
    assert abs(outs[0]["param_sum"] - outs[1]["param_sum"]) < 1e-4
    # ...and with the single-process run on the same global batch
    ref = _single_process_reference()
    np.testing.assert_allclose(outs[0]["loss"], ref["loss"], rtol=2e-5)
    np.testing.assert_allclose(outs[0]["grad_norm"], ref["grad_norm"], rtol=2e-4)
    np.testing.assert_allclose(outs[0]["param_sum"], ref["param_sum"], rtol=2e-5)
