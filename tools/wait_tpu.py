"""Block until the TPU backend answers a trivial op, then exit 0.

The tunneled dev-rig relay wedges episodically (minutes at a time; see
.claude/skills/verify/SKILL.md "Environment gotchas") — a drive that
launches straight into a compile wastes its timeout inside the wedge.
Gate drives on this instead:

    python tools/wait_tpu.py --timeout 3600 && python bench.py

Each probe runs `float(jnp.ones((8,8)).sum())` in a SUBPROCESS with its
own hard timeout (an in-process fetch would hang this script along with
the relay), retrying every --interval seconds. Exit 0 on the first
healthy probe, 1 when --timeout elapses first.

Note the probe inherits the session backend (axon): `JAX_PLATFORMS=cpu`
in the environment does NOT redirect it — the TPU plugin's sitecustomize
sets jax_platforms at interpreter start, which wins over the env var
(tests/conftest.py documents the post-import `jax.config.update`
override CPU-hermetic code must use).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

PROBE = "import jax, jax.numpy as jnp; print(float(jnp.ones((8, 8)).sum()))"


def probe_once(probe_timeout: float) -> bool:
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE],
            capture_output=True, timeout=probe_timeout,
        )
        return out.returncode == 0 and b"64.0" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=3600,
                    help="give up after this many seconds (exit 1)")
    ap.add_argument("--interval", type=float, default=60,
                    help="seconds between probes")
    ap.add_argument("--probe-timeout", type=float, default=45,
                    help="per-probe subprocess timeout")
    args = ap.parse_args()

    deadline = time.time() + args.timeout
    attempt = 0
    while True:
        attempt += 1
        if probe_once(args.probe_timeout):
            print(f"tpu healthy (attempt {attempt})")
            return 0
        if time.time() >= deadline:
            print(f"tpu still wedged after {args.timeout:.0f}s", file=sys.stderr)
            return 1
        print(f"tpu wedged (attempt {attempt}); retrying in {args.interval:.0f}s",
              flush=True)
        time.sleep(min(args.interval, max(0.0, deadline - time.time())))


if __name__ == "__main__":
    raise SystemExit(main())
