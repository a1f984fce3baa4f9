"""Elastic training supervisor (process-level restart on world resize).

Why process-level: the JAX distributed runtime deliberately LOG(FATAL)s
every surviving process when a peer stops heartbeating ("Terminating
process because the JAX distributed service detected fatal errors",
coordination-service client) — a worker cannot re-initialize in place.
Elasticity therefore lives one level up, like torchelastic's per-node
agent: this supervisor launches the training process, and when it dies —
its own crash, a preemption, or the runtime's reaction to a peer loss —
re-evaluates world membership and relaunches with the new size/rank.
Training resumes from the latest checkpoint (trainer crash-resume), and
restoring across a RESIZED mesh is exact (tests/test_elastic.py), so the
surviving hosts continue the same trajectory.

This goes beyond the reference's crash-and-resume outer loop
(train_dalle.py:80-98), which could only rejoin the SAME world.

Roster: a directory of ``<host>.alive`` marker files (one per live host,
refreshed by each supervisor; a ``<host>.gone`` marker removes a host
permanently). On preemptible fleets an external manager — or the hosts
themselves via a shared filesystem/GCS bucket — maintains the markers; the
sorted surviving set determines (num_processes, process_id) and host 0
serves the coordinator.

Usage:
    python -m dalle_mtf_tpu.utils.elastic --roster-dir gs-or-local-dir \\
        --host-id $(hostname) --coordinator-host <host0-dns> \\
        --port 9876 -- python train_dalle.py --model dalle_coco
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys
import time
from typing import Callable, Sequence

logger = logging.getLogger(__name__)


class FileRoster:
    """Live-host roster over marker files in a shared directory."""

    def __init__(self, roster_dir: str, host_id: str):
        self.dir = roster_dir
        self.host_id = host_id
        os.makedirs(roster_dir, exist_ok=True)

    def join(self):
        with open(os.path.join(self.dir, f"{self.host_id}.alive"), "w") as f:
            f.write(str(time.time()))

    def leave(self):
        try:
            os.unlink(os.path.join(self.dir, f"{self.host_id}.alive"))
        except FileNotFoundError:
            pass

    def hosts(self) -> list[str]:
        out = []
        for name in os.listdir(self.dir):
            if name.endswith(".alive"):
                h = name[: -len(".alive")]
                if not os.path.exists(os.path.join(self.dir, f"{h}.gone")):
                    out.append(h)
        return sorted(out)

    # ------------------------------------------------- shared launch epoch
    # The coordinator port must be derived from state every host AGREES on.
    # A local restart counter diverges (one host can crash-and-relaunch
    # more times than its peers, or a replacement joins at 0), after which
    # the hosts dial different ports and the world can never form. The
    # roster directory already is the shared medium, so the launch epoch
    # lives there too: the coordinator host's supervisor bumps it before
    # every launch; everyone else waits for a value they haven't used yet.

    def epoch(self) -> int:
        try:
            with open(os.path.join(self.dir, "epoch")) as f:
                return int(f.read().strip() or 0)
        except (FileNotFoundError, ValueError):
            return 0

    def bump_epoch(self) -> int:
        ep = self.epoch() + 1
        tmp = os.path.join(self.dir, f".epoch.{self.host_id}.tmp")
        with open(tmp, "w") as f:
            f.write(str(ep))
        os.replace(tmp, os.path.join(self.dir, "epoch"))
        return ep


def make_epoch_source(
    roster: FileRoster,
    host_id: str,
    coordinator_host: str | None = None,
    wait_timeout_s: float = 60.0,
) -> Callable[[list[str]], int]:
    """Shared-epoch source for ElasticSupervisor: the coordinator host's
    supervisor bumps the roster epoch before each launch; every other host
    waits (up to ``wait_timeout_s``) for an epoch it hasn't used yet.
    Convergence: any worker death fatals the whole world (see module
    docstring), so every supervisor relaunches and the coordinator's bump
    arrives within its backoff. The timeout fallback returns the current
    epoch so a lone spurious restart degrades to a failed initialize (and
    another loop) rather than a hang."""
    # Seed with the CURRENT roster epoch: a stale nonzero value left in a
    # reused roster dir must not satisfy a non-bumper's first wait — the
    # coordinator bumps past it at its own first launch, and accepting the
    # stale value would dial a port nobody listens on (burning a restart).
    last_used: list[int | None] = [roster.epoch() or None]

    def epoch(hosts: list[str]) -> int:
        bumper = (coordinator_host or hosts[0]) == host_id
        if bumper:
            ep = roster.bump_epoch()
        else:
            deadline = time.time() + wait_timeout_s
            ep = roster.epoch()
            while (ep == last_used[0] or ep == 0) and time.time() < deadline:
                time.sleep(0.5)
                ep = roster.epoch()
        last_used[0] = ep
        return ep

    return epoch


class ElasticSupervisor:
    """Launch-and-relaunch one host's training process as the world resizes.

    cmd: the training command (argv list). roster: () -> sorted live host
    ids. coordinator: (hosts, epoch) -> "host:port" for the world's
    process 0 (the epoch moves restart ports past TIME_WAIT). epoch:
    (hosts) -> shared launch epoch — use ``make_epoch_source`` so every
    host derives the SAME value from the roster; the default (the local
    attempt counter) is only safe when restarts cannot desynchronize
    (single remaining host, or tests that restart all hosts together).
    """

    def __init__(
        self,
        cmd: Sequence[str],
        host_id: str,
        roster: Callable[[], list[str]],
        coordinator: Callable[[list[str], int], str],
        max_restarts: int = 16,
        backoff_s: float = 2.0,
        env: dict | None = None,
        epoch: Callable[[list[str]], int] | None = None,
    ):
        self.cmd = list(cmd)
        self.host_id = host_id
        self.roster = roster
        self.coordinator = coordinator
        self.max_restarts = max_restarts
        self.backoff_s = backoff_s
        self.env = dict(env) if env else dict(os.environ)
        self.epoch = epoch

    def _world_env(self, attempt: int) -> dict | None:
        hosts = self.roster()
        if self.host_id not in hosts:
            return None  # we were removed from the world
        env = dict(self.env)
        n = len(hosts)
        env["JAX_NUM_PROCESSES"] = str(n)
        env["JAX_PROCESS_ID"] = str(hosts.index(self.host_id))
        if n > 1:
            ep = self.epoch(hosts) if self.epoch is not None else attempt
            env["JAX_COORDINATOR_ADDRESS"] = self.coordinator(hosts, ep)
        else:
            # single-host world: run without a distributed runtime at all
            env.pop("JAX_COORDINATOR_ADDRESS", None)
        return env

    def run(self) -> int:
        """Supervise until the training command exits 0, this host is
        removed from the roster, or restarts are exhausted. Returns the
        final child exit code (0 on clean completion/removal)."""
        rc = 0
        for attempt in range(self.max_restarts + 1):
            env = self._world_env(attempt)
            if env is None:
                logger.info("%s: removed from roster; supervisor exiting",
                            self.host_id)
                return 0
            logger.info(
                "%s: launching attempt %d as process %s/%s",
                self.host_id, attempt, env["JAX_PROCESS_ID"],
                env["JAX_NUM_PROCESSES"],
            )
            proc = subprocess.run(self.cmd, env=env)
            rc = proc.returncode
            if rc == 0:
                return 0
            logger.warning(
                "%s: training process died rc=%d (attempt %d) — "
                "re-evaluating world and restarting",
                self.host_id, rc, attempt,
            )
            time.sleep(self.backoff_s)
        logger.error("%s: restarts exhausted (last rc=%d)", self.host_id, rc)
        return rc


def main(argv: list[str] | None = None) -> int:
    import argparse

    argv = sys.argv[1:] if argv is None else argv
    if "--" in argv:
        split = argv.index("--")
        argv, cmd = argv[:split], argv[split + 1:]
    else:
        cmd = []
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--roster-dir", required=True)
    ap.add_argument("--host-id", default=os.uname().nodename)
    ap.add_argument("--coordinator-host", default=None,
                    help="DNS/IP of rank-0; default: the host id itself "
                         "(single-machine testing)")
    ap.add_argument("--port", type=int, default=9876)
    ap.add_argument("--max-restarts", type=int, default=16)
    args = ap.parse_args(argv)
    if not cmd:
        ap.error("training command required after --")
    logging.basicConfig(level=logging.INFO)

    roster = FileRoster(args.roster_dir, args.host_id)
    roster.join()

    def coordinator(hosts: list[str], epoch: int) -> str:
        host = args.coordinator_host or hosts[0]
        return f"{host}:{args.port + epoch % 64}"

    try:
        return ElasticSupervisor(
            cmd, args.host_id, roster.hosts, coordinator,
            max_restarts=args.max_restarts,
            epoch=make_epoch_source(
                roster, args.host_id, args.coordinator_host
            ),
        ).run()
    finally:
        roster.leave()


if __name__ == "__main__":
    sys.exit(main())
