"""TPU provisioning CLI — parity with the reference's make_tpu.py:25-102.

Same ``TPUMaker`` surface (make_tpu / set_project / set_zone /
add_to_namelist / tpu_exists / get_name, preemptible defaults except v-8s),
updated for the JAX stack: creates TPU VMs (``gcloud compute tpus tpu-vm``)
with a runtime version instead of TF-1.15 TPU nodes, and probes existing
TPUs with gcloud directly (no tpunicorn dependency).
"""

from __future__ import annotations

import argparse
import logging
import random
import shlex
import subprocess


class TPUMaker:
    def __init__(self, debug_mode: bool = True):
        self.namelist: list[str] = []
        self.runtime_version = "tpu-ubuntu2204-base"
        self.preemptible_v8s = False
        self.logger = logging.getLogger(__name__)
        self.logger.setLevel(logging.DEBUG if debug_mode else logging.INFO)
        self.project: str | None = None
        self.zone: str | None = None
        self.dry_run = False

    # ------------------------------------------------------------------ API

    def make_tpu(
        self,
        size: int,
        name: str | None = None,
        runtime_version: str | None = None,
        accelerator_type: str = "v5p",
        preemptible: bool = True,
        zone: str | None = None,
        project: str | None = None,
    ):
        project = self.project if project is None else project
        assert project is not None, (
            "Please set a default project (set_project) or pass one in, "
            "e.g. make_tpu.py create test 8 --project <projectname>"
        )
        zone = self.zone if zone is None else zone
        assert zone is not None, (
            "Please set a default zone (set_zone) or pass one in, "
            "e.g. make_tpu.py create test 8 --zone <zonename>"
        )
        # v-8s are often non-preemptible-only; same default as the reference
        # (make_tpu.py:37-40)
        if not self.preemptible_v8s and size == 8:
            preemptible = False
            self.logger.debug(
                "Setting preemptible to false for a v-8 (project default)"
            )
        if name is None:
            name = self.get_name()
        runtime_version = runtime_version or self.runtime_version
        cmd = (
            f"gcloud compute tpus tpu-vm create {name} --zone {zone} "
            f"--project {project} --version {runtime_version} "
            f"--accelerator-type {accelerator_type}-{size}"
            + (" --preemptible" if preemptible else "")
        )
        self.logger.info(cmd)
        return self._run(cmd)

    def add_to_namelist(self, name: str):
        self.namelist.append(name)

    def set_project(self, project_name: str):
        self.project = project_name

    def set_zone(self, zone: str):
        self.zone = zone

    def tpu_exists(self, name: str) -> bool:
        cmd = (
            f"gcloud compute tpus tpu-vm list --project {self.project} "
            f"--zone {self.zone} --filter name:{name} --format value(name)"
        )
        out = self._run(cmd, capture=True)
        return bool(out and out.strip())

    def get_name(self) -> str:
        if not self.namelist:
            raise Exception(
                "No name specified and default namelist is empty"
            )
        available = list(self.namelist)
        while available:
            name = random.choice(available)
            if self.tpu_exists(name):
                self.logger.debug("TPU %s exists", name)
                available.remove(name)
                continue
            return name
        raise Exception(
            "All tpu names in default namelist already exist - please pass a "
            "name or update the default namelist"
        )

    # ------------------------------------------------------------- plumbing

    def _run(self, cmd: str, capture: bool = False):
        if self.dry_run:
            print(f"[dry-run] {cmd}")
            return ""
        result = subprocess.run(
            shlex.split(cmd), capture_output=capture, text=True, check=False
        )
        return result.stdout if capture else result.returncode


def main():
    parser = argparse.ArgumentParser(description="create TPU slices via gcloud")
    parser.add_argument("command", choices=["create"])
    parser.add_argument("name", nargs="?", default=None)
    parser.add_argument("size", type=int, nargs="?", default=8)
    parser.add_argument("--project", type=str)
    parser.add_argument("--zone", type=str)
    parser.add_argument("--accelerator_type", type=str, default="v5p")
    parser.add_argument("--runtime_version", type=str, default=None)
    parser.add_argument("--no-preemptible", action="store_true")
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    t = TPUMaker()
    t.dry_run = args.dry_run
    if args.project:
        t.set_project(args.project)
    if args.zone:
        t.set_zone(args.zone)
    t.make_tpu(
        args.size,
        name=args.name,
        accelerator_type=args.accelerator_type,
        runtime_version=args.runtime_version,
        preemptible=not args.no_preemptible,
    )


if __name__ == "__main__":
    main()
