"""Logging + model-dir management.

setup_logging mirrors the reference (utils/utils.py:184-195): a
logs/<config>.log file plus stdout. remove_model_dir mirrors the
interactive ``--new`` wipe (utils/utils.py:40-52) including the gsutil path
for GCS model dirs.
"""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
import sys


def setup_logging(config_name: str, log_dir: str = "logs") -> logging.Logger:
    os.makedirs(log_dir, exist_ok=True)
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    fh = logging.FileHandler(os.path.join(log_dir, f"{config_name}.log"))
    fh.setFormatter(fmt)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    # avoid duplicate handlers on repeated setup (tests)
    root.handlers = [
        h for h in root.handlers
        if not isinstance(h, (logging.FileHandler, logging.StreamHandler))
    ]
    root.addHandler(fh)
    root.addHandler(sh)
    return logging.getLogger("dalle_mtf_tpu")


def remove_model_dir(model_dir: str, interactive: bool = True):
    """Wipe a model dir for a fresh run (--new flag, utils/utils.py:40-52)."""
    if interactive:
        answer = input(
            f"Are you sure you want to remove '{model_dir}' to start afresh? [y/N] "
        )
        if answer.strip().lower() not in ("y", "yes"):
            print("aborting")
            sys.exit(0)
    if model_dir.startswith("gs://"):
        subprocess.run(["gsutil", "rm", "-rf", model_dir], check=False)
    elif os.path.isdir(model_dir):
        shutil.rmtree(model_dir)
