"""Shared fixtures for the two-process multi-host test: the config and the
deterministic global batch must be identical in the worker processes and in
the in-process single-host reference run."""

import numpy as np

from dalle_mtf_tpu.utils.config import Config

GLOBAL_BATCH = 8


def task_params() -> Config:
    return Config.from_mapping(
        {
            "config_name": "multihost_numerics",
            "model_type": "dalle",
            "dataset": {"image_size": 16},
            "n_embd": 64,
            "text_vocab_size": 40,
            "image_vocab_size": 32,
            "text_seq_len": 8,
            "n_layers": 2,
            "n_heads": 4,
            "train_batch_size": GLOBAL_BATCH,
            "train_steps": 1,
            "lr": 1e-3,
            "warmup_steps": 0,
            "mesh_shape": "data:8",
            "layout": "batch_dim:data",
            "vae_params": {
                "dataset": {"image_size": 16},
                "num_tokens": 32,
                "convblocks": [[1, 8], [1, 16]],
            },
        }
    )


def make_global_batch() -> dict:
    rng = np.random.RandomState(0)
    return {
        "image": np.asarray(
            rng.uniform(-1, 1, (GLOBAL_BATCH, 16, 16, 3)), np.float32
        ),
        "caption": np.asarray(rng.randint(0, 40, (GLOBAL_BATCH, 8)), np.int32),
    }
