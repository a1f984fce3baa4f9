"""Every shipped config must parse and construct a consistent model.

This sweep catches schema drift mechanically — e.g. the reference shipped
dalle_coco.json with image_vocab_size 512 against vae_coco's num_tokens 2048
(a silent token-corruption bug); make_dalle_task's assert turns that into a
test failure here.
"""

import glob
import json
import os

import pytest

from dalle_mtf_tpu.models.dalle import DalleConfig
from dalle_mtf_tpu.models.vae import VAEConfig
from dalle_mtf_tpu.parallel.mesh import parse_layout, parse_mesh_shape
from dalle_mtf_tpu.utils.config import fetch_model_params

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")
CONFIGS = sorted(
    os.path.splitext(os.path.basename(p))[0]
    for p in glob.glob(os.path.join(CONFIG_DIR, "*.json"))
)


@pytest.mark.parametrize("name", CONFIGS)
def test_config_parses_and_builds(name):
    params = fetch_model_params(name, configs_dir=CONFIG_DIR)
    # mesh/layout strings must parse
    parse_mesh_shape(params.get("mesh_shape"))
    parse_layout(params.get("layout"))
    assert params["train_batch_size"] or params["model_type"] is None

    if params["model_type"] == "vae":
        cfg = VAEConfig.from_params(params)
        assert cfg.image_seq_len > 0
        assert cfg.num_tokens and cfg.num_tokens > 1
    elif params["model_type"] == "dalle":
        assert params["vae_params"] is not None, f"{name}: vae_model missing"
        vae_cfg = VAEConfig.from_params(params["vae_params"])
        cfg = DalleConfig.from_params(params, vae_cfg.image_seq_len)
        # the pairing the reference shipped broken
        assert cfg.image_vocab_size == vae_cfg.num_tokens, (
            f"{name}: image_vocab_size {cfg.image_vocab_size} != VAE "
            f"num_tokens {vae_cfg.num_tokens}"
        )
        assert cfg.n_embd % cfg.n_heads == 0
        assert cfg.total_seq_len == cfg.text_seq_len + vae_cfg.image_seq_len
    else:
        pytest.fail(f"{name}: unknown model_type {params['model_type']}")
