import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec

from dalle_mtf_tpu.parallel import (
    build_mesh,
    logical_to_pspec,
    named_sharding,
    parse_layout,
    parse_mesh_shape,
)
from dalle_mtf_tpu.utils.config import Config, fetch_model_params, image_seq_len


def test_config_missing_keys_read_none(tmp_path):
    cfg = Config.from_mapping({"a": 1, "nested": {"b": 2}})
    assert cfg["a"] == 1
    assert cfg["missing"] is None
    assert cfg["nested"]["also_missing"] is None
    # the reference's defaultdict only forgave []-access; attribute typos
    # must raise instead of silently reading None
    with pytest.raises(AttributeError):
        _ = cfg.missing


def test_fetch_model_params_nests_vae(tmp_path):
    vae = {"model_type": "vae", "num_tokens": 512, "dataset": {"image_size": 32}}
    dalle = {"model_type": "dalle", "n_embd": 64, "vae_model": "vae_x"}
    (tmp_path / "vae_x.json").write_text(json.dumps(vae))
    (tmp_path / "dalle_x.json").write_text(json.dumps(dalle))
    params = fetch_model_params("dalle_x", configs_dir=str(tmp_path))
    assert params["n_embd"] == 64
    assert params["vae_params"]["num_tokens"] == 512
    assert params["vae_params"]["dataset"]["image_size"] == 32
    assert params["nope"] is None


def test_image_seq_len_matches_reference_formula():
    # reference model_fns.py:68 — (H // 2**len(convblocks))**2 // stack_factor**2
    vae = {"dataset": {"image_size": 256}, "convblocks": [[2, 128], [3, 256], [5, 512]]}
    assert image_seq_len(vae) == 1024
    vae32 = {"dataset": {"image_size": 32}, "convblocks": [[3, 64], [3, 128], [3, 256]]}
    assert image_seq_len(vae32) == 16


def test_parse_mesh_and_layout():
    assert parse_mesh_shape("data:16,model:2") == [("data", 16), ("model", 2)]
    assert parse_mesh_shape(None) == [("data", 1)]
    assert parse_layout("batch_dim:data,heads_dim:model") == {
        "batch_dim": "data",
        "heads_dim": "model",
    }
    assert parse_layout(None) == {}


def test_build_mesh_exact_and_resized():
    mesh = build_mesh("data:4,model:2")
    assert mesh.shape == {"data": 4, "model": 2}
    # config written for 32 cores runs on 8 devices: model axis kept, data resized
    mesh = build_mesh("data:16,model:2")
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        build_mesh("data:16,model:2", allow_resize=False)


def test_logical_to_pspec_rules():
    rules = parse_layout("batch_dim:data,heads_dim:model")
    mesh = build_mesh("data:4,model:2")
    assert logical_to_pspec(("batch_dim", "total_seq_dim"), rules, mesh) == PartitionSpec("data")
    assert logical_to_pspec(("vocab_dim", "embed_dim"), rules, mesh) == PartitionSpec()
    assert logical_to_pspec(
        ("batch_dim", "heads_dim", "total_seq_dim"), rules, mesh
    ) == PartitionSpec("data", "model")
    # rule referencing an axis not in the mesh -> replicated, not an error
    rules2 = parse_layout("batch_dim:data,heads_dim:experts")
    assert logical_to_pspec(("batch_dim", "heads_dim"), rules2, mesh) == PartitionSpec("data")
    # same mesh axis twice in one tensor -> error (mtf raises too)
    with pytest.raises(ValueError):
        logical_to_pspec(("batch_dim", "other"), {"batch_dim": "data", "other": "data"}, mesh)


def test_sharded_matmul_runs_on_fake_mesh():
    mesh = build_mesh("data:4,model:2")
    rules = parse_layout("batch_dim:data,heads_dim:model")
    x = jnp.ones((8, 16), jnp.float32)
    xs = jax.device_put(x, named_sharding(mesh, rules, ("batch_dim", "embed_dim")))

    @jax.jit
    def f(a):
        return (a * 2.0).sum()

    assert np.isclose(float(f(xs)), 8 * 16 * 2.0)


def test_mesh_model_axis_innermost():
    """Topology-aware layout: the model (last) axis should map to adjacent
    device ids so TP collectives ride the shortest ICI hops — the JAX
    equivalent of the reference's device_assignment-driven mesh
    (utils/utils.py:163-182)."""
    from dalle_mtf_tpu.parallel.mesh import build_mesh

    mesh = build_mesh("data:4,model:2")
    ids = [[d.id for d in row] for row in mesh.devices]
    for row in ids:
        assert abs(row[0] - row[1]) == 1, f"model axis straddles chips: {ids}"
