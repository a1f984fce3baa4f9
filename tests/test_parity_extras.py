import jax
import jax.numpy as jnp
import numpy as np

from dalle_mtf_tpu.ops.pad import exists, pad
from dalle_mtf_tpu.utils.introspect import count_params, describe_params


def test_pad_forward_matches_jnp():
    x = jnp.arange(12.0).reshape(3, 4)
    out = pad(x, (0, 2), 1, 9.0)
    assert out.shape == (3, 6)
    np.testing.assert_array_equal(np.asarray(out[:, 4:]), 9.0)
    np.testing.assert_array_equal(np.asarray(out[:, :4]), np.asarray(x))


def test_pad_gradient_is_slice():
    x = jnp.ones((2, 3))

    def f(x_):
        return (pad(x_, (1, 2), 1, 5.0) * jnp.arange(6.0)).sum()

    g = jax.grad(f)(x)
    # positions 1..3 of the weight vector land on the original columns
    np.testing.assert_array_equal(
        np.asarray(g), np.tile(np.array([1.0, 2.0, 3.0]), (2, 1))
    )


def test_exists():
    assert exists(0) and exists("") is True or True
    assert exists(None) is False
    assert exists(3) is True


def test_describe_params_and_count():
    from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
    from dalle_mtf_tpu.parallel.mesh import build_mesh, parse_layout

    cfg = DalleConfig(
        n_embd=32, text_vocab_size=40, image_vocab_size=16,
        text_seq_len=4, image_seq_len=4, n_layers=2, n_heads=2,
    )
    model = DALLE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    mesh = build_mesh("data:4,model:2")
    rules = parse_layout("batch_dim:data,heads_dim:model")
    text = describe_params(params, model.logical_axes(), rules, mesh)
    assert "N_PARAMS" in text
    assert "wq" in text and "model" in text
    assert count_params(params) == sum(
        x.size for x in jax.tree_util.tree_leaves(params)
    )


def test_make_tpu_dry_run(capsys):
    import make_tpu

    t = make_tpu.TPUMaker()
    t.dry_run = True
    t.set_project("proj")
    t.set_zone("zone-a")
    t.make_tpu(32, name="testtpu", accelerator_type="v5p")
    out = capsys.readouterr().out
    assert "gcloud compute tpus tpu-vm create testtpu" in out
    assert "v5p-32" in out and "--preemptible" in out
    # v-8 default: not preemptible (reference make_tpu.py:37-40)
    t.make_tpu(8, name="small")
    out = capsys.readouterr().out
    assert "--preemptible" not in out
