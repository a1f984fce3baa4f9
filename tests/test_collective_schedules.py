"""Offline proofs of the collective schedules (VERDICT r3 next-round #9).

Real multi-chip timing is environment-blocked (one chip), but the SHAPE of
the communication is provable on the virtual mesh: the ring must move k/v
only via neighbor collective-permutes (never an all-gather — the whole
point of ring attention, vs mtf materializing attention over a replicated
memory dim, reference models.py:287-299), and the GPipe schedule must be a
scan of exactly M+P-1 steps whose only inter-stage traffic is a neighbor
ppermute (parallel/pipeline.py). Plus the fp32 wedge-VMEM regression test
from ADVICE r2 item 1: fp32 backward tiles must stay inside the 16 MB VMEM
budget at dalle_12B's padded shapes.
"""

import dataclasses
import re

import jax
import jax.numpy as jnp
import numpy as np

from dalle_mtf_tpu.models.dalle import DALLE, DalleConfig
from dalle_mtf_tpu.parallel.mesh import build_mesh


def _collect_eqns(jaxpr, out):
    for eqn in jaxpr.eqns:
        out.append(eqn)
        for v in eqn.params.values():
            for j in jax.tree_util.tree_leaves(
                v, is_leaf=lambda x: hasattr(x, "eqns")
            ):
                if hasattr(j, "eqns"):
                    _collect_eqns(j, out)
                elif hasattr(j, "jaxpr"):
                    _collect_eqns(j.jaxpr, out)


def _all_eqns(closed_jaxpr):
    out = []
    _collect_eqns(closed_jaxpr.jaxpr, out)
    return out


class TestRingSchedule:
    """data:2,seq:4 — 4 sequence shards per ring."""

    def _hlo(self):
        from dalle_mtf_tpu.ops.ring_attention import ring_attention_auto

        mesh = build_mesh("data:2,seq:4")
        b, h, s, d = 2, 4, 64, 64
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (
            jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks
        )

        def f(q_, k_, v_):
            out = ring_attention_auto(
                q_, k_, v_, seq_axis="seq", batch_axis="data"
            )
            return (out.astype(jnp.float32) ** 2).sum()

        with mesh:
            return (
                jax.jit(jax.grad(f, argnums=(0, 1, 2)))
                .lower(q, k, v)
                .compile()
                .as_text()
            )

    def test_kv_moves_by_neighbor_permute_only(self):
        hlo = self._hlo()
        pairs = []
        for m in re.finditer(r"source_target_pairs=\{([^}]*(?:\},\{[^}]*)*)\}\}", hlo):
            for p in re.findall(r"\{(\d+),(\d+)\}", m.group(0)):
                pairs.append((int(p[0]), int(p[1])))
        assert pairs, "ring emitted no collective-permute at all"
        # mesh data:2,seq:4 lays devices [data, seq] row-major: seq rings
        # are {0..3} and {4..7}; every hop must stay in its ring and move
        # exactly one position (either direction — the backward ring keeps
        # rotating forward, the fwd ring rotates forward)
        for s_, t in pairs:
            assert s_ // 4 == t // 4, f"hop {s_}->{t} crosses rings"
            delta = (t - s_) % 4
            assert delta in (1, 3), f"non-neighbor hop {s_}->{t}"

    def test_no_gathered_kv(self):
        hlo = self._hlo()
        # per-device k/v shard is [1, 4, 16, 64] = 4096 elems; any
        # all-gather producing >= 2 shards' worth of a tensor would mean
        # GSPMD gathered k/v instead of riding the ring
        limit = 2 * 4096
        for line in hlo.splitlines():
            if "all-gather" not in line:
                continue
            for shape in re.findall(r"(?:f32|bf16|f16)\[([\d,]+)\]", line):
                elems = int(np.prod([int(x) for x in shape.split(",")]))
                assert elems < limit, f"gathered kv-sized operand: {line}"


class TestPipelineSchedule:
    def test_scan_has_m_plus_p_minus_1_steps_and_neighbor_permute(self):
        cfg = DalleConfig(
            n_embd=64, text_vocab_size=48, image_vocab_size=32,
            text_seq_len=8, image_seq_len=16, n_layers=4, n_heads=2,
            pipe_axis="pipe", pipeline_microbatches=4,
        )
        model = DALLE(cfg)
        params = model.init(jax.random.PRNGKey(0))
        toks = jax.random.randint(
            jax.random.PRNGKey(1), (8, cfg.total_seq_len), 0,
            cfg.total_tokens, dtype=jnp.int32,
        )
        from jax.sharding import Mesh

        devs = np.array(jax.devices()[:4]).reshape(2, 2)
        with Mesh(devs, ("pipe", "data")):
            jaxpr = jax.make_jaxpr(
                lambda p, t: model.loss(p, t, train=False)[0]
            )(params, toks)
        eqns = _all_eqns(jaxpr)
        # GPipe: M + P - 1 = 4 + 2 - 1 = 5 schedule steps
        sched = [
            e for e in eqns
            if e.primitive.name == "scan" and e.params.get("length") == 5
        ]
        assert sched, "no scan with M+P-1=5 steps found"
        inner = []
        _collect_eqns(sched[0].params["jaxpr"].jaxpr, inner)
        perms = [e for e in inner if e.primitive.name == "ppermute"]
        assert perms, "pipeline schedule step has no ppermute"
        for e in perms:
            perm = list(e.params["perm"])
            assert sorted(perm) == [(0, 1), (1, 0)], perm
        # and nothing all-gathers activations between stages
        assert not any(e.primitive.name == "all_gather" for e in inner)


class TestWedgeFp32VmemSafety:
    """ADVICE r2 item 1 regression: fp32 doubles every operand on the wedge
    kernels' VMEM stack; the layout must shrink blocks so the worst call
    stays inside the 16 MB budget at dalle_12B's real padded shape
    (S=2560) and through the whole wedge regime."""

    @staticmethod
    def _worst_call_bytes(s: int, itemsize: int) -> int:
        from dalle_mtf_tpu.ops.attention import (
            LSE_LANES,
            LSE_ROWS,
            _wedge_layout,
        )

        block, s_pad, n_blk = _wedge_layout(s, itemsize)
        d = 128
        # backward worst call (i = n_blk - 1): k/v prefix = full s_pad,
        # q/do full, ONE live [block, s_pad] fp32 score tile (Mosaic
        # reuses the buffer across s -> p -> ds, same liveness model as
        # _wedge_long_cap's docstring — hardware-validated: the fp32
        # S=2560 layout (block 384, s_pad 3072) Mosaic-compiled and ran
        # on v5e, r4 session probe), per-row lse/dsum operands, 3 block
        # outputs
        operands = 4 * s_pad * d * itemsize  # k, v, q, do
        rows = 2 * block * LSE_LANES * 4 + 2 * LSE_ROWS * s_pad * 4
        scores = block * s_pad * 4
        outs = 3 * block * d * itemsize
        return operands + rows + scores + outs

    def test_fp32_within_budget_across_wedge_regime(self):
        budget = 16 << 20
        for s in (1280, 2560, 3072):  # dalle_coco, dalle_12B, regime edge
            used = self._worst_call_bytes(s, itemsize=4)
            assert used < budget, (s, used)

    def test_fp32_blocks_shrink_vs_bf16(self):
        from dalle_mtf_tpu.ops.attention import _wedge_layout

        b16, _, _ = _wedge_layout(2560, itemsize=2)
        f32, _, _ = _wedge_layout(2560, itemsize=4)
        assert f32 < b16, (f32, b16)

    def test_fp32_wedge_grads_match_reference_at_12b_shape(self):
        """fp32 value+grad parity at S=2560 (interpret mode, 1 head)."""
        from dalle_mtf_tpu.ops.attention import (
            _wedge_backward,
            _wedge_forward,
            attention_reference,
        )

        b, h, s, d = 1, 1, 2560, 128
        ks = jax.random.split(jax.random.PRNGKey(3), 4)
        q, k, v, g = (
            jax.random.normal(kk, (b, h, s, d), jnp.float32) * 0.3
            for kk in ks
        )
        out, lse = _wedge_forward(
            q, k, v, window=None, interpret=True, with_lse=True
        )
        ref, ref_vjp = jax.vjp(
            lambda q_, k_, v_: attention_reference(q_, k_, v_), q, k, v
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4
        )
        dq, dk, dv = _wedge_backward(
            q, k, v, out, lse, g, window=None, interpret=True
        )
        rq, rk, rv = ref_vjp(g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=3e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=3e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=3e-4)
