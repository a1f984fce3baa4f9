"""DALL-E: decoder-only autoregressive transformer over [text ; image] tokens.

Capability parity with the reference's mtf DALLE (src/dalle_mtf/models.py:
141-416): combined vocabulary text_vocab + image_vocab + 1 EOS (:157-158),
learned token (stddev 0.02) and positional (stddev 0.01) embeddings
(:186-219), pre-LN blocks of causal attention + 4x MLP with relu (:326-335),
depth-scaled init on residual-output projections (:361-371), fp32 logits
(:391-395), and the shifted next-token cross-entropy loss with EOS appended
(:348-359, 397-416). Local windowed attention (radius, :257-273) is supported
and — unlike the reference, whose ``transformer()`` only ever calls global
attention (:330) — actually selectable via ``attention_type``.

TPU-first design choices (not a port):
- layer parameters are stacked on a leading [n_layers] axis and the block is
  a single ``lax.scan`` body — one compiled block regardless of depth, with
  ``jax.checkpoint`` applied to the body when recompute_grad is on (the
  reference's per-layer mtf.recompute_grad, models.py:337-346);
- attention is the Pallas flash kernel (ops/attention.py) — no materialized
  [S, S] mask (the reference builds a dense -1e10 mask, models.py:221-227);
- the KV cache is a pytree updated with dynamic_update_slice inside a
  compiled decode loop — completing the incremental-inference path the
  reference only scaffolded (models.py:246-254, PREDICT raises).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp

from dalle_mtf_tpu.ops.attention import (
    causal_attention_tp,
    decode_attention,
)
from dalle_mtf_tpu.ops.layer_norm import layer_norm as pallas_layer_norm
from dalle_mtf_tpu.ops.losses import softmax_cross_entropy_with_logits
from dalle_mtf_tpu.utils.precision import Policy, get_policy

# Logical dimension names (the config "layout" string maps these to mesh axes;
# names follow the reference's mtf Dimension names, dalle_mtf/models.py:159-168).
LAYERS = "layers"
VOCAB = "vocab_dim"
EMBED = "embed_dim"
SEQ = "total_seq_dim"
EMBED_SEQ = "embed_seq_dim"
HEADS = "heads_dim"
KV = "kv_dim"
INTERMEDIATE = "intermediate_expanded"
BATCH = "batch_dim"


def _decode_unroll(n_layers: int) -> int:
    """Unroll factor for the decode-time layer scan.

    Batch-1 decode is op-overhead bound (~150 small ops/token, BENCH.md
    "Decode latency"): the rolled scan adds loop carry/condition overhead
    per layer and blocks XLA from scheduling across layer boundaries
    (e.g. prefetching layer l+1's weights during layer l's matvecs).
    Measured at dalle_coco scale on v5e (r4 drive, BENCH.md decode
    matrix): full unroll wins on the quantized arms — int8 0.514 s vs
    0.568 rolled, int4 0.584 vs 0.636 — while bf16 is marginally better
    rolled (0.730 vs 0.755); partial unroll LOSES outright (unroll=4
    measured 0.889 s in r3 — the mixed loop+unroll body defeats the
    scheduler). Default is "full" (quantized decode is the recommended
    serving path). ``DALLE_TPU_DECODE_UNROLL`` = int or
    "full"; set 1 to bound compile time on very deep decode stacks.
    Training uses the rolled scan unconditionally (its body is MXU-bound;
    unrolling only bloats compile).
    """
    import os  # noqa: PLC0415

    v = os.environ.get("DALLE_TPU_DECODE_UNROLL", "full")
    n = n_layers if v == "full" else int(v)
    return max(1, min(n, n_layers))


@jax.custom_vjp
def _head_matmul_bias(x, w, b):
    """Loss-head logits ``x @ w + b`` (activation dtype) with a fused
    bias-grad backward.

    Forward is bit-identical to the plain einsum + bias add. The custom
    backward folds ``db = sum_rows(dlogits)`` into the dw matmul by
    appending a ones column to x — [x; 1]^T @ dlogits yields dw AND db in
    ONE pass over the [B*S, V] cotangent. Without it, XLA emits a separate
    reduce that re-reads the 2.86 GB dlogits end to end (measured 3.8
    ms/step at dalle_coco scale — the r4b trace decomposition's last
    unfused full-size pass over the head)."""
    return jnp.einsum("bse,ev->bsv", x, w) + b.astype(x.dtype)


def _head_matmul_bias_fwd(x, w, b):
    return _head_matmul_bias(x, w, b), (x, w)


def _head_matmul_bias_bwd(res, dy):
    x, w = res
    dx = jnp.einsum("bsv,ev->bse", dy, w)
    ones = jnp.ones((*x.shape[:-1], 1), x.dtype)
    xa = jnp.concatenate([x, ones], axis=-1)
    # f32 accumulate (the MXU's native path); dw is then rounded to the
    # primal's dtype — the same value the direct bf16-output dot produces
    dwb = jnp.einsum(
        "bse,bsv->ev", xa, dy, preferred_element_type=jnp.float32
    )
    dw = dwb[:-1].astype(w.dtype)
    db = dwb[-1].astype(jnp.float32)
    return dx, dw, db


_head_matmul_bias.defvjp(_head_matmul_bias_fwd, _head_matmul_bias_bwd)


@dataclasses.dataclass(frozen=True)
class DalleConfig:
    n_embd: int
    text_vocab_size: int = 12800
    image_vocab_size: int = 512
    text_seq_len: int = 256
    image_seq_len: int = 1024
    n_layers: int = 6
    n_heads: int = 8
    bf_16: bool = False
    recompute_grad: bool = False
    # "global" | "local" | "ring" | "local_ring" (windowed attention over a
    # sequence-parallel ring)
    attention_type: str = "global"
    local_attention_radius: int = 256  # reference default (models.py:259)
    # mesh axes for attention_type "ring" (sequence parallelism) — taken
    # from the config's layout rules when built via from_params: the
    # sequence dim rides rules["total_seq_dim"], batch rules["batch_dim"],
    # heads rules["heads_dim"], so DP x TP x SP compose in one step
    ring_seq_axis: str = "seq"
    ring_batch_axis: str | None = "data"
    ring_heads_axis: str | None = None
    # packed-layout attention (ops/attention_packed.py): q/k/v stay in the
    # projections' natural [B, S, H*D] layout and the fused wedge kernels
    # slice head columns via BlockSpec index maps — deleting the per-layer
    # [B,H,S,D] transpose copies, remat-stack layout fixups, host prefix
    # slices/concats, and 94 MB lse/dsum broadcast operands the r4 trace
    # decomposition measured (~15-20 ms/step at dalle_coco scale). Shapes
    # outside the fused regime (long S, fp32, head_dim not a lane
    # multiple, non-TPU) transparently unpack and take the r1-r3
    # dispatcher, so this is safe to leave on everywhere except ring SP
    # (which has its own k/v rotation layout).
    attn_packed: bool = True
    # mesh axis the vocab dim shards over (layout rule ``vocab_dim:<axis>``)
    # — routes the fused xent to its shard-local-lse + psum path so no
    # gathered [*, V] logits ever exist under TP
    vocab_axis: str | None = None
    # layer-scan unrolling: 1 = one compiled block (fast compile, scan
    # carries stack saved residuals via dynamic-update-slice); n_layers =
    # straight-line layers (XLA addresses each layer's residuals directly —
    # profiled 56 ms/step of DUS copies at dalle_coco scale go away).
    # Config value "full" maps to n_layers. Measured (BENCH.md unroll
    # study): full unroll wins under packed+dots_and_attn (102.4k vs
    # 95.0k tok/s/chip at dalle_coco scale); PARTIAL unroll loses badly
    # (78.0k at unroll=4 — keeps the DUS stacking but defeats the rolled
    # scan's software pipelining), so use 1 or full, nothing between.
    scan_unroll: int = 1
    # pipeline parallelism: a ``layers:pipe`` layout rule names the mesh
    # axis the stacked layer dim shards over; the block stack then runs as
    # a GPipe schedule (parallel/pipeline.py) when that axis is in scope
    pipe_axis: str | None = None
    pipeline_microbatches: int | None = None  # default: pipe axis size
    embed_dropout: float = 0.0
    attention_dropout: float = 0.0
    residual_dropout: float = 0.0
    scale_type: str = "scale_by_depth"  # | "scale_by_in" (models.py:362-368)
    eos_token_id: int | None = None
    # activation for the MLP: the reference's DALLE takes an activation_fn
    # arg defaulting to relu (models.py:147, 178-180)
    activation: str = "relu"  # | "gelu" | "swish"
    # remat policy when recompute_grad is on. The reference only had the
    # all-or-nothing mtf.recompute_grad; these are graded:
    #   "save_attn"        — keep projection outputs AND the Pallas attention
    #                        kernel's out+lse (never re-run the flash forward
    #                        in backward); drops the 4x-wide mlp1 hidden.
    #   "dots_saveable"    — keep all matmul outputs (but the attention
    #                        kernel, opaque to dot policies, re-runs in bwd).
    #   "dots_except_mlp1" — dots_saveable minus the mlp1 hidden (the
    #                        single biggest residual, [L, B, S, 4E]).
    #   "save_attn_lean"   — only attention out+lse and mlp2 (lowest memory
    #                        short of full recompute; projections re-run).
    #   "dots_and_attn"    — dots_saveable PLUS attention out/lse (nothing
    #                        recomputed in bwd; most memory). Under
    #                        attn_packed it is the MEASURED WINNER on v5e
    #                        at dalle_coco scale (93.9k vs 91.5k tok/s at
    #                        batch 18 — the saved out/lse stack in natural
    #                        layout, so eliding the attention re-forward
    #                        finally pays; BENCH.md r4). Under the bhsd
    #                        layout the stacked saves cost transposes and
    #                        it measured neutral.
    #   "nothing_saveable" — full recompute (biggest models).
    # Measured at dalle_coco scale on v5e (BENCH.md): dots_saveable@16 wins
    # (79.7k tok/s) — the remat'd attention forward overlaps into the
    # backward, so eliding it (save_attn, 76.4k) doesn't pay for the mlp1
    # recompute, and the memory-lean policies' bigger batch (24) nets out
    # slower (74.5k). save_attn* remain config options for memory-bound
    # (12B-class) models.
    remat_policy: str = "dots_saveable"
    # fused-xent row chunks: fewer chunks = fewer passes over the [E, V]
    # dw accumulator in the backward scan (its HBM traffic dominates the
    # fused path's cost) at the price of a larger [chunk, V] logits tile
    xent_chunks: int = 8
    # serving: route quantized matvec-geometry matmuls through the Pallas
    # streaming dequant kernels (ops/decode_matmul.py). Measured on v5e at
    # dalle_coco batch-1 decode they LOSE to the XLA einsum forms (int8
    # 1.161 s vs 0.921 s; int4 0.942 s vs 0.905 s): ~73 custom-call
    # launches per token cost more than the dequant fusion they guarantee.
    # Off by default; an option for batched-decode shapes where the
    # per-call overhead amortizes. Keep off for TP-sharded serving (GSPMD
    # cannot partition a pallas_call).
    decode_kernels: bool = False
    # layernorm compute dtype. The reference's norm (layers.py:30-33) runs
    # entirely in the ACTIVATION dtype — under bf_16 its mean/var/rsqrt
    # (and the g/b affine, models.py:373-389) are bf16 ops — so
    # "activation" is the ref-exact setting, and it halves the HBM traffic
    # of the VPU-bound fp32 LN backward chains (~33 ms/step at dalle_coco
    # scale; BENCH.md step profile). "float32" upcasts around the
    # normalize, which is strictly more precise than the reference.
    # NOTE: only consulted when ln_impl="xla" — the pallas kernels always
    # compute in fp32 internally (a warning fires on the combination).
    ln_dtype: str = "float32"  # | "activation"
    # layernorm implementation. "pallas" routes through the fused
    # forward/backward kernels (ops/layer_norm.py); "xla" keeps the
    # composed-op form, whose compute dtype ln_dtype picks. MEASURED
    # NEUTRAL on v5e (83.4k vs 83.5k tok/s, BENCH.md "LN impl A/B") —
    # the profile's "LN-backward chain" bucket is residual-chain traffic
    # XLA fuses either way, so the default stays "xla". Pallas applies
    # only where the feature dim is lane-aligned (n_embd % 128);
    # elsewhere it falls back to the XLA fp32 form.
    ln_impl: str = "xla"  # | "pallas"

    @classmethod
    def from_params(
        cls, params: Mapping[str, Any], image_seq_len: int
    ) -> "DalleConfig":
        from dalle_mtf_tpu.parallel.mesh import parse_layout  # noqa: PLC0415

        rules = parse_layout(params.get("layout") if hasattr(params, "get") else None)
        return cls(
            ring_seq_axis=rules.get(SEQ) or "seq",
            ring_batch_axis=rules.get(BATCH) or "data",
            ring_heads_axis=rules.get(HEADS),
            vocab_axis=rules.get(VOCAB),
            pipe_axis=rules.get(LAYERS),
            pipeline_microbatches=params.get("pipeline_microbatches"),
            # "full" = n_layers: straight-line layers, no residual-stacking
            # DUS copies — the measured winner at dalle_coco scale under
            # packed attention (BENCH.md unroll study: 102.4k vs 95.0k
            # rolled; partial unroll loses, so use 1 or "full")
            scan_unroll=(
                params["n_layers"]
                if params.get("scan_unroll") == "full"
                else int(params.get("scan_unroll") or 1)
            ),
            n_embd=params["n_embd"],
            text_vocab_size=params["text_vocab_size"],
            image_vocab_size=params["image_vocab_size"],
            text_seq_len=params["text_seq_len"],
            image_seq_len=image_seq_len,
            n_layers=params["n_layers"],
            n_heads=params["n_heads"],
            bf_16=bool(params.get("bf_16")),
            recompute_grad=bool(params.get("recompute_grad")),
            attention_type=params.get("attention_type") or "global",
            local_attention_radius=params.get("local_attention_radius") or 256,
            embed_dropout=params.get("embed_dropout") or 0.0,
            attention_dropout=params.get("attention_dropout") or 0.0,
            residual_dropout=params.get("residual_dropout") or 0.0,
            scale_type=params.get("scale_type") or "scale_by_depth",
            eos_token_id=params.get("eos_token_id"),
            activation=params.get("activation") or "relu",
            remat_policy=params.get("remat_policy") or "dots_saveable",
            xent_chunks=int(params.get("xent_chunks") or 8),
            decode_kernels=bool(params.get("decode_kernels", False)),
            ln_dtype=params.get("ln_dtype") or "float32",
            ln_impl=params.get("ln_impl") or "xla",
            attn_packed=bool(params.get("attn_packed", True)),
        )

    @property
    def total_tokens(self) -> int:
        # text + image vocab + 1 EOS (reference models.py:157-158)
        return self.text_vocab_size + self.image_vocab_size + 1

    @property
    def eos(self) -> int:
        return self.total_tokens - 1 if self.eos_token_id is None else self.eos_token_id

    @property
    def total_seq_len(self) -> int:
        return self.text_seq_len + self.image_seq_len

    @property
    def head_dim(self) -> int:
        assert self.n_embd % self.n_heads == 0, "n_embd must divide n_heads"
        return self.n_embd // self.n_heads

    @property
    def policy(self) -> Policy:
        return get_policy(self.bf_16)


def _normal(rng, shape, stddev):
    return stddev * jax.random.normal(rng, shape, jnp.float32)


class DALLE:
    def __init__(self, config: DalleConfig):
        self.cfg = config
        if config.ln_impl == "pallas" and config.ln_dtype == "activation":
            import logging  # noqa: PLC0415

            logging.getLogger(__name__).warning(
                "ln_impl='pallas' always computes the normalize in fp32 "
                "internally — ln_dtype='activation' (the reference-exact "
                "bf16 norm semantics) is ignored on that path; set "
                "ln_impl='xla' if you need activation-dtype LN math."
            )
        if config.attention_dropout > 0.0:
            import logging  # noqa: PLC0415

            from dalle_mtf_tpu.ops.attention import (  # noqa: PLC0415
                WHOLE_ROW_MAX_SEQ,
                _round_up,
            )

            log = logging.getLogger(__name__)
            if config.attention_type in ("ring", "local_ring"):
                pass  # hash dropout runs inside the ring kernels (global
                # coordinates per hop) — composes with SP, nothing to warn
            elif (
                _round_up(config.total_seq_len, 128) > WHOLE_ROW_MAX_SEQ
                or config.head_dim % 128 != 0
            ):
                # outside the wedge kernels' reach (long seq / non-lane-
                # multiple head_dim; also any non-TPU backend at runtime)
                # training falls back to the dense XLA path with
                # materialized [S, S] weights
                log.warning(
                    "attention_dropout=%.3g at S=%d head_dim=%d is outside "
                    "the wedge-kernel regime and materializes the full "
                    "[S, S] softmax weights (~%.1f MB fp32 per head-batch); "
                    "prefer residual_dropout at this scale",
                    config.attention_dropout,
                    config.total_seq_len,
                    config.head_dim,
                    4 * config.total_seq_len**2 / 1e6,
                )

    # ------------------------------------------------------------------ init

    def init(self, rng: jax.Array) -> dict:
        cfg = self.cfg
        e, h, d = cfg.n_embd, cfg.n_heads, cfg.head_dim
        inter = 4 * e
        ks = jax.random.split(rng, 12)
        # Init scaling mirrors the reference's linear() (models.py:361-371),
        # which is used for mlp1 (fan_in=E), mlp2 (fan_in=4E, scale=True) and
        # the logits projection (fan_in=E); attention projections use the mtf
        # default init (attention_params_simple, models.py:235) and are never
        # scaled. "scale_by_depth" scales only the scale=True call (mlp2) by
        # 1/sqrt(n_layers); "scale_by_in" scales every linear() call by
        # 1/sqrt(its own fan_in).
        mlp1_std = logits_std = 0.02
        if cfg.scale_type == "scale_by_depth":
            mlp2_std = 0.02 / math.sqrt(cfg.n_layers)
        elif cfg.scale_type == "scale_by_in":
            mlp1_std = 0.02 / math.sqrt(e)
            mlp2_std = 0.02 / math.sqrt(4 * e)
            logits_std = 0.02 / math.sqrt(e)
        else:
            mlp2_std = 0.02
        L = cfg.n_layers

        def stack(rng_, shape, stddev):
            return _normal(rng_, (L,) + shape, stddev)

        layers = {
            "ln1_g": jnp.ones((L, e)),
            "ln1_b": jnp.zeros((L, e)),
            "wq": stack(ks[0], (e, h, d), 0.02),
            "wk": stack(ks[1], (e, h, d), 0.02),
            "wv": stack(ks[2], (e, h, d), 0.02),
            "wo": stack(ks[3], (h, d, e), 0.02),
            "o_b": jnp.zeros((L, e)),
            "ln2_g": jnp.ones((L, e)),
            "ln2_b": jnp.zeros((L, e)),
            "w_mlp1": stack(ks[4], (e, inter), mlp1_std),
            "b_mlp1": jnp.zeros((L, inter)),
            "w_mlp2": stack(ks[5], (inter, e), mlp2_std),
            "b_mlp2": jnp.zeros((L, e)),
        }
        return {
            "wte": _normal(ks[6], (cfg.total_tokens, e), 0.02),
            "wpe": _normal(ks[7], (cfg.total_seq_len, e), 0.01),
            "layers": layers,
            "lnf_g": jnp.ones((e,)),
            "lnf_b": jnp.zeros((e,)),
            "w_out": _normal(ks[8], (e, cfg.total_tokens), logits_std),
            "b_out": jnp.zeros((cfg.total_tokens,)),
        }

    def logical_axes(self) -> dict:
        return {
            "wte": (VOCAB, EMBED),
            "wpe": (EMBED_SEQ, EMBED),
            "layers": {
                "ln1_g": (LAYERS, EMBED),
                "ln1_b": (LAYERS, EMBED),
                "wq": (LAYERS, EMBED, HEADS, KV),
                "wk": (LAYERS, EMBED, HEADS, KV),
                "wv": (LAYERS, EMBED, HEADS, KV),
                "wo": (LAYERS, HEADS, KV, EMBED),
                "o_b": (LAYERS, EMBED),
                "ln2_g": (LAYERS, EMBED),
                "ln2_b": (LAYERS, EMBED),
                "w_mlp1": (LAYERS, EMBED, INTERMEDIATE),
                "b_mlp1": (LAYERS, INTERMEDIATE),
                "w_mlp2": (LAYERS, INTERMEDIATE, EMBED),
                "b_mlp2": (LAYERS, EMBED),
            },
            "lnf_g": (EMBED,),
            "lnf_b": (EMBED,),
            "w_out": (EMBED, VOCAB),
            "b_out": (VOCAB,),
        }

    # --------------------------------------------------------------- helpers

    def _layer_norm(self, x, g, b, eps=1e-5):
        # reference layer_norm (models.py:373-389): normalize then affine.
        # cfg.ln_dtype picks the compute dtype: "activation" runs the whole
        # chain in x.dtype like the reference's norm (layers.py:30-33 —
        # bf16 reductions under bf_16; TPU reduces carry an f32 accumulator
        # either way), "float32" upcasts around the normalize.
        if self.cfg.ln_impl == "pallas":
            # fused kernels compute in fp32 internally (ops/layer_norm.py)
            return pallas_layer_norm(x, g, b, eps)
        ct = jnp.float32 if self.cfg.ln_dtype == "float32" else x.dtype
        xc = x.astype(ct)
        mean = jnp.mean(xc, axis=-1, keepdims=True)
        var = jnp.var(xc, axis=-1, keepdims=True)
        out = (xc - mean) * jax.lax.rsqrt(var + eps)
        out = out * g.astype(ct) + b.astype(ct)
        return out.astype(x.dtype)

    def _dropout(self, rng, x, rate, train):
        if not train or rate <= 0.0:
            return x
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))

    @property
    def _window(self):
        return (
            self.cfg.local_attention_radius
            if self.cfg.attention_type in ("local", "local_ring")
            else None
        )

    @property
    def _is_ring(self):
        return self.cfg.attention_type in ("ring", "local_ring")

    def _w(self, p, name):
        """Weight getter for the unpacked forms: dequantizes int8 serving
        weights transparently (quantize.py adds ``<name>_scale``; XLA fuses
        the convert+multiply into the reading matmul). Int4 never reaches
        here — _einsum_w streams its nibble views directly."""
        dtype = self.cfg.policy.compute_dtype
        w = p[name].astype(dtype)
        scale = p.get(name + "_scale")
        if scale is not None:
            w = w * scale.astype(dtype)
        return w

    def _streaming_eligible(self, m, k):
        """True when a quantized matmul should go through the Pallas
        streaming dequant kernels: matvec geometry (decode-scan rows),
        lane-aligned contraction, real TPU backend, and not disabled for
        TP-sharded serving (cfg.decode_kernels)."""
        from dalle_mtf_tpu.ops.attention import _on_tpu  # noqa: PLC0415

        return (
            self.cfg.decode_kernels and m <= 32 and k % 256 == 0 and _on_tpu()
        )

    def _quant_matmul(self, p, name, spec, x, int4):
        """Flatten the einsum geometry to [M, K] x [K, N] and stream the
        quantized weight through ops/decode_matmul.py — packed/int8 bytes
        read once per token, dequant in VMEM. Returns fp32 [.., N]-shaped
        per the einsum output (caller casts)."""
        from dalle_mtf_tpu.ops import decode_matmul as dmm  # noqa: PLC0415

        w, scale = p[name], p[name + "_scale"]
        bf16 = jnp.bfloat16
        if spec == "bse,ehd->bhsd":
            b, s, e = x.shape
            h, d = w.shape[-2], w.shape[-1]
            w2, s2 = w.reshape(-1, h * d), scale.reshape(1, h * d)
            x2 = x.reshape(b * s, e).astype(bf16)
            if int4:
                out = dmm.int4_matmul(x2[:, : e // 2], x2[:, e // 2 :], w2, s2)
            else:
                out = dmm.int8_matmul(x2, w2, s2)
            return out.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        if spec == "bhsd,hde->bse":
            b, h, s, d = x.shape
            e = w.shape[-1]
            w2, s2 = w.reshape(-1, e), scale.reshape(1, e)
            if int4:
                # wo packs head_dim halves PER HEAD ([H, D/2, E]); split d
                # within each head so the rows line up with the packed rows
                xl = x[..., : d // 2].transpose(0, 2, 1, 3).reshape(b * s, -1)
                xh = x[..., d // 2 :].transpose(0, 2, 1, 3).reshape(b * s, -1)
                out = dmm.int4_matmul(xl.astype(bf16), xh.astype(bf16), w2, s2)
            else:
                x2 = x.transpose(0, 2, 1, 3).reshape(b * s, -1).astype(bf16)
                out = dmm.int8_matmul(x2, w2, s2)
            return out.reshape(b, s, e)
        # "bse,ei->bsi" / "bsi,ie->bse"
        b, s, k = x.shape
        n = w.shape[-1]
        w2, s2 = w.reshape(-1, n), scale.reshape(1, n)
        x2 = x.reshape(b * s, k).astype(bf16)
        if int4:
            out = dmm.int4_matmul(x2[:, : k // 2], x2[:, k // 2 :], w2, s2)
        else:
            out = dmm.int8_matmul(x2, w2, s2)
        return out.reshape(b, s, n)

    def _einsum_w(self, p, name, spec, x):
        """Einsum against a possibly-quantized layer weight.

        Quantized weights at matvec geometry stream through the Pallas
        dequant kernels (_quant_matmul). Otherwise: for split-half packed
        int4 (quantize.py) the matmul decomposes into two einsums against
        the same-shape elementwise nibble views, each scaled like int8 —
        the pattern XLA fuses into the operand read. The packed contraction
        axis is always x's LAST axis for every layer weight (E for
        wq/wk/wv/w_mlp1, I for w_mlp2, D for wo), so the activation splits
        in half to match the packed row halves. No materialized wide unpack
        ever hits HBM (the stack+reshape interleave it replaces made int4
        decode 2.5x slower than int8 on v5e)."""
        dtype = self.cfg.policy.compute_dtype
        int4 = p.get(name + "_int4") is not None
        if p.get(name + "_scale") is not None:
            if spec == "bhsd,hde->bse":
                m, k = x.shape[0] * x.shape[2], x.shape[1] * x.shape[3]
            else:
                m, k = x.shape[0] * x.shape[1], x.shape[2]
            if self._streaming_eligible(m, k):
                return self._quant_matmul(p, name, spec, x, int4).astype(dtype)
        if not int4:
            return jnp.einsum(spec, x, self._w(p, name))
        from dalle_mtf_tpu.quantize import nibble_views  # noqa: PLC0415

        scale = p[name + "_scale"].astype(dtype)
        lo, hi = nibble_views(p[name])
        h = x.shape[-1] // 2
        return jnp.einsum(spec, x[..., :h], lo.astype(dtype) * scale) + jnp.einsum(
            spec, x[..., h:], hi.astype(dtype) * scale
        )

    def _qkv(self, p, a_in):
        """[B, S, E] -> q, k, v [B, H, S, D] (shared by train/prefill/decode)."""
        q = self._einsum_w(p, "wq", "bse,ehd->bhsd", a_in)
        k = self._einsum_w(p, "wk", "bse,ehd->bhsd", a_in)
        v = self._einsum_w(p, "wv", "bse,ehd->bhsd", a_in)
        return q, k, v

    def _qkv_packed(self, p, a_in):
        """[B, S, E] -> packed q, k, v [B, S, H*D]: the matmuls' natural
        output layout — no head transpose is ever materialized (the
        packed kernels slice head columns in their BlockSpecs; see
        ops/attention_packed.py). Training-path only (unquantized)."""
        e = a_in.shape[-1]

        def proj(name):
            w = self._w(p, name)  # [E, H, D]
            return jnp.einsum("bse,ef->bsf", a_in, w.reshape(e, -1))

        return proj("wq"), proj("wk"), proj("wv")

    def _attn_out_packed(self, p, a):
        """Packed attention output [B, S, H*D] -> [B, S, E] projection —
        a plain matmul (the bhsd,hde->bse einsum's transpose never
        exists)."""
        dtype = self.cfg.policy.compute_dtype
        w = self._w(p, "wo")  # [H, D, E]
        return jnp.einsum(
            "bsf,fe->bse", a, w.reshape(-1, w.shape[-1])
        ) + p["o_b"].astype(dtype)

    def _attn_out(self, p, a):
        dtype = self.cfg.policy.compute_dtype
        return self._einsum_w(p, "wo", "bhsd,hde->bse", a) + p["o_b"].astype(
            dtype
        )

    def _mlp(self, p, m_in):
        dtype = self.cfg.policy.compute_dtype
        act = getattr(jax.nn, self.cfg.activation)
        hdn = act(
            self._einsum_w(p, "w_mlp1", "bse,ei->bsi", m_in)
            + p["b_mlp1"].astype(dtype)
        )
        return self._einsum_w(p, "w_mlp2", "bsi,ie->bse", hdn) + p[
            "b_mlp2"
        ].astype(dtype)

    def _w_out(self, params):
        """Dequantized output projection [E, V] in compute dtype.

        Materializes the int4 unpack (cheap concat of the two nibble
        views) — use only in one-shot contexts (forward/prefill); the
        per-token decode path streams the packed form via _last_logits."""
        dtype = self.cfg.policy.compute_dtype
        w = params["w_out"]
        if params.get("w_out_int4") is not None:
            from dalle_mtf_tpu.quantize import unpack_int4  # noqa: PLC0415

            w = unpack_int4(w, 0)
        w = w.astype(dtype)
        scale = params.get("w_out_scale")
        if scale is not None:
            w = w * scale.astype(dtype)
        return w

    def _last_logits(self, params, x_last, band: tuple[int, int] | None = None):
        """[B, E] final-LN'd hidden -> fp32 logits [B, vocab].

        w_out streams in its quantized/compute dtype — at dalle_coco scale
        it is ~26% of the per-token decode weight stream, and the fp32
        master form this once used doubled that slice. Matmul accumulates
        fp32 (preferred_element_type), matching forward()'s logits path.

        With ``band=(lo, hi)`` only vocab columns [lo, hi) are computed
        (returns [B, hi-lo]). Image decoding only ever samples the
        image-token band — every other column is band-masked to -inf by
        the samplers — so the banded head is EXACT, and it shrinks the
        head matvec from total_tokens (~50k) columns to image_vocab_size
        (512 at dalle_coco scale). The column slices are loop-invariant,
        so XLA hoists them out of the decode scan: per token only the
        [E, hi-lo] slice streams, and the 50k-wide sampling reductions
        (band add, approx_max_k, argmax, categorical) collapse to 512."""
        dtype = self.cfg.policy.compute_dtype
        w = params["w_out"]
        w_scale = params.get("w_out_scale")
        b_out = params["b_out"]
        if band is not None:
            w = w[:, band[0]:band[1]]
            if w_scale is not None:
                w_scale = w_scale[:, band[0]:band[1]]
            b_out = b_out[band[0]:band[1]]
        if w_scale is not None and self._streaming_eligible(
            x_last.shape[0], x_last.shape[1]
        ):
            from dalle_mtf_tpu.ops import decode_matmul as dmm  # noqa: PLC0415

            x16 = x_last.astype(jnp.bfloat16)
            if params.get("w_out_int4") is not None:
                h = x16.shape[-1] // 2
                logits = dmm.int4_matmul(
                    x16[:, :h], x16[:, h:], w, w_scale
                )
            else:
                logits = dmm.int8_matmul(x16, w, w_scale)
            return logits + b_out
        if params.get("w_out_int4") is not None:
            from dalle_mtf_tpu.quantize import nibble_views  # noqa: PLC0415

            scale = w_scale.astype(dtype)
            lo, hi = nibble_views(w)
            h = x_last.shape[-1] // 2
            x16 = x_last.astype(dtype)
            return (
                jnp.einsum(
                    "be,ev->bv", x16[:, :h], lo.astype(dtype) * scale,
                    preferred_element_type=jnp.float32,
                )
                + jnp.einsum(
                    "be,ev->bv", x16[:, h:], hi.astype(dtype) * scale,
                    preferred_element_type=jnp.float32,
                )
                + b_out
            )
        wd = w.astype(dtype)
        if w_scale is not None:  # int8: scale multiply fuses into the read
            wd = wd * w_scale.astype(dtype)
        return (
            jnp.einsum(
                "be,ev->bv", x_last.astype(dtype), wd,
                preferred_element_type=jnp.float32,
            )
            + b_out
        )

    def _block(self, p, x, rng, train: bool, constrain):
        """One pre-LN transformer block (reference models.py:326-335)."""
        cfg = self.cfg
        dtype = cfg.policy.compute_dtype
        b, s, e = x.shape
        h, d = cfg.n_heads, cfg.head_dim
        r_attn, r_res1, r_res2 = jax.random.split(rng, 3)

        from jax.ad_checkpoint import checkpoint_name  # noqa: PLC0415

        # --- attention
        a_in = self._layer_norm(x, p["ln1_g"], p["ln1_b"])
        window = self._window
        drop = cfg.attention_dropout if train else 0.0
        use_packed = (
            cfg.attn_packed
            and not self._is_ring
            and p.get("wq_scale") is None
            and p.get("wq_int4") is None
        )
        if use_packed:
            # packed layout: q/k/v/out stay [B, S, H*D] end to end — the
            # head axis exists only inside the kernels' BlockSpecs. The
            # last dim is the heads dim contiguously grouped, so the TP
            # heads rule shards it identically to the [B,H,S,D] form.
            from dalle_mtf_tpu.ops.attention_packed import (  # noqa: PLC0415
                causal_attention_packed,
            )

            q, k, v = (
                checkpoint_name(t, "qkv") for t in self._qkv_packed(p, a_in)
            )
            q, k, v = (constrain(t, BATCH, SEQ, HEADS) for t in (q, k, v))
            a = causal_attention_packed(
                q, k, v, h, window=window,
                dropout_rate=drop,
                dropout_rng=r_attn if drop > 0.0 else None,
                # DP/TP mesh axes: Mosaic kernels cannot be GSPMD-auto-
                # partitioned, so the kernel shard_maps over these when the
                # ambient mesh actually shards them (attention_packed.py)
                batch_axis=cfg.ring_batch_axis,
                heads_axis=cfg.ring_heads_axis,
            )
            a = constrain(a, BATCH, SEQ, HEADS)
            a = checkpoint_name(self._attn_out_packed(p, a), "attn_proj")
            return self._block_tail(p, x, a, r_res1, r_res2, train, constrain)
        q, k, v = (checkpoint_name(t, "qkv") for t in self._qkv(p, a_in))
        q, k, v = (constrain(t, BATCH, HEADS, SEQ, KV) for t in (q, k, v))
        if self._is_ring:
            # sequence-parallel attention: k/v shards rotate over the mesh
            # axis mapped by the total_seq_dim layout rule (ICI ppermute
            # ring); identical math to global attention, so sampling and
            # single-device eval fall back to the fused kernel. The local
            # window ("local_ring") and attention-weight hash dropout both
            # ride the ring's global coordinates, so SP composes with every
            # attention mode (mtf attention took dropout_rate in all modes,
            # models.py:294-299).
            from dalle_mtf_tpu.ops.ring_attention import (  # noqa: PLC0415
                ring_attention_auto,
            )

            a = ring_attention_auto(
                q, k, v,
                seq_axis=cfg.ring_seq_axis,
                batch_axis=cfg.ring_batch_axis,
                heads_axis=cfg.ring_heads_axis,
                window=window,
                dropout_rate=drop,
                dropout_rng=r_attn if drop > 0.0 else None,
            )
        elif drop > 0.0:
            # attention-weight dropout (mtf attention's dropout_rate arg,
            # models.py:294-299). causal_attention runs it INSIDE the wedge
            # kernel via a coordinate-hash keep mask — no [S, S] tensor —
            # and falls back to the dense XLA path beyond the wedge regime,
            # for head_dim not a lane multiple, or off-TPU. The _tp entry
            # shard_maps the kernel over DP/TP mesh axes when the ambient
            # mesh shards them (Mosaic can't be GSPMD-auto-partitioned).
            a = causal_attention_tp(
                q, k, v, window=window,
                dropout_rate=drop, dropout_rng=r_attn,
                batch_axis=cfg.ring_batch_axis,
                heads_axis=cfg.ring_heads_axis,
            )
        else:
            a = causal_attention_tp(
                q, k, v, window=window,
                batch_axis=cfg.ring_batch_axis,
                heads_axis=cfg.ring_heads_axis,
            )
        a = constrain(a, BATCH, HEADS, SEQ, KV)
        a = checkpoint_name(self._attn_out(p, a), "attn_proj")
        return self._block_tail(p, x, a, r_res1, r_res2, train, constrain)

    def _block_tail(self, p, x, a, r_res1, r_res2, train, constrain):
        """Residual add + LN2 + MLP + dropouts — shared by every attention
        arm (packed / unpacked / ring), so the tails can't diverge."""
        cfg = self.cfg
        from jax.ad_checkpoint import checkpoint_name  # noqa: PLC0415

        a = self._dropout(r_res1, a, cfg.residual_dropout, train)
        x = x + a
        x = constrain(x, BATCH, SEQ, EMBED)

        # --- mlp (4x expansion, relu — reference models.py:317-333)
        m_in = self._layer_norm(x, p["ln2_g"], p["ln2_b"])
        m = checkpoint_name(self._mlp(p, m_in), "mlp2")
        m = self._dropout(r_res2, m, cfg.residual_dropout, train)
        x = x + m
        return constrain(x, BATCH, SEQ, EMBED)

    # --------------------------------------------------------------- forward

    def hidden(
        self,
        params,
        tokens: jax.Array,
        rng: jax.Array | None = None,
        train: bool = False,
        constrain: Callable | None = None,
    ) -> jax.Array:
        """tokens [B, S] int32 -> final-LN hidden states [B, S, E]
        (compute dtype)."""
        cfg = self.cfg
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if constrain is None:
            constrain = lambda x, *axes: x  # noqa: E731
        dtype = cfg.policy.compute_dtype
        s = tokens.shape[1]

        x = params["wte"].astype(dtype)[tokens]
        x = x + params["wpe"].astype(dtype)[:s]
        r_embed, r_layers = jax.random.split(rng)
        x = self._dropout(r_embed, x, cfg.embed_dropout, train)
        x = constrain(x, BATCH, SEQ, EMBED)

        layer_rngs = jax.random.split(r_layers, cfg.n_layers)

        def body(x_, scanned):
            p, r = scanned
            return self._block(p, x_, r, train, constrain), None

        if cfg.recompute_grad and train:
            named = {
                # save projection outputs but recompute the 4x-wide mlp1
                # hidden (the single biggest residual: [L, B, S, 4E]) — one
                # cheap matmul+relu re-run buys ~40% of the remat memory back
                "dots_except_mlp1": ("qkv", "attn_proj", "mlp2"),
                # ...plus the attention kernel's own outputs, so the flash
                # forward is never re-run inside the backward pass (dot-based
                # policies can't see inside a pallas_call)
                "save_attn": ("qkv", "attn_out", "attn_lse", "attn_proj",
                              "mlp2"),
                # lowest memory short of full recompute: re-run the qkv/out
                # projections and mlp1, keep only the attention kernel's
                # outputs and mlp2
                "save_attn_lean": ("attn_out", "attn_lse", "mlp2"),
            }
            if cfg.remat_policy in named:
                policy = jax.checkpoint_policies.save_only_these_names(
                    *named[cfg.remat_policy]
                )
            elif cfg.remat_policy == "dots_and_attn":
                # dots_saveable PLUS the attention kernel's out/lse: every
                # matmul residual kept (incl. the mlp1 hidden that made
                # plain save_attn lose, BENCH.md remat study) AND the flash
                # forward never re-runs in backward. Costs ~1.7 GB extra
                # residuals at dalle_coco/batch-18 scale — affordable after
                # the loss-head fp32-materialization fix freed 4.7 GB.
                policy = jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_saveable,
                    jax.checkpoint_policies.save_only_these_names(
                        "attn_out", "attn_lse"
                    ),
                )
            else:
                policy = getattr(jax.checkpoint_policies, cfg.remat_policy)
            body = jax.checkpoint(body, policy=policy)

        pipe_mesh = self._pipe_mesh()
        if pipe_mesh is not None:
            from dalle_mtf_tpu.parallel.pipeline import (  # noqa: PLC0415
                pipeline_hidden,
            )

            x = pipeline_hidden(
                body, params["layers"], layer_rngs, x, pipe_mesh,
                cfg.pipe_axis, cfg.pipeline_microbatches,
                scan_unroll=cfg.scan_unroll,
            )
            # The loss head (final LN + the [B, S, 50k] logits matmul +
            # xent) would otherwise run GSPMD-replicated over the pipe axis
            # — P× repeated work, ~15% of the step. Re-sharding the batch
            # rows over (data, pipe) here makes every downstream head op
            # compute each row exactly once across the pipe group (the
            # reference computed its loss once, models.py:391-416); the
            # per-position losses are tiny, so whatever gather the caller's
            # mean/slicing needs afterwards is noise.
            x = self._shard_head_rows(x, pipe_mesh)
        else:
            x, _ = jax.lax.scan(
                body, x, (params["layers"], layer_rngs),
                unroll=cfg.scan_unroll,
            )

        return self._layer_norm(x, params["lnf_g"], params["lnf_b"])

    def _shard_head_rows(self, x, mesh):
        """Constrain [B, S, E] batch rows over (batch_axis, pipe_axis) so
        the loss head is computed once per row across the pipe group instead
        of replicated P times. Skipped — with a logged warning, since it
        costs a silent P× on ~15% of the step — if B doesn't divide."""
        from jax.sharding import NamedSharding, PartitionSpec  # noqa: PLC0415

        cfg = self.cfg
        axes = []
        if cfg.ring_batch_axis and cfg.ring_batch_axis in mesh.axis_names:
            axes.append(cfg.ring_batch_axis)
        axes.append(cfg.pipe_axis)
        total = 1
        for a in axes:
            total *= mesh.shape[a]
        if x.shape[0] % total != 0:
            import logging  # noqa: PLC0415

            logging.getLogger("dalle_mtf_tpu").warning(
                "pipeline head: batch %d does not divide the (%s) group "
                "size %d — the loss head will run pipe-REPLICATED (%dx "
                "repeated work on ~15%% of the step). Pad the batch to a "
                "multiple of %d to shard it.",
                x.shape[0], ",".join(axes), total, mesh.shape[cfg.pipe_axis],
                total,
            )
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec(tuple(axes)))
        )

    def _pipe_mesh(self):
        """The ambient mesh when pipeline parallelism is active (a
        ``layers:<axis>`` layout rule names an in-scope mesh axis of size
        > 1 dividing n_layers), else None."""
        cfg = self.cfg
        if not cfg.pipe_axis:
            return None
        from dalle_mtf_tpu.ops.ring_attention import ambient_mesh  # noqa: PLC0415

        mesh = ambient_mesh()
        if (
            mesh is None
            or cfg.pipe_axis not in mesh.axis_names
            or mesh.shape[cfg.pipe_axis] == 1
        ):
            return None
        n_pipe = mesh.shape[cfg.pipe_axis]
        if cfg.n_layers % n_pipe != 0:
            raise ValueError(
                f"pipeline: n_layers {cfg.n_layers} not divisible by "
                f"{cfg.pipe_axis!r} axis size {n_pipe}"
            )
        return mesh

    def forward(
        self,
        params,
        tokens: jax.Array,
        rng: jax.Array | None = None,
        train: bool = False,
        constrain: Callable | None = None,
    ) -> jax.Array:
        """tokens [B, S] int32 -> logits [B, S, total_tokens] fp32."""
        x = self.hidden(params, tokens, rng, train, constrain)
        # bf16 inputs, fp32 accumulate + fp32 logits out: the reference also
        # computes to_logits in the activation dtype and casts the *result*
        # to fp32 (models.py:391-395) — an fp32 matmul here costs ~4x on the
        # MXU for no accuracy the xent can use.
        logits = jnp.einsum(
            "bse,ev->bsv", x, self._w_out(params),
            preferred_element_type=jnp.float32,
        )
        return logits + params["b_out"]

    def loss(
        self,
        params,
        tokens: jax.Array,
        rng: jax.Array | None = None,
        train: bool = True,
        constrain: Callable | None = None,
        z_loss: float = 0.0,
        fused_xent: bool = False,
    ):
        """Next-token xent, labels = shift-left(tokens) + EOS appended
        (reference models.py:397-416). Returns (scalar mean loss fp32,
        per-position loss [B, S]).

        With ``fused_xent`` the [B, S, vocab] logits tensor is never
        materialized — the loss streams over row chunks (ops/xent_fused.py),
        saving ~8 GB of HBM residuals at dalle_coco scale. Off by default:
        on v5e the streamed dw accumulation costs ~12% step time at the
        default batch; enable it (config key "fused_xent") when the model is
        memory-bound instead."""
        cfg = self.cfg
        labels = self.shifted_labels(tokens)

        if fused_xent:
            from dalle_mtf_tpu.ops.xent_fused import (  # noqa: PLC0415
                chunked_softmax_xent_auto,
            )

            x = self.hidden(params, tokens, rng, train, constrain)
            b_, s_, e_ = x.shape
            n = b_ * s_
            num_chunks = next(
                c for c in (cfg.xent_chunks, 8, 4, 2, 1) if n % c == 0
            )
            loss_flat = chunked_softmax_xent_auto(
                x.reshape(n, e_),
                self._w_out(params),
                params["b_out"],
                labels.reshape(n),
                z_loss,
                num_chunks,
                vocab_axis=cfg.vocab_axis,
            )
            loss_batch = loss_flat.reshape(b_, s_)
        else:
            # Activation-dtype (bf16) logits into the xent, which upcasts
            # to fp32 internally — the reference's exact to_logits-then-cast
            # semantics (models.py:391-395: the final linear runs in the
            # activation dtype; the fp32 cast happens on its *result*, so
            # the reference's "fp32 logits" carry bf16-representable
            # values). Halves every HBM pass over the [B, S, 50k] logits:
            # measured -6.2 ms/step at the bench shape (BENCH.md r3 head
            # study). forward() keeps its public fp32-logits contract for
            # eval/sampling parity checks.
            x = self.hidden(params, tokens, rng, train, constrain)
            # bias add in the activation dtype too — the fp32 b_out would
            # otherwise promote the materialized [B, S, V] tensor right
            # back to fp32, undoing the halved HBM passes (and the
            # reference's to_logits bias add runs in the activation dtype,
            # models.py:391-395). _head_matmul_bias is that einsum + add
            # with a custom backward that computes dw and db in one pass
            # over the logits cotangent (see its docstring).
            logits = _head_matmul_bias(
                x, self._w_out(params), params["b_out"]
            )
            loss_batch = softmax_cross_entropy_with_logits(logits, labels, z_loss)
        return loss_batch.mean(), loss_batch

    def fused_eval(
        self,
        params,
        tokens: jax.Array,
        rng: jax.Array | None = None,
        constrain: Callable | None = None,
        z_loss: float = 0.0,
    ):
        """Eval under ``fused_xent``: per-position loss AND argmax
        correctness, streamed over row chunks so the [B, S, vocab] logits
        never materialize (ops/xent_fused.py::chunked_xent_eval_auto). Keeps
        the fused configs' eval metric schema identical to the dense path
        (reference eval metric_fn, model_fns_tf.py:80-96). Returns
        (loss [B, S] f32, correct [B, S] f32). No gradients — eval only."""
        cfg = self.cfg
        labels = self.shifted_labels(tokens)
        from dalle_mtf_tpu.ops.xent_fused import (  # noqa: PLC0415
            chunked_xent_eval_auto,
        )

        x = self.hidden(params, tokens, rng, train=False, constrain=constrain)
        b_, s_, e_ = x.shape
        n = b_ * s_
        num_chunks = next(
            c for c in (cfg.xent_chunks, 8, 4, 2, 1) if n % c == 0
        )
        loss_flat, correct_flat = chunked_xent_eval_auto(
            x.reshape(n, e_),
            self._w_out(params),
            params["b_out"],
            labels.reshape(n),
            z_loss,
            num_chunks,
            vocab_axis=cfg.vocab_axis,
        )
        return loss_flat.reshape(b_, s_), correct_flat.reshape(b_, s_)

    def shifted_labels(self, tokens: jax.Array) -> jax.Array:
        """Next-token targets: tokens shifted left with EOS appended
        (reference's pad+gather label construction, models.py:397-416)."""
        eos_col = jnp.full((tokens.shape[0], 1), self.cfg.eos, tokens.dtype)
        return jnp.concatenate([tokens[:, 1:], eos_col], axis=1)

    # --------------------------------------------------------- KV-cache path

    def init_cache(self, batch: int, max_len: int | None = None) -> dict:
        cfg = self.cfg
        s = max_len or cfg.total_seq_len
        shape = (cfg.n_layers, batch, cfg.n_heads, s, cfg.head_dim)
        dtype = cfg.policy.compute_dtype
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}

    def prefill(
        self, params, tokens: jax.Array, cache: dict,
        band: tuple[int, int] | None = None,
    ) -> tuple[jax.Array, dict]:
        """Run the prompt through the model, filling cache[:, :, :S].

        Returns (logits at the last position [B, vocab] fp32, cache —
        [B, hi-lo] when ``band=(lo, hi)``, see _last_logits).
        Delegates to prefill_rows with a constant all-rows mask (XLA folds
        the constant-true select; one prompt-pass body to maintain).
        """
        return self.prefill_rows(
            params, tokens, cache, jnp.ones((tokens.shape[0],), bool),
            band=band,
        )

    def _decode_step_impl(
        self, params, cache: dict, token, pos_embed_idx, write, pos_b,
        band: tuple[int, int] | None = None,
    ) -> tuple[jax.Array, dict]:
        """Shared one-token decode body: ``write(cache_all, new, layer)``
        scatters the step's k/v into the STACKED [L, B, H, S, D] cache at
        ``layer`` (uniform slice or per-row — the ONLY thing that differs
        between decode_step and decode_step_rows), ``pos_b`` is the
        attention-mask position (scalar or [B,1,1,1]).

        The stacked caches ride the layer scan as CARRY, not xs/ys: the
        xs/ys form made XLA unstack both 63 MB caches into per-layer
        copies and DUS-restack them into a fresh stacked buffer EVERY
        token (~250 MB/token of pure copy traffic, 23% of decode time —
        the slice_bitcast/DUS fusions in the decode profile). As carry,
        the per-token write is a tiny in-place DUS at the layer offset
        and attention's cache read fuses into its matmul operands."""
        cfg = self.cfg
        dtype = cfg.policy.compute_dtype
        x = params["wte"].astype(dtype)[token]  # [B, E]
        # position embedding: reference gathers wpe at context.position - 1 in
        # incremental mode (models.py:212-213) where position is 1-indexed;
        # ours is 0-indexed.
        x = x + params["wpe"].astype(dtype)[pos_embed_idx]
        x = x[:, None, :]  # [B, 1, E]

        def body(carry, scanned):
            x_, k_all, v_all = carry
            p, layer = scanned
            a_in = self._layer_norm(x_, p["ln1_g"], p["ln1_b"])
            q, k_new, v_new = self._qkv(p, a_in)
            k_all = write(k_all, k_new.astype(k_all.dtype), layer)
            v_all = write(v_all, v_new.astype(v_all.dtype), layer)
            k_cache = jax.lax.squeeze(
                jax.lax.dynamic_slice_in_dim(k_all, layer, 1, axis=0), (0,)
            )
            v_cache = jax.lax.squeeze(
                jax.lax.dynamic_slice_in_dim(v_all, layer, 1, axis=0), (0,)
            )
            a = decode_attention(
                q, k_cache, v_cache, pos_b, window=self._window
            )
            x_ = x_ + self._attn_out(p, a)
            m_in = self._layer_norm(x_, p["ln2_g"], p["ln2_b"])
            x_ = x_ + self._mlp(p, m_in)
            return (x_, k_all, v_all), None

        (x, new_k, new_v), _ = jax.lax.scan(
            body, (x, cache["k"], cache["v"]),
            (params["layers"], jnp.arange(cfg.n_layers)),
            unroll=_decode_unroll(cfg.n_layers),
        )
        cache = {"k": new_k, "v": new_v}
        x = self._layer_norm(x[:, 0], params["lnf_g"], params["lnf_b"])
        return self._last_logits(params, x, band), cache

    def decode_step(
        self, params, cache: dict, token: jax.Array, position: jax.Array,
        band: tuple[int, int] | None = None,
    ) -> tuple[jax.Array, dict]:
        """One incremental step: token [B] at ``position`` -> logits [B, vocab]
        ([B, hi-lo] when ``band=(lo, hi)`` — see _last_logits).

        Completes the reference's unfinished incremental-inference path
        (one-hot scatter into cached k/v, models.py:246-254 — here a
        dynamic_update_slice, which XLA lowers to an in-place DMA).
        """

        def write(c, n, layer):  # all rows at one position: one plain DUS
            return jax.lax.dynamic_update_slice(
                c, n[None], (layer, 0, 0, position, 0)
            )

        return self._decode_step_impl(
            params, cache, token, position, write, position, band
        )

    # ------------------------------------------- per-row (continuous) decode

    def decode_step_rows(
        self, params, cache: dict, token: jax.Array, positions: jax.Array,
        band: tuple[int, int] | None = None,
    ) -> tuple[jax.Array, dict]:
        """``decode_step`` with a PER-ROW position vector: token [B] where
        row b sits at ``positions[b]`` -> logits [B, vocab].

        This is what continuous batching needs — slots in one batch decode
        at different depths (a request admitted mid-flight starts at the
        text boundary while its neighbors are deep into the image region).
        The cache write is a per-row dynamic_update_slice (vmapped over the
        batch); the attention mask broadcasts the position vector.
        Identical math to ``decode_step`` when all positions agree (the
        greedy-equivalence tests pin that) — both share _decode_step_impl.
        """
        row_write = jax.vmap(
            # [L,H,S,D], [H,1,D], pos, layer -> per-row DUS at its own
            # position inside the row's layer slice of the stacked cache
            lambda c, n, p, l: jax.lax.dynamic_update_slice(
                c, n[None], (l, 0, p, 0)
            ),
            in_axes=(1, 0, 0, None), out_axes=1,
        )
        return self._decode_step_impl(
            params, cache, token, positions,
            lambda c, n, layer: row_write(c, n, positions, layer),
            positions[:, None, None, None],
            band,
        )

    def prefill_rows(
        self, params, tokens: jax.Array, cache: dict, row_mask: jax.Array,
        band: tuple[int, int] | None = None,
    ) -> tuple[jax.Array, dict]:
        """``prefill`` that only takes effect on ``row_mask`` rows.

        Continuous batching admits new requests into free slots of a live
        batch: the prompt pass runs for the full (fixed-shape) batch — one
        executable, no recompiles — but the cache merge keeps the occupied
        rows' k/v untouched. Returns (last-position logits [B, vocab] fp32
        — meaningful only on masked rows, callers merge; merged cache).
        """
        cfg = self.cfg
        dtype = cfg.policy.compute_dtype
        t = tokens.shape[1]
        x = params["wte"].astype(dtype)[tokens] + params["wpe"].astype(dtype)[:t]

        def body(x_, scanned):
            (p,) = scanned
            a_in = self._layer_norm(x_, p["ln1_g"], p["ln1_b"])
            q, k, v = self._qkv(p, a_in)
            a = causal_attention_tp(
                q, k, v, window=self._window,
                batch_axis=cfg.ring_batch_axis,
                heads_axis=cfg.ring_heads_axis,
            )
            x_ = x_ + self._attn_out(p, a)
            m_in = self._layer_norm(x_, p["ln2_g"], p["ln2_b"])
            x_ = x_ + self._mlp(p, m_in)
            return x_, (k, v)

        x, (ks, vs) = jax.lax.scan(body, x, (params["layers"],))
        m = row_mask[None, :, None, None, None]  # over [L, B, H, t, D]
        old_k = cache["k"][:, :, :, :t, :]
        old_v = cache["v"][:, :, :, :t, :]
        cache = {
            "k": jax.lax.dynamic_update_slice(
                cache["k"],
                jnp.where(m, ks.astype(cache["k"].dtype), old_k),
                (0, 0, 0, 0, 0),
            ),
            "v": jax.lax.dynamic_update_slice(
                cache["v"],
                jnp.where(m, vs.astype(cache["v"].dtype), old_v),
                (0, 0, 0, 0, 0),
            ),
        }
        x = self._layer_norm(x, params["lnf_g"], params["lnf_b"])
        return self._last_logits(params, x[:, -1], band), cache
