"""Discrete (Gumbel-softmax) VQ-VAE — stage 1 of the two-stage pipeline.

Re-implements the capability of the reference's production TF VAE
(src/vae_tf/models.py:46-184): ``convblocks = [(stack, channels), ...]`` where
each block is a 4x4/stride-2 downsample conv followed by ``stack-1`` residual
{3x3 conv → relu → 3x3 conv} blocks; a shared fp32 codebook variable
[n_hid, num_tokens] used by a matmul in the encoder and its transpose in the
decoder (models.py:111-127); a mirrored transpose-conv decoder with a final
1x1 conv (models.py:123-163); optional space_to_depth/depth_to_space by
``stack_factor`` (models.py:84-86, 155-162); bf16 autocast boundaries around
the conv stacks with the codebook matmul kept fp32 (models.py:82-83,115-116);
and per-residual-block activation recompute (models.py:8-43 → here a plain
``jax.checkpoint``).

Configs using the mtf-variant schema (``num_layers``/``hidden_dim``, reference
src/dalle_mtf/models.py:54-65) are mapped onto the same machinery as
stack-of-1 convblocks.

Everything is functional: ``init(rng) -> params`` pytree, pure ``apply``
methods, a parallel ``logical_axes()`` pytree for sharding.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp

from dalle_mtf_tpu.ops.gumbel import gumbel_softmax
from dalle_mtf_tpu.ops.losses import mse_loss
from dalle_mtf_tpu.utils.precision import Policy, get_policy

# Logical dimension names (mapped to mesh axes by the config "layout" string).
KH, KW, CIN, COUT = "conv_kh", "conv_kw", "conv_cin", "conv_cout"
HID, TOK = "vae_hid_dim", "tokens_dim"


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    num_tokens: int
    image_size: int
    convblocks: tuple[tuple[int, int], ...]
    n_channels: int = 3
    stack_factor: int = 1
    recompute_grad: bool = False
    use_bf16: bool = False

    @classmethod
    def from_params(cls, params: Mapping[str, Any]) -> "VAEConfig":
        """Build from a reference-schema JSON config (configs/vae_*.json)."""
        convblocks = params.get("convblocks")
        if convblocks:
            convblocks = tuple((int(s), int(c)) for s, c in convblocks)
        else:
            # mtf-variant schema: num_layers stride-2 convs at hidden_dim
            # (reference dalle_mtf/models.py:54-65).
            n = params.get("num_layers") or 3
            hid = params.get("hidden_dim") or 64
            convblocks = tuple((1, hid) for _ in range(n))
        stack_factor = params.get("stack_factor") or 1
        return cls(
            num_tokens=params.get("num_tokens"),
            image_size=params["dataset"]["image_size"],
            convblocks=convblocks,
            n_channels=params.get("n_channels") or 3,
            stack_factor=stack_factor,
            recompute_grad=bool(params.get("recompute_grad")),
            use_bf16=bool(params.get("use_bf16") or params.get("bf_16")),
        )

    @property
    def n_hid(self) -> int:
        return self.convblocks[-1][1]

    @property
    def grid_size(self) -> int:
        """Side length of the latent token grid."""
        return self.image_size // (2 ** len(self.convblocks)) // self.stack_factor

    @property
    def image_seq_len(self) -> int:
        """Tokens per image — (H / 2^blocks)^2 / stack_factor^2
        (reference model_fns.py:68)."""
        return self.grid_size ** 2

    @property
    def policy(self) -> Policy:
        return get_policy(self.use_bf16)


def _conv_init(rng, kh, kw, cin, cout):
    # TF1 tf.layers.conv2d default: glorot_uniform kernel, zero bias
    # (vae_tf/models.py:70-71 uses the defaults).
    w = jax.nn.initializers.glorot_uniform()(rng, (kh, kw, cin, cout), jnp.float32)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _conv_axes(_kh, _kw, _cin, _cout):
    return {"w": (KH, KW, CIN, COUT), "b": (COUT,)}


def _conv(x, p, stride=1, compute_dtype=None):
    dtype = compute_dtype or x.dtype
    out = jax.lax.conv_general_dilated(
        x.astype(dtype),
        p["w"].astype(dtype),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(dtype)


def _conv_transpose(x, p, stride=2, compute_dtype=None):
    dtype = compute_dtype or x.dtype
    out = jax.lax.conv_transpose(
        x.astype(dtype),
        p["w"].astype(dtype),
        strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(dtype)


def space_to_depth(x, factor: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


def depth_to_space(x, factor: int):
    b, h, w, c = x.shape
    c_out = c // (factor * factor)
    x = x.reshape(b, h, w, factor, factor, c_out)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * factor, w * factor, c_out)


class DiscreteVAE:
    def __init__(self, config: VAEConfig):
        self.cfg = config

    # ------------------------------------------------------------------ init

    def init(self, rng: jax.Array) -> dict:
        cfg = self.cfg
        rngs = iter(jax.random.split(rng, 1024))
        enc: dict = {}
        cin = cfg.n_channels * cfg.stack_factor ** 2
        for b, (stack, channels) in enumerate(cfg.convblocks):
            blk = {"down": _conv_init(next(rngs), 4, 4, cin, channels)}
            for i in range(1, stack):
                blk[f"res_{i}"] = {
                    "conv_in": _conv_init(next(rngs), 3, 3, channels, channels),
                    "conv_out": _conv_init(next(rngs), 3, 3, channels, channels),
                }
            enc[f"block_{b}"] = blk
            cin = channels

        n_hid = cfg.n_hid
        codebook = jax.nn.initializers.glorot_uniform()(
            next(rngs), (n_hid, cfg.num_tokens), jnp.float32
        )

        dec: dict = {}
        cin = n_hid
        for b, (stack, channels) in enumerate(reversed(cfg.convblocks)):
            blk = {"up": _conv_init(next(rngs), 4, 4, cin, channels)}
            for i in range(1, stack):
                blk[f"res_{i}"] = {
                    "conv_in": _conv_init(next(rngs), 3, 3, channels, channels),
                    "conv_out": _conv_init(next(rngs), 3, 3, channels, channels),
                }
            dec[f"block_{b}"] = blk
            cin = channels
        dec["final"] = _conv_init(
            next(rngs), 1, 1, cin, cfg.n_channels * cfg.stack_factor ** 2
        )
        return {"encoder": enc, "codebook": codebook, "decoder": dec}

    def logical_axes(self) -> dict:
        """Pytree matching init()'s output with logical dim-name tuples."""
        cfg = self.cfg
        enc: dict = {}
        for b, (stack, _c) in enumerate(cfg.convblocks):
            blk = {"down": _conv_axes(4, 4, 0, 0)}
            for i in range(1, stack):
                blk[f"res_{i}"] = {
                    "conv_in": _conv_axes(3, 3, 0, 0),
                    "conv_out": _conv_axes(3, 3, 0, 0),
                }
            enc[f"block_{b}"] = blk
        dec: dict = {}
        for b, (stack, _c) in enumerate(reversed(cfg.convblocks)):
            blk = {"up": _conv_axes(4, 4, 0, 0)}
            for i in range(1, stack):
                blk[f"res_{i}"] = {
                    "conv_in": _conv_axes(3, 3, 0, 0),
                    "conv_out": _conv_axes(3, 3, 0, 0),
                }
            dec[f"block_{b}"] = blk
        dec["final"] = _conv_axes(1, 1, 0, 0)
        return {"encoder": enc, "codebook": (HID, TOK), "decoder": dec}

    # --------------------------------------------------------------- encoder

    def _res_block(self, p, x, compute_dtype, train: bool):
        def fn(x_):
            out = _conv(x_, p["conv_in"], 1, compute_dtype)
            out = jax.nn.relu(out)
            out = _conv(out, p["conv_out"], 1, compute_dtype)
            return out

        if self.cfg.recompute_grad and train:
            fn = jax.checkpoint(fn)
        return x + fn(x)

    def _encode_conv(self, params, img, train: bool = False) -> jax.Array:
        """Conv trunk of the encoder: image [B, H, W, C] in [-1, 1] ->
        pre-codebook features [B, h, w, n_hid] (fp32)."""
        cfg = self.cfg
        dtype = cfg.policy.compute_dtype
        x = img.astype(dtype)
        if cfg.stack_factor > 1:
            x = space_to_depth(x, cfg.stack_factor)
        for b, (stack, _channels) in enumerate(cfg.convblocks):
            blk = params["encoder"][f"block_{b}"]
            x = _conv(x, blk["down"], 2, dtype)
            for i in range(1, stack):
                x = self._res_block(blk[f"res_{i}"], x, dtype, train)
        return x.astype(jnp.float32)

    def encoder(self, params, img, train: bool = False) -> jax.Array:
        """Image [B, H, W, C] in [-1, 1] -> logits [B, h, w, num_tokens].

        Mirrors vae_tf/models.py:81-120 including the fp32 codebook matmul.
        """
        x = self._encode_conv(params, img, train)
        logits = jnp.einsum(
            "bhwc,ct->bhwt", x, params["codebook"],
            preferred_element_type=jnp.float32,
        )
        return logits

    def encoder_features(self, params, img) -> jax.Array:
        """Pooled pre-codebook encoder features [B, n_hid]: the perceptual
        embedding the eval Fréchet-feature-distance metric compares real
        and reconstructed images in (tasks.py). Spatial mean over the
        token grid — the standard pooled-feature form."""
        return self._encode_conv(params, img, train=False).mean(axis=(1, 2))

    # --------------------------------------------------------------- decoder

    def decoder(self, params, one_hot, train: bool = False) -> jax.Array:
        """Token distribution [B, h, w, num_tokens] -> image [B, H, W, C].

        Mirrors vae_tf/models.py:123-163 (codebook^T matmul, mirrored
        transpose-conv stacks, final 1x1 conv, depth_to_space).
        """
        cfg = self.cfg
        x = jnp.einsum(
            "bhwt,ct->bhwc", one_hot.astype(jnp.float32), params["codebook"],
            preferred_element_type=jnp.float32,
        )
        dtype = cfg.policy.compute_dtype
        x = x.astype(dtype)
        for b, (stack, _channels) in enumerate(reversed(cfg.convblocks)):
            blk = params["decoder"][f"block_{b}"]
            x = _conv_transpose(x, blk["up"], 2, dtype)
            for i in range(1, stack):
                x = self._res_block(blk[f"res_{i}"], x, dtype, train)
        x = _conv(x, params["decoder"]["final"], 1, dtype)
        x = x.astype(jnp.float32)
        if cfg.stack_factor > 1:
            x = depth_to_space(x, cfg.stack_factor)
        return x

    # --------------------------------------------------------------- forward

    def forward(
        self,
        params,
        img: jax.Array,
        rng: jax.Array,
        temperature: float | jax.Array = 1.0,
        hard_gumbel: bool = True,
        train: bool = False,
    ):
        """Full autoencode: returns (recon_loss, reconstruction).

        Reconstruction is on the input's [-1, 1] scale (like
        vae_tf/models.py:165-184); callers denormalize for display.
        """
        logits = self.encoder(params, img, train)
        soft_one_hot = gumbel_softmax(
            rng, logits, temperature=temperature, hard=hard_gumbel
        )
        out = self.decoder(params, soft_one_hot, train)
        loss = mse_loss(img.astype(out.dtype), out)
        return loss, out

    # ------------------------------------------------------------- token API

    def encode_tokens(self, params, img: jax.Array) -> jax.Array:
        """Image -> hard token ids [B, image_seq_len] (int32).

        The tokenization DALLE training uses: argmax over encoder logits
        (reference model_fns.py:72-77).
        """
        logits = self.encoder(params, img, train=False)
        tokens = jnp.argmax(logits, axis=-1)
        b = tokens.shape[0]
        return tokens.reshape(b, -1).astype(jnp.int32)

    def decode_tokens(self, params, tokens: jax.Array) -> jax.Array:
        """Token ids [B, image_seq_len] -> images [B, H, W, C] in [0, 1].

        The tokens→pixels path the reference's mtf variant had (with a bug —
        dalle_mtf/models.py:100-111 einsums the raw ids instead of the
        embeddings) and the TF variant lacked entirely. Output is
        denormalized like dalle_mtf/models.py:133.
        """
        g = self.cfg.grid_size
        b = tokens.shape[0]
        one_hot = jax.nn.one_hot(
            tokens.reshape(b, g, g), self.cfg.num_tokens, dtype=jnp.float32
        )
        out = self.decoder(params, one_hot, train=False)
        return (out + 1.0) / 2.0


def temperature_schedule(params: Mapping[str, Any], step: jax.Array) -> jax.Array:
    """Gumbel temperature annealing — exact reference semantics
    (model_fns_tf.py:40-45): linear from temp_start to temp over
    temp_anneal_steps, else constant temp (default 1.0)."""
    anneal_steps = params.get("temp_anneal_steps")
    if anneal_steps:
        frac = jnp.minimum(step.astype(jnp.float32) / anneal_steps, 1.0)
        return params["temp_start"] - frac * (params["temp_start"] - params["temp"])
    temp = params.get("temp")
    return jnp.asarray(1.0 if temp is None else temp, jnp.float32)
