"""Fused LayerNorm (forward + backward) as Pallas TPU kernels.

Why this exists: the reference's layer_norm is plain composed ops
(/root/reference/src/dalle_mtf/models.py:373-389) and mtf/XLA was left to
schedule the backward. In our profiled train step the XLA LN-backward chains
cost ~1.6 ms each — 3-4x the pure HBM traffic of their [B*S, E] operands —
because XLA materializes fp32 intermediates and runs multi-pass VPU
reductions (BENCH.md "Step profile"). A single-pass fused backward reads
x and dy once, writes dx once, and accumulates dg/db in VMEM across the
sequential row-block grid, so it runs at HBM speed.

Semantics match the reference exactly: normalize in fp32, then affine
(y = (x - mean) * rsqrt(var + eps) * g + b), output in x.dtype. The
backward recomputes mean/rstd from x instead of saving them — two row
reductions overlapped with the HBM read are cheaper than plumbing per-row
stats residuals through remat.

Dispatch: Pallas on TPU (or under ``interpret``) when the feature dim is
lane-aligned (E % 128 == 0 — padding lanes would corrupt the mean), XLA
reference otherwise. Wired into the model via ``ln_impl: "pallas"``
(models/dalle.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows per program. 256 rows x E=1024 bf16 = 512 KB/operand block; the
# backward touches x, dy, dx + the [1, E] dg/db accumulators — well under
# the 16 MB VMEM budget even at E=8192 fp32.
_BLOCK_ROWS = 256


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def layer_norm_reference(x, g, b, eps: float = 1e-5):
    """XLA layer norm, fp32 compute — the model's float32 ln_dtype path."""
    xc = x.astype(jnp.float32)
    mean = jnp.mean(xc, axis=-1, keepdims=True)
    var = jnp.var(xc, axis=-1, keepdims=True)
    out = (xc - mean) * jax.lax.rsqrt(var + eps)
    out = out * g.astype(jnp.float32) + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _ln_fwd_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_bwd_kernel(x_ref, dy_ref, g_ref, dx_ref, dg_ref, db_ref, *, eps: float):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)  # [1, E]

    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    xhat = xc * r

    dxhat = dy * g
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (r * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)

    # dg/db accumulate across the sequential grid into one VMEM-resident
    # [1, E] block (every program maps to out block 0; init on the first).
    @pl.when(i == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dg_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)


def _pad_rows(x2d, r_pad: int):
    r = x2d.shape[0]
    if r_pad == r:
        return x2d
    return jnp.pad(x2d, ((0, r_pad - r), (0, 0)))


def _pick_block(r: int) -> int:
    # small-row blocks round to 16, not the fp32 sublane count 8: bf16
    # sublane tiles are (16, 128), so an 8-row block would mis-tile bf16
    # inputs in real Mosaic compilation (ADVICE r3; the small-rows path is
    # otherwise only exercised under interpret=True)
    if r >= _BLOCK_ROWS:
        return _BLOCK_ROWS
    return _round_up(r, 16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln_pallas(x2d, g2d, b2d, eps: float, interpret: bool):
    y, _ = _ln_pallas_fwd(x2d, g2d, b2d, eps, interpret)
    return y


def _ln_pallas_fwd(x2d, g2d, b2d, eps: float, interpret: bool):
    r, e = x2d.shape
    block = _pick_block(r)
    r_pad = _round_up(r, block)
    xp = _pad_rows(x2d, r_pad)
    y = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=(r_pad // block,),
        in_specs=[
            pl.BlockSpec((block, e), lambda i: (i, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, e), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, e), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=9 * r_pad * e,
            bytes_accessed=2 * r_pad * e * x2d.dtype.itemsize,
            transcendentals=r_pad,
        ),
        interpret=interpret,
    )(xp, g2d, b2d)
    if r_pad != r:
        y = y[:r]
    return y, (x2d, g2d)


def _ln_pallas_bwd(eps: float, interpret: bool, res, dy):
    x2d, g2d = res
    r, e = x2d.shape
    block = _pick_block(r)
    r_pad = _round_up(r, block)
    # zero-padded dy rows contribute nothing to dg/db; padded dx rows are
    # sliced off below (x pads to zero rows, which normalize safely).
    xp = _pad_rows(x2d, r_pad)
    dyp = _pad_rows(dy, r_pad)
    dx, dg, db = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps),
        grid=(r_pad // block,),
        in_specs=[
            pl.BlockSpec((block, e), lambda i: (i, 0)),
            pl.BlockSpec((block, e), lambda i: (i, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block, e), lambda i: (i, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, e), x2d.dtype),
            jax.ShapeDtypeStruct((1, e), jnp.float32),
            jax.ShapeDtypeStruct((1, e), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=16 * r_pad * e,
            bytes_accessed=3 * r_pad * e * x2d.dtype.itemsize,
            transcendentals=r_pad,
        ),
        interpret=interpret,
    )(xp, dyp, g2d)
    if r_pad != r:
        dx = dx[:r]
    return dx, dg.astype(g2d.dtype), db.astype(g2d.dtype)


_ln_pallas.defvjp(_ln_pallas_fwd, _ln_pallas_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def layer_norm(
    x: jax.Array,
    g: jax.Array,
    b: jax.Array,
    eps: float = 1e-5,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """LayerNorm over the last axis; g/b are [E] scale/offset.

    Reference semantics (models.py:373-389): normalize then affine; we
    compute in fp32 and return in x.dtype. Pallas fused kernels on TPU,
    XLA reference elsewhere.
    """
    if use_pallas is None:
        use_pallas = _on_tpu() or interpret
    e = x.shape[-1]
    if not (use_pallas and e % 128 == 0):
        return layer_norm_reference(x, g, b, eps)
    lead = x.shape[:-1]
    x2d = x.reshape(-1, e)
    g2d = g.reshape(1, e)
    b2d = b.reshape(1, e)
    y = _ln_pallas(x2d, g2d, b2d, float(eps), interpret)
    return y.reshape(*lead, e)
