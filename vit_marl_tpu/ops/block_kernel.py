"""Fused transformer-block halves: (LN->QKV) and (proj->add->LN->MLP->add).

Why: at 8192 envs a ViT-Small forward moves ~1.6 GB of HBM traffic per
block between XLA fusions (LN reductions re-read x; the MLP hidden is 277
MB; every op boundary is a round trip).  Attention itself stays in XLA
(its (B, N, H, D) broadcast-reduce form is already VPU-efficient and an
in-kernel version would need sublane-crossing relayouts at N=11 — see
DESIGN.md), but everything AROUND it fuses into two row-tiled Pallas
kernels with only x / qkv / attn_out / x' touching HBM:

    half 1:  x -(LN1, f32)-> h -(matmul)-> qkv            (reads x, writes qkv)
    half 2:  attn_out -(matmul)-> proj; x1 = x + proj;
             h = LN2(x1); mlp = W2 gelu(W1 h + b1) + b2;
             out = x1 + mlp                               (reads attn_out + x,
                                                           writes out)

Per block this roughly halves HBM traffic vs the unfused path (~1.6 GB ->
~0.8 GB at 8192 envs); weights load once (constant BlockSpec index maps)
and the MLP hidden lives in VMEM (the standalone fused-MLP kernel this
generalised was deleted after losing its A/B twice: 15% slower than XLA
at ROW_BLOCK=512 in round 2, 3% slower at 2048 — runs/r4/bench_vit_fused
.txt 94.5k vs 97.8k unfused env-steps/s).

Numerics match the flax Block within bf16 rounding: LN statistics in f32,
matmuls with f32 accumulation (``preferred_element_type``), biases added
in f32 before the cast back to the compute dtype.  Gradients: custom VJPs
recompute with plain XLA matmuls — identical math to differentiating the
reference path (``_ln_qkv_reference`` / ``_proj_mlp_reference``), which
tests check against ``jax.vjp`` of the references directly.

Differential tests: tests/test_block_kernel.py (interpret mode on CPU).
No reference-repo counterpart: the reference never ran its vision path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vit_marl_tpu.ops.tpu_params import row_grid_params

Array = jax.Array

ROW_BLOCK = 1024   # rows per grid step
# Width guard: the kernels keep all weights resident (constant BlockSpec
# index maps) plus the row-block ins/outs and the (ROW_BLOCK, 4W) bf16
# hidden.  At W=384 (ViT-Small) that is ~2.7 MB weights + ~4.7 MB row io
# + ~3.1 MB hidden — comfortably inside v5e's ~16 MB VMEM.  At W=768
# (ViT-Base) the weights alone are ~10.6 MB and the total overflows, so
# widths above MAX_WIDTH fall back to the unfused reference path.
MAX_WIDTH = 512


def _gelu(x: Array) -> Array:
    return jax.nn.gelu(x, approximate=True)


def _ln(x: Array, gamma: Array, beta: Array) -> Array:
    """LayerNorm over the last axis with f32 statistics (flax semantics:
    epsilon 1e-6 matches nn.LayerNorm's default)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    return y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)


# --------------------------------------------------------------------------
# half 1: x -> LN1 -> QKV
# --------------------------------------------------------------------------

def _ln_qkv_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref):
    h = _ln(x_ref[...], g_ref[...], b_ref[...]).astype(x_ref.dtype)
    o = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (o + bias_ref[...].astype(jnp.float32)).astype(x_ref.dtype)


def _ln_qkv_reference(x, gamma, beta, w, bias):
    h = _ln(x, gamma, beta).astype(x.dtype)
    o = jnp.dot(h, w, preferred_element_type=jnp.float32)
    return (o + bias.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_ln_qkv(x: Array, gamma: Array, beta: Array, w: Array, bias: Array,
                 interpret: bool = False) -> Array:
    """``LN(x) @ w + bias`` with LN fused into the matmul's row tile.

    ``x``: (rows, W); ``w``: (W, K); returns (rows, K).
    """
    return _ln_qkv_impl(x, gamma, beta, w, bias, interpret)


def _ln_qkv_impl(x, gamma, beta, w, bias, interpret):
    rows, w_in = x.shape
    k = w.shape[1]
    # guard the OUTPUT width too (k = 3W for QKV, but callers may pass
    # anything): the (ROW_BLOCK, k) f32 accumulator must fit VMEM
    if (rows % ROW_BLOCK != 0 or w_in > MAX_WIDTH or k > 4 * MAX_WIDTH
            or (not interpret and jax.default_backend() != "tpu")):
        return _ln_qkv_reference(x, gamma, beta, w, bias)
    return pl.pallas_call(
        _ln_qkv_kernel,
        grid=(rows // ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, w_in), lambda i: (i, 0)),
            pl.BlockSpec((1, w_in), lambda i: (0, 0)),
            pl.BlockSpec((1, w_in), lambda i: (0, 0)),
            pl.BlockSpec((w_in, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, k), x.dtype),
        compiler_params=row_grid_params(),
        interpret=interpret,
    )(x, gamma.reshape(1, -1), beta.reshape(1, -1), w, bias.reshape(1, -1))


def _ln_qkv_fwd(x, gamma, beta, w, bias, interpret):
    return _ln_qkv_impl(x, gamma, beta, w, bias, interpret), \
        (x, gamma, beta, w, bias)


def _ln_qkv_bwd(interpret, res, g):
    x, gamma, beta, w, bias = res
    ref = lambda *a: _ln_qkv_reference(*a)
    _, vjp = jax.vjp(ref, x, gamma, beta, w, bias)
    return vjp(g)


fused_ln_qkv.defvjp(_ln_qkv_fwd, _ln_qkv_bwd)


# --------------------------------------------------------------------------
# half 2: attn_out, x -> proj -> +x -> LN2 -> MLP -> +x1
# --------------------------------------------------------------------------

def _proj_mlp_kernel(a_ref, x_ref, wp_ref, bp_ref, g_ref, b_ref,
                     w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    dt = x_ref.dtype
    proj = jnp.dot(a_ref[...], wp_ref[...], preferred_element_type=jnp.float32)
    proj = (proj + bp_ref[...].astype(jnp.float32)).astype(dt)
    x1 = x_ref[...] + proj
    h = _ln(x1, g_ref[...], b_ref[...]).astype(dt)
    hid = jnp.dot(h, w1_ref[...], preferred_element_type=jnp.float32)
    hid = _gelu((hid + b1_ref[...].astype(jnp.float32)).astype(dt))
    mlp = jnp.dot(hid, w2_ref[...], preferred_element_type=jnp.float32)
    mlp = (mlp + b2_ref[...].astype(jnp.float32)).astype(dt)
    o_ref[...] = x1 + mlp


def _proj_mlp_reference(attn_out, x, wp, bp, gamma, beta, w1, b1, w2, b2):
    dt = x.dtype
    proj = jnp.dot(attn_out, wp, preferred_element_type=jnp.float32)
    proj = (proj + bp.astype(jnp.float32)).astype(dt)
    x1 = x + proj
    h = _ln(x1, gamma, beta).astype(dt)
    hid = jnp.dot(h, w1, preferred_element_type=jnp.float32)
    hid = _gelu((hid + b1.astype(jnp.float32)).astype(dt))
    mlp = jnp.dot(hid, w2, preferred_element_type=jnp.float32)
    mlp = (mlp + b2.astype(jnp.float32)).astype(dt)
    return x1 + mlp


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def fused_proj_mlp(attn_out: Array, x: Array, wp: Array, bp: Array,
                   gamma: Array, beta: Array, w1: Array, b1: Array,
                   w2: Array, b2: Array, interpret: bool = False) -> Array:
    """Attention-proj + residual + LN2 + MLP + residual, row-tiled; the
    4W-wide MLP hidden never leaves VMEM.  ``attn_out``/``x``: (rows, W)."""
    return _proj_mlp_impl(attn_out, x, wp, bp, gamma, beta, w1, b1, w2, b2,
                          interpret)


def _proj_mlp_impl(attn_out, x, wp, bp, gamma, beta, w1, b1, w2, b2,
                   interpret):
    rows, w_in = x.shape
    hidden = w1.shape[1]
    # hidden width guard: non-default mlp_ratio can overflow VMEM even at
    # an allowed w_in (the hidden block + its f32 accumulator dominate)
    if (rows % ROW_BLOCK != 0 or w_in > MAX_WIDTH or hidden > 4 * MAX_WIDTH
            or (not interpret and jax.default_backend() != "tpu")):
        return _proj_mlp_reference(attn_out, x, wp, bp, gamma, beta,
                                   w1, b1, w2, b2)
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        _proj_mlp_kernel,
        grid=(rows // ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, w_in), row),
            pl.BlockSpec((ROW_BLOCK, w_in), row),
            pl.BlockSpec((w_in, w_in), const),
            pl.BlockSpec((1, w_in), const),
            pl.BlockSpec((1, w_in), const),
            pl.BlockSpec((1, w_in), const),
            pl.BlockSpec((w_in, hidden), const),
            pl.BlockSpec((1, hidden), const),
            pl.BlockSpec((hidden, w_in), const),
            pl.BlockSpec((1, w_in), const),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, w_in), row),
        out_shape=jax.ShapeDtypeStruct((rows, w_in), x.dtype),
        compiler_params=row_grid_params(),
        interpret=interpret,
    )(attn_out, x, wp, bp.reshape(1, -1), gamma.reshape(1, -1),
      beta.reshape(1, -1), w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


def _proj_mlp_fwd(attn_out, x, wp, bp, gamma, beta, w1, b1, w2, b2,
                  interpret):
    out = _proj_mlp_impl(attn_out, x, wp, bp, gamma, beta, w1, b1, w2, b2,
                         interpret)
    return out, (attn_out, x, wp, bp, gamma, beta, w1, b1, w2, b2)


def _proj_mlp_bwd(interpret, res, g):
    ref = lambda *a: _proj_mlp_reference(*a)
    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


fused_proj_mlp.defvjp(_proj_mlp_fwd, _proj_mlp_bwd)


# --------------------------------------------------------------------------
# fully-fused block: x -> LN1 -> QKV -> attention -> proj -> +x -> LN2
#                      -> MLP -> +x1, one kernel
# --------------------------------------------------------------------------
#
# The two-half split above still round-trips qkv (3W) and attn_out (W)
# through HBM between the halves — at 8192 envs x ViT-Small that is
# ~830 MB/block of traffic the fusion boundary forces.  Fusing the
# short-seq attention body (ops/attention_kernel.py::_attn_body — the
# sublane-roll + selection-matmul algorithm) between the halves leaves
# only x in / x' out per block: ~1.1 MB of row io per 704-row grid step
# vs ~9 MB through the split kernels.
#
# Rows must group whole envs for the attention rolls, so the row block is
# ``env_block * n_tokens`` (default 64*11 = 704) rather than ROW_BLOCK.
# VMEM at W=384/EB=64: ~4 MB weights + ~0.5 MB row io + f32 attention
# intermediates ~8 MB peak — inside v5e's ~16 MB, with EB=32 as the
# fallback knob if a wider config overflows.

DEF_FULL_ENV_BLOCK = 64


def _full_block_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref,
                       sel_ref, bsel_ref, wp_ref, bp_ref, g2_ref, b2_ref,
                       w1_ref, bm1_ref, w2_ref, bm2_ref, o_ref, *,
                       n_tokens: int, heads: int):
    from vit_marl_tpu.ops.attention_kernel import _attn_body

    dt = x_ref.dtype
    x = x_ref[...]
    h = _ln(x, g1_ref[...], b1_ref[...]).astype(dt)
    qkv = jnp.dot(h, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(dt)
    attn = _attn_body(qkv.astype(jnp.float32), sel_ref[...], bsel_ref[...],
                      n_tokens, heads).astype(dt)
    proj = jnp.dot(attn, wp_ref[...], preferred_element_type=jnp.float32)
    proj = (proj + bp_ref[...].astype(jnp.float32)).astype(dt)
    x1 = x + proj
    h2 = _ln(x1, g2_ref[...], b2_ref[...]).astype(dt)
    hid = jnp.dot(h2, w1_ref[...], preferred_element_type=jnp.float32)
    hid = _gelu((hid + bm1_ref[...].astype(jnp.float32)).astype(dt))
    mlp = jnp.dot(hid, w2_ref[...], preferred_element_type=jnp.float32)
    mlp = (mlp + bm2_ref[...].astype(jnp.float32)).astype(dt)
    o_ref[...] = x1 + mlp


def _full_block_reference(x, g1, b1, wqkv, bqkv, wp, bp, g2, b2,
                          w1, bm1, w2, bm2, n_tokens, heads):
    """Composition of the three tested references (fallback + backward)."""
    from vit_marl_tpu.ops.attention_kernel import _attention_reference

    qkv = _ln_qkv_reference(x, g1, b1, wqkv, bqkv)
    attn = _attention_reference(qkv, n_tokens, heads).astype(x.dtype)
    return _proj_mlp_reference(attn, x, wp, bp, g2, b2, w1, bm1, w2, bm2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16))
def fused_block_full(x: Array, g1: Array, b1: Array, wqkv: Array,
                     bqkv: Array, wp: Array, bp: Array, g2: Array,
                     b2: Array, w1: Array, bm1: Array, w2: Array,
                     bm2: Array, n_tokens: int, heads: int,
                     env_block: int = DEF_FULL_ENV_BLOCK,
                     interpret: bool = False) -> Array:
    """One transformer block in one kernel; only x / x' touch HBM.

    ``x``: (rows, W) flat token rows (rows = envs * n_tokens, the
    ``rows_2d`` layout).  Requires ``rows % (env_block * n_tokens) == 0``;
    falls back to the composed XLA reference off-TPU or for unaligned /
    too-wide shapes.  Backward recomputes in XLA (same recipe as the
    half kernels)."""
    return _full_block_impl(x, g1, b1, wqkv, bqkv, wp, bp, g2, b2,
                            w1, bm1, w2, bm2, n_tokens, heads,
                            env_block, interpret)


def _full_block_impl(x, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, bm1,
                     w2, bm2, n_tokens, heads, env_block, interpret):
    from vit_marl_tpu.ops.attention_kernel import _selection_matrices, HPAD

    rows, w_in = x.shape
    hidden = w1.shape[1]
    blk = env_block * n_tokens
    # single source of truth for the shape predicate: full_block_ok (bench
    # and profile use it to decide whether the fused label is honest)
    if (not full_block_ok(rows, n_tokens, w_in, heads, hidden, env_block)
            or (not interpret and jax.default_backend() != "tpu")):
        return _full_block_reference(x, g1, b1, wqkv, bqkv, wp, bp, g2, b2,
                                     w1, bm1, w2, bm2, n_tokens, heads)
    sel, bsel = _selection_matrices(heads, w_in // heads)
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        functools.partial(_full_block_kernel, n_tokens=n_tokens,
                          heads=heads),
        grid=(rows // blk,),
        in_specs=[
            pl.BlockSpec((blk, w_in), row),
            pl.BlockSpec((1, w_in), const),
            pl.BlockSpec((1, w_in), const),
            pl.BlockSpec((w_in, 3 * w_in), const),
            pl.BlockSpec((1, 3 * w_in), const),
            pl.BlockSpec((w_in, HPAD), const),
            pl.BlockSpec((HPAD, w_in), const),
            pl.BlockSpec((w_in, w_in), const),
            pl.BlockSpec((1, w_in), const),
            pl.BlockSpec((1, w_in), const),
            pl.BlockSpec((1, w_in), const),
            pl.BlockSpec((w_in, hidden), const),
            pl.BlockSpec((1, hidden), const),
            pl.BlockSpec((hidden, w_in), const),
            pl.BlockSpec((1, w_in), const),
        ],
        out_specs=pl.BlockSpec((blk, w_in), row),
        out_shape=jax.ShapeDtypeStruct((rows, w_in), x.dtype),
        compiler_params=row_grid_params(),
        interpret=interpret,
    )(x, g1.reshape(1, -1), b1.reshape(1, -1), wqkv, bqkv.reshape(1, -1),
      sel, bsel, wp, bp.reshape(1, -1), g2.reshape(1, -1),
      b2.reshape(1, -1), w1, bm1.reshape(1, -1), w2, bm2.reshape(1, -1))


def _full_block_fwd(x, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, bm1, w2,
                    bm2, n_tokens, heads, env_block, interpret):
    out = _full_block_impl(x, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, bm1,
                           w2, bm2, n_tokens, heads, env_block, interpret)
    return out, (x, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, bm1, w2, bm2)


def _full_block_bwd(n_tokens, heads, env_block, interpret, res, g):
    ref = lambda *a: _full_block_reference(*a, n_tokens, heads)
    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


fused_block_full.defvjp(_full_block_fwd, _full_block_bwd)


def full_block_ok(rows: int, n_tokens: int, width: int, heads: int,
                  hidden: int,
                  env_block: int = DEF_FULL_ENV_BLOCK) -> bool:
    """Whether the fully-fused kernel (not the fallback) engages."""
    return (rows % (env_block * n_tokens) == 0 and width <= MAX_WIDTH
            and hidden <= 4 * MAX_WIDTH and width % heads == 0)


# --------------------------------------------------------------------------
# LN1 + QKV + attention in one kernel (VERDICT r4 item 9): the middle
# ground between the attention kernel (which still round-trips LN1's
# output and the (rows, 3W) qkv through HBM — ~550 MB/block at 8192 envs
# x ViT-Small) and the fully-fused block (whose in-kernel MLP lost its
# end-to-end A/B, runs/r4/bench_vit_fusedblockfull.txt).  proj/LN2/MLP
# stay in XLA, so the cls_only last-block optimisation still applies.
# --------------------------------------------------------------------------

def _ln_qkv_attn_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, sel_ref,
                        bsel_ref, o_ref, *, n_tokens: int, heads: int):
    from vit_marl_tpu.ops.attention_kernel import _attn_body

    dt = x_ref.dtype
    h = _ln(x_ref[...], g_ref[...], b_ref[...]).astype(dt)
    qkv = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
    # cast to the compute dtype first: the unfused pipeline's Dense emits
    # bf16 qkv, so the attention must see the same rounding
    qkv = (qkv + bias_ref[...].astype(jnp.float32)).astype(dt)
    exact = jnp.dtype(dt) == jnp.float32
    out = _attn_body(qkv.astype(jnp.float32), sel_ref[...], bsel_ref[...],
                     n_tokens, heads, exact_f32=exact)
    o_ref[...] = out.astype(dt)


def _ln_qkv_attn_reference(x, gamma, beta, w, bias, n_tokens, heads):
    """Composition of the two tested references (fallback + backward)."""
    from vit_marl_tpu.ops.attention_kernel import _attention_reference

    qkv = _ln_qkv_reference(x, gamma, beta, w, bias)
    return _attention_reference(qkv, n_tokens, heads).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_ln_qkv_attn(x: Array, gamma: Array, beta: Array, w: Array,
                      bias: Array, n_tokens: int, heads: int,
                      env_block: int = DEF_FULL_ENV_BLOCK,
                      interpret: bool = False,
                      bwd_kernel: bool = True) -> Array:
    """``attention(LN(x) @ w + bias)`` in one kernel; x in, attention rows
    out — LN1's output and the (rows, 3W) qkv never touch HBM.

    ``x``: (rows, W) flat token rows (rows = envs * n_tokens, rows_2d
    layout); returns (rows, W) pre-projection attention rows.  Requires
    ``ln_qkv_attn_ok``; falls back to the composed XLA reference off-TPU
    or for unaligned/too-wide shapes.  Backward recomputes qkv in XLA and
    chains through the Pallas attention-backward kernel (``bwd_kernel``,
    default) or the XLA attention vjp.
    """
    return _ln_qkv_attn_impl(x, gamma, beta, w, bias, n_tokens, heads,
                             env_block, interpret)


def _ln_qkv_attn_impl(x, gamma, beta, w, bias, n_tokens, heads, env_block,
                      interpret):
    from vit_marl_tpu.ops.attention_kernel import HPAD, _selection_matrices

    rows, w_in = x.shape
    blk = env_block * n_tokens
    if (not ln_qkv_attn_ok(rows, n_tokens, w_in, heads, env_block)
            or (not interpret and jax.default_backend() != "tpu")):
        return _ln_qkv_attn_reference(x, gamma, beta, w, bias, n_tokens,
                                      heads)
    sel, bsel = _selection_matrices(heads, w_in // heads)
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        functools.partial(_ln_qkv_attn_kernel, n_tokens=n_tokens,
                          heads=heads),
        grid=(rows // blk,),
        in_specs=[
            pl.BlockSpec((blk, w_in), row),
            pl.BlockSpec((1, w_in), const),
            pl.BlockSpec((1, w_in), const),
            pl.BlockSpec((w_in, 3 * w_in), const),
            pl.BlockSpec((1, 3 * w_in), const),
            pl.BlockSpec((w_in, HPAD), const),
            pl.BlockSpec((HPAD, w_in), const),
        ],
        out_specs=pl.BlockSpec((blk, w_in), row),
        out_shape=jax.ShapeDtypeStruct((rows, w_in), x.dtype),
        compiler_params=row_grid_params(),
        interpret=interpret,
    )(x, gamma.reshape(1, -1), beta.reshape(1, -1), w, bias.reshape(1, -1),
      sel, bsel)


def _ln_qkv_attn_fwd(x, gamma, beta, w, bias, n_tokens, heads, env_block,
                     interpret, bwd_kernel):
    out = _ln_qkv_attn_impl(x, gamma, beta, w, bias, n_tokens, heads,
                            env_block, interpret)
    return out, (x, gamma, beta, w, bias)


def _ln_qkv_attn_bwd(n_tokens, heads, env_block, interpret, bwd_kernel,
                     res, g):
    from vit_marl_tpu.ops.attention_kernel import (
        _attention_reference,
        _bwd_kernel_call,
        attention_ok,
    )

    x, gamma, beta, w, bias = res
    qkv, lnqkv_vjp = jax.vjp(
        lambda *a: _ln_qkv_reference(*a), x, gamma, beta, w, bias)
    on_tpu = interpret or jax.default_backend() == "tpu"
    if (bwd_kernel and on_tpu
            and attention_ok(x.shape[0], n_tokens, env_block)):
        dqkv = _bwd_kernel_call(qkv, g.astype(qkv.dtype), n_tokens, heads,
                                env_block, interpret)
    else:
        _, attn_vjp = jax.vjp(
            lambda q: _attention_reference(q, n_tokens, heads), qkv)
        dqkv, = attn_vjp(g.astype(qkv.dtype))
    return lnqkv_vjp(dqkv)


fused_ln_qkv_attn.defvjp(_ln_qkv_attn_fwd, _ln_qkv_attn_bwd)


def ln_qkv_attn_ok(rows: int, n_tokens: int, width: int, heads: int,
                   env_block: int = DEF_FULL_ENV_BLOCK) -> bool:
    """Whether the LN1+QKV+attention kernel (not the fallback) engages."""
    return (rows % (env_block * n_tokens) == 0 and width <= MAX_WIDTH
            and width % heads == 0)


def short_ln_qkv_attn(x: Array, gamma: Array, beta: Array, w: Array,
                      bias: Array, n_tokens: int, heads: int,
                      env_block: int = DEF_FULL_ENV_BLOCK,
                      bwd_kernel: bool = True) -> Array:
    """``fused_ln_qkv_attn``, shard_mapped over the active attention mesh
    context (ops/attention_kernel.py) — the same recipe as
    ``short_attention``: GSPMD cannot partition a pallas_call (it would
    REPLICATE it on every chip), so under a mesh the kernel runs per
    shard with the row axis split at env boundaries and the LN/QKV
    params replicated.  Gradients are exact: shard_map's transpose
    psums the replicated params' cotangents across shards (verified
    vs the unsharded vjp on the 8-dev CPU mesh, tests/test_parallel.py).

    With no context (or per-shard tiling that cannot engage the kernel)
    this falls back to the plain call / the XLA reference — which GSPMD
    shards fine on its own.
    """
    from vit_marl_tpu.ops.attention_kernel import _mesh_ctx

    ctx = _mesh_ctx()
    if ctx is None:
        return fused_ln_qkv_attn(x, gamma, beta, w, bias, n_tokens, heads,
                                 env_block, False, bwd_kernel)
    mesh, axis = ctx
    names = axis if isinstance(axis, tuple) else (axis,)
    nd = 1
    for a in names:
        nd *= mesh.shape[a]
    rows, w_in = x.shape
    if rows % nd or not ln_qkv_attn_ok(rows // nd, n_tokens, w_in, heads,
                                       env_block):
        # per-shard tiling cannot engage the kernel: use the XLA
        # reference, which GSPMD partitions correctly without shard_map
        return _ln_qkv_attn_reference(x, gamma, beta, w, bias, n_tokens,
                                      heads)
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    f = shard_map(
        lambda xx, g, b, ww, bb: fused_ln_qkv_attn(
            xx, g, b, ww, bb, n_tokens, heads, env_block, False,
            bwd_kernel),
        mesh=mesh, in_specs=(P(axis), P(), P(), P(), P()),
        out_specs=P(axis), check_rep=False)
    return f(x, gamma, beta, w, bias)
