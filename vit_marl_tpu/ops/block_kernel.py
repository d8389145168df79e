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
and the MLP hidden lives in VMEM (same idea as ops/mlp_kernel.py, which
this supersedes on the block path when enabled).

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
