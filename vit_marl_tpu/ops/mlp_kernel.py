"""Fused transformer-MLP Pallas kernel: dense -> GELU -> dense, row-tiled.

Why: the ViT block's MLP is HBM-bandwidth-bound, not MXU-bound.  At 8192
envs the hidden activation is (B*N, 4W) ~ 277 MB bf16 per layer; XLA
materialises it between the two matmuls, so each layer moves ~1.2 GB of
HBM traffic and the 12-layer forward spends ~35 ms in MLPs at <50% MXU
utilisation.  This kernel keeps each row-tile's hidden activation in VMEM
(weights fit VMEM whole: 2*W*4W bf16 ~ 2.4 MB for ViT-Small), so per
layer only x and the output touch HBM.

Gradient support: `fused_mlp` carries a custom VJP whose backward pass
recomputes the hidden activation with plain XLA matmuls — identical math
to differentiating the unfused reference path (`_mlp_reference`), which
the PPO update was already paying for.

Differential tests: tests/test_mlp_kernel.py runs the kernel in
interpret mode on CPU against `_mlp_reference` (and the VJP against
`jax.vjp` of the reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vit_marl_tpu.ops.tpu_params import row_grid_params

Array = jax.Array

ROW_BLOCK = 2048   # 512 measured 15% slower end-to-end: 4x the grid steps
#                    re-copy the (invariant) weight blocks 4x as often


def _gelu(x: Array) -> Array:
    # tanh-approximation GELU, matching flax.linen.gelu's default
    # (nn.gelu(x, approximate=True))
    return jax.nn.gelu(x, approximate=True)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = (h + b1_ref[...].astype(jnp.float32)).astype(x.dtype)
    h = _gelu(h)
    o = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    o = (o + b2_ref[...].astype(jnp.float32)).astype(x.dtype)
    o_ref[...] = o


def _mlp_reference(x: Array, w1: Array, b1: Array, w2: Array, b2: Array
                   ) -> Array:
    """The unfused math (mirrors flax Dense(dtype)->gelu->Dense(dtype))."""
    h = _gelu((jnp.dot(x, w1, preferred_element_type=jnp.float32)
               + b1).astype(x.dtype))
    return (jnp.dot(h, w2, preferred_element_type=jnp.float32)
            + b2).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_mlp(x: Array, w1: Array, b1: Array, w2: Array, b2: Array,
              interpret: bool = False) -> Array:
    """``gelu(x @ w1 + b1) @ w2 + b2`` with the hidden activation kept in
    VMEM.  ``x``: (rows, W); returns (rows, W)."""
    return _fused_mlp_fwd_impl(x, w1, b1, w2, b2, interpret)


def _fused_mlp_fwd_impl(x, w1, b1, w2, b2, interpret):
    rows, w_in = x.shape
    hidden = w1.shape[1]
    if (rows % ROW_BLOCK != 0 or rows < ROW_BLOCK
            or (not interpret and jax.default_backend() != "tpu")):
        return _mlp_reference(x, w1, b1, w2, b2)
    n_blocks = rows // ROW_BLOCK
    return pl.pallas_call(
        _mlp_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, w_in), lambda i: (i, 0)),
            pl.BlockSpec((w_in, hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden, w_in), lambda i: (0, 0)),
            pl.BlockSpec((1, w_in), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, w_in), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, w_in), x.dtype),
        compiler_params=row_grid_params(),
        interpret=interpret,
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


def _fused_mlp_fwd(x, w1, b1, w2, b2, interpret):
    # NOTE: this JAX passes fwd args in their original positions (the
    # nondiff arg is NOT moved to the front for fwd — only for bwd)
    return _fused_mlp_fwd_impl(x, w1, b1, w2, b2, interpret), \
        (x, w1, b1, w2, b2)


def _fused_mlp_bwd(interpret, res, g):
    x, w1, b1, w2, b2 = res
    # recompute the hidden activation (cheaper than saving 4W-wide rows)
    pre = (jnp.dot(x, w1, preferred_element_type=jnp.float32)
           + b1).astype(x.dtype)
    h = _gelu(pre)
    f32 = jnp.float32
    dh = jnp.dot(g.astype(x.dtype), w2.T,
                 preferred_element_type=f32).astype(x.dtype)
    _, gelu_vjp = jax.vjp(_gelu, pre)
    dpre = gelu_vjp(dh)[0]
    dx = jnp.dot(dpre, w1.T, preferred_element_type=f32).astype(x.dtype)
    dw1 = jnp.dot(x.T, dpre, preferred_element_type=f32).astype(w1.dtype)
    db1 = dpre.astype(f32).sum(axis=0).astype(b1.dtype)
    dw2 = jnp.dot(h.T, g.astype(h.dtype),
                  preferred_element_type=f32).astype(w2.dtype)
    db2 = g.astype(f32).sum(axis=0).astype(b2.dtype)
    return dx, dw1, db1, dw2, db2


# custom_vjp with nondiff_argnums places `interpret` first in fwd/bwd
fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
