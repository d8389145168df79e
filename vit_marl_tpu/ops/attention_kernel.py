"""Fused short-sequence attention Pallas kernel (book-image ViT).

Why: the XLA short-seq attention path (``models/vit.py::attention_nhd``)
materialises logits/weights as ``(B, N, N, H)`` tensors.  With N=11 tokens
and H=6 heads the last two dims tile-pad to (16, 128) — a ~31x HBM-traffic
blowup per materialisation (738 MB instead of 24 MB at B=8192) — and the
softmax chain touches them several times.  This kernel keeps every
intermediate in VMEM and exchanges exactly the unpadded flat tensors with
HBM: read ``(B*N, 3W)`` qkv rows (the fused QKV Dense output in the
``rows_2d`` layout), write ``(B*N, W)`` attention rows.

Algorithm per grid block of EB envs (R = EB*N rows resident in VMEM):

- Token pairing by sublane rolls: for offset ``r``, row ``e*N + i`` pairs
  with ``e*N + ((i + r) mod N)``; the mod-N wrap picks per-row between
  ``roll(-r)`` and ``roll(N - r)`` (cross-env rows are never selected).
- Per-head reduction/broadcast via constant 0/1 selection matrices on the
  MXU: ``(R, W) @ (W, Hpad)`` sums each head's D lanes (the VPU butterfly
  alternative costs ~25 ops per offset); ``(R, Hpad) @ (Hpad, W)``
  broadcasts per-head scalars back across head lanes.
- Two-pass (max, then exp/accumulate) softmax over the N offsets, flash
  style: only ``(R, Hpad)`` stats and the ``(R, W)`` output accumulator
  live across offsets; logits are recomputed in pass B.

Numerics: all accumulation f32 (matching ``attention_nhd``'s f32 logits);
the output is bit-comparable to the XLA path at f32 inputs up to the
usual reassociation tolerance (tested to ~1e-5 relative).

No reference counterpart exists (the reference has no TPU kernels and
never wired its vision encoder; ref: networks/vision_agent.py stub).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_marl_tpu.ops.tpu_params import row_grid_params

Array = jax.Array

HPAD = 128          # lane-padded head axis for the segment-reduce matmul
DEF_ENV_BLOCK = 64  # envs per grid step (R = EB*N rows in VMEM)


def _selection_matrices(heads: int, head_dim: int):
    """(W, HPAD) segment-sum and (HPAD, W) broadcast constants."""
    w = heads * head_dim
    sel = np.zeros((w, HPAD), np.float32)
    for h in range(heads):
        sel[h * head_dim:(h + 1) * head_dim, h] = 1.0
    return jnp.asarray(sel), jnp.asarray(sel.T)


def _attn_body(x, sel, bsel, n_tokens: int, heads: int,
               exact_f32: bool = False):
    """The in-VMEM attention computation, shared with the fully-fused block
    kernel (ops/block_kernel.py::fused_block_full).

    ``x``: (R, 3W) f32 qkv rows; ``sel``/``bsel``: the selection constants.
    ``exact_f32``: run the selection dots at full f32 precision (see the
    precision note below).  Returns (R, W) f32 attention rows.
    """
    N = n_tokens
    R, W3 = x.shape
    W = W3 // 3
    D = W // heads
    scale = D ** -0.5
    q = x[:, :W] * scale
    k = x[:, W:2 * W]
    v = x[:, 2 * W:]

    # row i's local token index decides the mod-N wrap of each pairing
    i_local = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % N

    def paired(t, r):
        """Rows of ``t`` paired at token offset ``r`` (within-env wrap).

        ``pltpu.roll(t, s)[m] == t[m - s]`` (cyclic, non-negative shifts
        only), so row m+r is shift R-r and row m-(N-r) is shift N-r.
        """
        if r == 0:
            return t
        fwd = pltpu.roll(t, R - r, 0)            # row m + r
        back = pltpu.roll(t, N - r, 0)           # row m - (N - r)
        return jnp.where(i_local + r < N, fwd, back)

    # Precision of the selection dots, chosen by the CALLER's input dtype
    # (_kernel_call sets exact_f32 = (qkv.dtype == f32)):
    # - f32 inputs (diagnostics, fp32-fidelity tests): HIGHEST.  At
    #   DEFAULT the Mosaic MXU truncates f32 operands to bf16 (one pass),
    #   a ~4e-3 relative error invisible to CPU interpret tests — caught
    #   by bench --selfcheck on hardware (rel err 3.56e-03 at tol 2e-5;
    #   HIGHEST brings it to 2.4e-7).
    # - bf16 inputs (the production compute dtype): DEFAULT.  q/k/v are
    #   already bf16-rounded, so truncating the q·k products adds noise
    #   of the same order the pipeline already carries, and the multi-
    #   pass cost of HIGHEST on 34 (R,W)x(W,128)-class dots per block
    #   (~0.4 GFLOP/env/layer extra) is real.
    _PREC = (jax.lax.Precision.HIGHEST if exact_f32
             else jax.lax.Precision.DEFAULT)

    def head_logits(r):
        """(R, HPAD) per-head q.k at offset r (f32, MXU segment-sum)."""
        t = q * paired(k, r)                     # (R, W)
        return jax.lax.dot(t, sel, precision=_PREC,
                           preferred_element_type=jnp.float32)

    # pass A: running max over offsets (per row, per head)
    m = head_logits(0)
    for r in range(1, N):
        m = jnp.maximum(m, head_logits(r))

    # pass B: exp-sum and weighted-V accumulation
    l = jnp.zeros_like(m)                        # (R, HPAD)
    acc = jnp.zeros((R, W), jnp.float32)
    for r in range(N):
        s = jnp.exp(head_logits(r) - m)          # (R, HPAD)
        l = l + s
        s_lanes = jax.lax.dot(s, bsel, precision=_PREC,
                              preferred_element_type=jnp.float32)  # (R, W)
        acc = acc + s_lanes * paired(v, r)

    inv = jax.lax.dot(1.0 / l, bsel, precision=_PREC,
                      preferred_element_type=jnp.float32)
    return acc * inv


def _attn_bwd_body(x, g, sel, bsel, n_tokens: int, heads: int,
                   exact_f32: bool = False):
    """In-VMEM attention backward: (R, 3W) qkv rows + (R, W) output
    cotangent -> (R, 3W) qkv cotangent, all f32.

    Same machinery as ``_attn_body`` (offset pairing by sublane rolls,
    per-head segment-sum/broadcast via the MXU selection constants) plus
    the inverse pairing ``unpaired`` (row m receives row m-r's value,
    wrapping within the env) for the dk/dv scatters:

        dv[i+r] += P_r[i] * g[i]            dk[i+r] += dL_r[i] * qs[i]
        dq[i]   += dL_r[i] * k[i+r] * scale
        dL = P * (dP - sum_j P*dP)   (softmax bwd), dP_r = segsum(g*v[i+r])

    Per-offset (R, HPAD) stats (exp-logits s_r, dP_r) are stashed across
    the two accumulation loops so logits are computed exactly twice
    (max pass + stat pass) — ~8 MB extra VMEM at EB=64, W<=768.
    """
    N = n_tokens
    R, W3 = x.shape
    W = W3 // 3
    D = W // heads
    scale = D ** -0.5
    qs = x[:, :W] * scale
    k = x[:, W:2 * W]
    v = x[:, 2 * W:]

    i_local = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % N

    def paired(t, r):
        if r == 0:
            return t
        fwd = pltpu.roll(t, R - r, 0)            # row m + r
        back = pltpu.roll(t, N - r, 0)           # row m - (N - r)
        return jnp.where(i_local + r < N, fwd, back)

    def unpaired(t, r):
        """Inverse of ``paired``: result[m] = t[m - r] within the env
        (row m accumulates the contribution row m - r computed for it)."""
        if r == 0:
            return t
        down = pltpu.roll(t, r, 0)               # row m - r
        up = pltpu.roll(t, R - (N - r), 0)       # row m + (N - r)
        return jnp.where(i_local >= r, down, up)

    _PREC = (jax.lax.Precision.HIGHEST if exact_f32
             else jax.lax.Precision.DEFAULT)

    def segsum(t):
        return jax.lax.dot(t, sel, precision=_PREC,
                           preferred_element_type=jnp.float32)

    def lanes(t):
        return jax.lax.dot(t, bsel, precision=_PREC,
                           preferred_element_type=jnp.float32)

    def head_logits(r):
        return segsum(qs * paired(k, r))         # (R, HPAD)

    # pass A: running max over offsets
    m = head_logits(0)
    for r in range(1, N):
        m = jnp.maximum(m, head_logits(r))

    # pass B: stash exp-logits and dP per offset; accumulate the softmax
    # denominator
    s_list, dp_list = [], []
    l = jnp.zeros_like(m)
    for r in range(N):
        s = jnp.exp(head_logits(r) - m)          # (R, HPAD)
        s_list.append(s)
        dp_list.append(segsum(g * paired(v, r))) # (R, HPAD)
        l = l + s
    invl = 1.0 / l

    # pass C: delta = sum_r P_r*dP_r, and the dv accumulation
    delta = jnp.zeros_like(m)
    dv = jnp.zeros((R, W), jnp.float32)
    for r in range(N):
        p = s_list[r] * invl
        delta = delta + p * dp_list[r]
        dv = dv + unpaired(lanes(p) * g, r)

    # pass D: dq / dk from the softmax backward
    dq = jnp.zeros((R, W), jnp.float32)
    dk = jnp.zeros((R, W), jnp.float32)
    for r in range(N):
        dl = s_list[r] * invl * (dp_list[r] - delta)   # (R, HPAD)
        dll = lanes(dl)                                # (R, W)
        dq = dq + dll * paired(k, r)
        dk = dk + unpaired(dll * qs, r)
    return jnp.concatenate([dq * scale, dk, dv], axis=1)


def _attn_kernel(qkv_ref, sel_ref, bsel_ref, out_ref, *, n_tokens: int,
                 heads: int):
    exact = jnp.dtype(qkv_ref.dtype) == jnp.float32
    out = _attn_body(qkv_ref[...].astype(jnp.float32), sel_ref[...],
                     bsel_ref[...], n_tokens, heads, exact_f32=exact)
    out_ref[...] = out.astype(out_ref.dtype)


def _attention_reference(qkv: Array, n_tokens: int, heads: int) -> Array:
    """Pure-XLA reference on the same flat layout (fallback + backward)."""
    rows, w3 = qkv.shape
    W = w3 // 3
    B = rows // n_tokens
    D = W // heads
    qkv5 = qkv.reshape(B, n_tokens, 3, heads, D)
    q = qkv5[:, :, 0] * (D ** -0.5)
    k = qkv5[:, :, 1]
    v = qkv5[:, :, 2]
    logits = jnp.sum(q[:, :, None, :, :] * k[:, None, :, :, :],
                     axis=-1, dtype=jnp.float32)        # (B, Nq, Nk, H)
    wts = jax.nn.softmax(logits, axis=2).astype(qkv.dtype)
    out = jnp.sum(wts[..., None] * v[:, None, :, :, :], axis=2)
    return out.reshape(rows, W)


def _kernel_call(qkv: Array, n_tokens: int, heads: int, env_block: int,
                 interpret: bool) -> Array:
    rows, w3 = qkv.shape
    W = w3 // 3
    n_envs = rows // n_tokens
    sel, bsel = _selection_matrices(heads, W // heads)
    grid = (n_envs // env_block,)
    blk = env_block * n_tokens
    return pl.pallas_call(
        functools.partial(_attn_kernel, n_tokens=n_tokens, heads=heads),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, w3), lambda i: (i, 0)),
            pl.BlockSpec((W, HPAD), lambda i: (0, 0)),
            pl.BlockSpec((HPAD, W), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((blk, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, W), qkv.dtype),
        compiler_params=row_grid_params(),
        interpret=interpret,
    )(qkv, sel, bsel)


def _attn_bwd_kernel(qkv_ref, g_ref, sel_ref, bsel_ref, out_ref, *,
                     n_tokens: int, heads: int):
    exact = jnp.dtype(qkv_ref.dtype) == jnp.float32
    out = _attn_bwd_body(qkv_ref[...].astype(jnp.float32),
                         g_ref[...].astype(jnp.float32),
                         sel_ref[...], bsel_ref[...], n_tokens, heads,
                         exact_f32=exact)
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel_call(qkv: Array, g: Array, n_tokens: int, heads: int,
                     env_block: int, interpret: bool) -> Array:
    rows, w3 = qkv.shape
    W = w3 // 3
    n_envs = rows // n_tokens
    sel, bsel = _selection_matrices(heads, W // heads)
    grid = (n_envs // env_block,)
    blk = env_block * n_tokens
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, n_tokens=n_tokens, heads=heads),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, w3), lambda i: (i, 0)),
            pl.BlockSpec((blk, W), lambda i: (i, 0)),
            pl.BlockSpec((W, HPAD), lambda i: (0, 0)),
            pl.BlockSpec((HPAD, W), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((blk, w3), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, w3), qkv.dtype),
        compiler_params=row_grid_params(),
        interpret=interpret,
    )(qkv, g, sel, bsel)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def fused_short_attention(qkv: Array, n_tokens: int, heads: int,
                          env_block: int = DEF_ENV_BLOCK,
                          interpret: bool = False,
                          bwd_kernel: bool = True) -> Array:
    """Attention over flat qkv rows.

    ``qkv``: (B*N, 3W) — the fused QKV Dense output in the ``rows_2d``
    layout, lanes ordered [q | k | v] with heads contiguous (h*D + d), the
    exact layout ``models/vit.py::MHA`` produces.  Returns (B*N, W)
    attention rows (pre output-projection), dtype preserved.

    Requires ``(B*N) % (env_block * n_tokens) == 0`` (``attention_ok``);
    falls back to the XLA path off-TPU (unless ``interpret``).

    Differentiable: with ``bwd_kernel`` (default) the backward runs the
    fused Pallas backward kernel (``_attn_bwd_body`` — flash-style
    recompute + softmax backward, every (B, N, N, H)-class intermediate
    stays in VMEM; only qkv/g in and dqkv out touch HBM).  With
    ``bwd_kernel=False`` it recomputes attention in XLA and
    differentiates that (the pre-round-4 behaviour, kept for A/Bs).
    Off-TPU both paths fall back to the XLA vjp (unless ``interpret``).
    """
    rows, w3 = qkv.shape
    n_envs = rows // n_tokens
    if rows % n_tokens or n_envs % env_block:
        raise ValueError(
            f"rows={rows} must be a multiple of env_block*n_tokens="
            f"{env_block * n_tokens}")
    if not interpret and jax.default_backend() != "tpu":
        return _attention_reference(qkv, n_tokens, heads)
    return _kernel_call(qkv, n_tokens, heads, env_block, interpret)


def _fsa_fwd(qkv, n_tokens, heads, env_block, interpret, bwd_kernel):
    return (fused_short_attention(qkv, n_tokens, heads, env_block,
                                  interpret, bwd_kernel), qkv)


def _fsa_bwd(n_tokens, heads, env_block, interpret, bwd_kernel, qkv, g):
    on_tpu = interpret or jax.default_backend() == "tpu"
    if bwd_kernel and on_tpu:
        return (_bwd_kernel_call(qkv, g, n_tokens, heads, env_block,
                                 interpret),)
    _, vjp = jax.vjp(
        lambda x: _attention_reference(x, n_tokens, heads), qkv)
    return vjp(g)


fused_short_attention.defvjp(_fsa_fwd, _fsa_bwd)


def attention_ok(rows: int, n_tokens: int,
                 env_block: int = DEF_ENV_BLOCK) -> bool:
    """Whether the kernel's tiling constraint holds for this batch."""
    return rows % n_tokens == 0 and (rows // n_tokens) % env_block == 0


# ---------------------------------------------------------------------------
# Mesh-sharded wrapper (docs/DESIGN.md roadmap item): GSPMD cannot partition
# a pallas_call — under pjit auto-sharding it REPLICATES the op (all-gather
# the input, full batch on every chip; verified on the CPU mesh, round 4).
# The fix is the same recipe as the env step (parallel/shard_step.py): run
# the kernel per shard inside an explicit shard_map over the data axes.
# make_train sets the active mesh for the duration of a mesh-training run
# (set/restore around train()); everything else sees ctx None and the plain
# single-device call.  Attention is per-env math, so sharding the row axis
# at env boundaries is bit-equal to the unsharded call.

import threading as _threading

_MESH_TLS = _threading.local()   # .ctx: None | (Mesh, axis-name-or-tuple)


def _mesh_ctx():
    return getattr(_MESH_TLS, "ctx", None)


def set_attention_mesh(mesh, axis=None):
    """Activate mesh-sharded attention; returns the previous context for
    ``restore_attention_mesh``.  ``mesh=None`` (or size 1) deactivates.

    HAZARD — the context is consulted at TRACE time, not call time: a
    callable jitted *before* this call keeps its unsharded trace (the
    GSPMD-replicated pallas_call) in the jit cache afterwards.  Set the
    context before any trace that should shard (make_train does: it wraps
    the whole train() body).  The context is thread-local, so concurrent
    make_train runs in different threads cannot clobber each other.

    With no ``data``/``*_data`` axis on the mesh (pure tensor-parallel),
    the context DEACTIVATES: env rows are replicated on such a mesh, so
    the plain call is already correct — and this mirrors
    ``parallel.mesh.data_axis_names``, the one shared definition of which
    axes carry envs (shard_step errors there instead, because an unsharded
    env *step* on a >1-device mesh is a real configuration bug).
    """
    prev = _mesh_ctx()
    if mesh is None or getattr(mesh, "size", 1) <= 1:
        _MESH_TLS.ctx = None
        return prev
    if axis is None:
        from vit_marl_tpu.parallel.mesh import data_axis_names
        axis = data_axis_names(mesh)
        if not axis:
            _MESH_TLS.ctx = None
            return prev
    if isinstance(axis, (tuple, list)) and len(axis) == 1:
        axis = axis[0]
    _MESH_TLS.ctx = (mesh, axis)
    return prev


def restore_attention_mesh(prev) -> None:
    _MESH_TLS.ctx = prev


def mesh_attention_ok(rows: int, n_tokens: int,
                      env_block: int = DEF_ENV_BLOCK) -> bool:
    """``attention_ok`` for the active context: with a mesh, every shard's
    LOCAL rows must satisfy the kernel tiling (and rows must split evenly
    at env boundaries over the data axes)."""
    ctx = _mesh_ctx()
    if ctx is None:
        return attention_ok(rows, n_tokens, env_block)
    mesh, axis = ctx
    names = axis if isinstance(axis, tuple) else (axis,)
    nd = 1
    for a in names:
        nd *= mesh.shape[a]
    return rows % nd == 0 and attention_ok(rows // nd, n_tokens, env_block)


def short_attention(qkv: Array, n_tokens: int, heads: int,
                    bwd_kernel: bool = True,
                    env_block: int = DEF_ENV_BLOCK) -> Array:
    """``fused_short_attention``, shard_mapped over the active mesh context
    (if any).  Callers gate on ``mesh_attention_ok`` first (with the same
    ``env_block``)."""
    ctx = _mesh_ctx()
    if ctx is None:
        return fused_short_attention(qkv, n_tokens, heads, env_block,
                                     bwd_kernel=bwd_kernel)
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    mesh, axis = ctx
    f = shard_map(
        lambda x: fused_short_attention(x, n_tokens, heads, env_block,
                                        False, bwd_kernel),
        mesh=mesh, in_specs=P(axis), out_specs=P(axis), check_rep=False)
    return f(qkv)
