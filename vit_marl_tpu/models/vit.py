"""ViT encoder over the order-book image + fused recurrent actor-critic.

This closes the reference's declared-but-missing vision path: the fork emits
``vision_obs`` book images and names itself ViT-MARL, but its training
scripts never consume the image (ref: ippo_rnn_JAXMARL.py:75 "FIXME: APPLY
VISION"; networks/vision_agent.py is an unused, non-functional stub;
networks/gate_fusion.py is an empty file).

Design (TPU-first):

- The book image ``(levels, 3, 2)`` — (gap-to-mid ticks, log1p vol, log1p
  cumvol) x (ask, bid) — is a *short sequence*: each level is one token of
  6 features.  A learned linear patch-embed lifts tokens to the model dim;
  a CLS token aggregates.  No host-side preprocessing: the rasterized image
  comes straight from the engine's vision snapshot, on device.
- Pre-LN transformer blocks, fused QKV projection, GELU MLP; all matmuls
  can run in bfloat16 with fp32 parameters and fp32 outputs
  (``compute_dtype``) — MXU-friendly while keeping logit fidelity.
- Sequence length is tiny (<= ~200 even at deep books), so attention is a
  plain dense softmax; the attention function is factored out so a Pallas
  flash/splash kernel can be substituted if images ever grow.

Presets follow standard ViT widths: tiny=192/3H, small=384/6H, base=768/12H,
12 blocks each (depth configurable).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen.initializers import constant, orthogonal

from vit_marl_tpu.models.distributions import Categorical, SquashedNormal
from vit_marl_tpu.models.rnn import ScannedGRU

Array = jax.Array


@dataclass(frozen=True)
class ViTConfig:
    width: int = 192
    depth: int = 12
    heads: int = 3
    mlp_ratio: int = 4
    compute_dtype: str = "bfloat16"   # matmul dtype; params/outputs fp32
    # rematerialise each block's activations in backward: PPO updates push
    # T*B images through fwd+bwd at once (e.g. 131k at 1024 envs x 128
    # steps), whose saved activations exceed HBM without remat
    remat: bool = True
    # fused block halves (ops/block_kernel.py): LN1+QKV in one kernel,
    # proj+residual+LN2+MLP+residual in another — attention stays in XLA.
    # Roughly halves per-block HBM traffic.  Default OFF pending hardware
    # measurement; NOTE the param tree differs from the unfused Block
    # (raw kernels instead of Dense submodules), so checkpoints don't
    # interchange between modes.
    fused_block: bool = False
    # fully-fused block (ops/block_kernel.py::fused_block_full): LN1, QKV,
    # the short-seq attention body, projection, both residuals, LN2 and the
    # MLP all in ONE kernel — only x in / x' out touch HBM (the half-split
    # above still round-trips qkv + attn_out, ~830 MB/block @ 8192 envs).
    # Same param tree as fused_block (checkpoints interchange between the
    # two fused modes).  Needs rows grouped by env (rows_2d) and
    # envs % 64 == 0; falls back to the composed XLA reference otherwise.
    # Default OFF pending hardware measurement.  Takes precedence over
    # fused_block.
    fused_block_full: bool = False
    # run LN / residual / MLP / projection on flat (B*N, W) rows instead of
    # (B, N, W) tokens.  TPU tiling pads the second-to-minor dim to the
    # sublane count (8 for f32, 16 for bf16), so rank-3 activations with
    # N=11 tokens waste ~31-45% of the bandwidth of every elementwise op;
    # flat rows are unpadded.  Attention still sees (B, N, H, D) — the
    # reshape in/out of the attention core exists in both layouts.  Math
    # (and the param tree) is identical either way.
    rows_2d: bool = True
    # Pallas fused short-seq attention (ops/attention_kernel.py): the XLA
    # path materialises (B, N, N, H) logits/weights whose (16, 128) tile
    # padding is a ~31x HBM blowup at N=11/H=6; the kernel keeps them in
    # VMEM and exchanges only unpadded flat rows.  Needs rows_2d, N <= 32
    # and batch % 64 == 0 (falls back to the XLA path otherwise).
    # Default ON: measured +33% end-to-end on hardware — 130,514 vs
    # 97,765 env-steps/s on the vit-small bench @ 8192 envs
    # (runs/r4/bench_vit_attnkernel.txt vs bench_vit.txt).  NOTE for
    # multi-chip meshes: the kernel is batch-parallel; shard the env/batch
    # axis so each shard's row count stays a 64*N multiple (the per-shard
    # fallback otherwise silently reverts to the XLA path).
    attn_kernel: bool = True
    # Pallas backward for the fused attention (same kernel file): the
    # custom-vjp backward otherwise recomputes attention in XLA and
    # differentiates it — paying the (B, N, N, H) tile-padding blowup
    # twice (recompute + gradient) in every PPO update.  The backward
    # kernel recomputes flash-style in VMEM and emits dqkv directly.
    # Only consulted when attn_kernel engages; same fallbacks.
    attn_bwd_kernel: bool = True
    # envs per attention-kernel grid step (R = env_block * N rows resident
    # in VMEM).  64 is the measured sweet spot on v5e; small values let
    # tests drive the kernel path on tiny per-shard batches (the tiling
    # gate needs local_envs % env_block == 0).
    attn_env_block: int = 64
    # fold LN1 + the QKV projection INTO the attention kernel
    # (ops/block_kernel.py::fused_ln_qkv_attn): LN1's output and the
    # (rows, 3W) qkv never touch HBM (~550 MB/block saved @ 8192 envs,
    # ViT-Small), while proj/LN2/MLP stay in XLA so the cls_only
    # last-block trick still applies — the middle ground between the
    # attention kernel and the fully-fused block (which lost its A/B).
    # NOTE: uses the fused-family param tree (raw kernel params, like
    # fused_block); checkpoints interchange with the fused modes via
    # models/convert.py, not with the unfused Dense tree.  Takes
    # precedence over attn_kernel; fused_block/fused_block_full take
    # precedence over it.  Mesh-composable: under an active attention
    # mesh context the call is shard_mapped per shard
    # (ops/block_kernel.py::short_ln_qkv_attn).  Default OFF pending
    # hardware measurement.
    attn_ln_fold: bool = False


VIT_PRESETS = {
    "micro": ViTConfig(width=64, depth=2, heads=2),
    "tiny": ViTConfig(width=192, depth=12, heads=3),
    "small": ViTConfig(width=384, depth=12, heads=6),
    "base": ViTConfig(width=768, depth=12, heads=12),
}


def attention_nhd(qkv: Array, dtype) -> Array:
    """Short-sequence attention in the native ``(B, N, 3, H, D)`` layout.

    For book images (N ~ levels + 1) the einsum form lowers to B*H tiny
    batched MXU matmuls (e.g. 49k instances of 11x64x11 at 8192 envs), each
    wasting the 128x128 systolic array — measured 117 ms of a 152 ms
    ViT-Small forward.  A broadcast-multiply-reduce keeps the work on the
    VPU — and staying in the (B, N, H, D) layout the QKV projection already
    produced avoids the four (B·N·W)-element transposes per block that the
    canonical (B, H, N, D) layout costs (the output reshape to (B, N, W) is
    then free: H·D are the contiguous minor dims).

    Returns (B, N, H, D).
    """
    q = qkv[:, :, 0]                      # (B, N, H, D), contiguous slices
    k = qkv[:, :, 1]
    v = qkv[:, :, 2]
    scale = q.shape[-1] ** -0.5
    # dtype=f32 keeps the accumulation f32 like the einsum path's
    # preferred_element_type (a 64-term bf16 tree-sum drifts ~0.4%)
    logits = jnp.sum((q * scale)[:, :, None, :, :] * k[:, None, :, :, :],
                     axis=-1, dtype=jnp.float32)     # (B, Nq, Nk, H)
    weights = jax.nn.softmax(logits, axis=2).astype(dtype)
    return jnp.sum(weights[..., None] * v[:, None, :, :, :], axis=2)


def dot_product_attention(q: Array, k: Array, v: Array, dtype) -> Array:
    """(B, H, N, D) attention on the MXU.  Used for long sequences; the
    seam for a Pallas flash kernel if images ever grow past VMEM."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                      preferred_element_type=jnp.float32).astype(dtype)


class MHA(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: Array, n_tokens: Optional[int] = None) -> Array:
        """x: (B, N, W) tokens, or flat (B*N, W) rows with ``n_tokens=N``
        (rows_2d layout).  Output matches the input rank; the param tree is
        identical in both layouts."""
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        if x.ndim == 2:
            if n_tokens is None:
                raise ValueError(
                    "flat (B*N, W) rows need n_tokens= (the rows_2d "
                    "layout cannot infer the token count from the shape)")
            N = n_tokens
            B, W = x.shape[0] // N, x.shape[1]
        else:
            B, N, W = x.shape
        head_dim = W // c.heads
        qkv = nn.Dense(3 * W, dtype=dtype, name="qkv")(x)
        if c.attn_kernel and x.ndim == 2 and N <= 32:
            from vit_marl_tpu.ops.attention_kernel import (
                mesh_attention_ok,
                short_attention,
            )
            if mesh_attention_ok(B * N, N, c.attn_env_block):
                # qkv is already the kernel's flat (B*N, 3W) layout;
                # off-TPU the call falls back to XLA internally.  Under an
                # active mesh context (make_train with a mesh) the call is
                # shard_mapped over the data axes so the kernel runs per
                # shard — GSPMD would otherwise replicate the pallas_call
                out = short_attention(
                    qkv, N, c.heads, bwd_kernel=c.attn_bwd_kernel,
                    env_block=c.attn_env_block)
                return nn.Dense(W, dtype=dtype, name="proj")(out)
        qkv = qkv.reshape(B, N, 3, c.heads, head_dim)
        if N <= 32:
            out = attention_nhd(qkv, dtype)          # (B, N, H, D), no moves
        else:
            q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
            out = jnp.moveaxis(dot_product_attention(q, k, v, dtype), 1, 2)
        out = out.reshape((B * N, W) if x.ndim == 2 else (B, N, W))
        return nn.Dense(W, dtype=dtype, name="proj")(out)


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: Array, n_tokens: Optional[int] = None,
                 cls_only: bool = False) -> Array:
        """x: (B, N, W) tokens, or flat (B*N, W) rows with ``n_tokens=N``
        (the rows_2d layout — see ViTConfig.rows_2d).

        ``cls_only``: run LN2+MLP on the CLS rows only and return (B, W).
        Everything after the last block's attention influences nothing but
        the CLS output, so the encoder sets this on its final block —
        skipping 10/11 of that block's MLP (the block's FLOP majority) at
        bit-identical CLS math (per-row ops; same params either way).
        Not supported on the fused-block paths (they keep full rows)."""
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        if c.fused_block or c.fused_block_full:
            return self._fused_block(x, dtype, n_tokens)
        if c.attn_ln_fold:
            # param structure is decided by CONFIG alone (flax needs init
            # and apply to declare the same tree); ineligible shapes fall
            # back to the composed XLA reference INSIDE the call with the
            # same raw params, and an active mesh context shard_maps the
            # kernel per shard (short_ln_qkv_attn)
            return self._attn_ln_fold_block(x, dtype, n_tokens, cls_only)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln1")(x).astype(dtype)
        x = x + MHA(c, name="attn")(h, n_tokens)
        if cls_only:
            # CLS is token 0 of every env (see ViTEncoder.__call__)
            x = (x.reshape(-1, n_tokens, x.shape[-1])[:, 0]
                 if x.ndim == 2 else x[:, 0])
        h = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x).astype(dtype)
        h = nn.Dense(c.width * c.mlp_ratio, dtype=dtype, name="mlp1")(h)
        h = nn.gelu(h)
        h = nn.Dense(c.width, dtype=dtype, name="mlp2")(h)
        return x + h

    def _attn_ln_fold_block(self, x: Array, dtype,
                            n_tokens: Optional[int], cls_only: bool) -> Array:
        """LN1+QKV+attention in one kernel (ops/block_kernel.py::
        fused_ln_qkv_attn); proj / residual / LN2 / MLP / residual in XLA
        with the same math as ``_full_block_kernel``'s tail — so the
        ``cls_only`` last-block trick still applies.  Raw fused-family
        params (same names as ``_fused_block``; checkpoints interchange
        via models/convert.py)."""
        from vit_marl_tpu.ops.block_kernel import _gelu, _ln, short_ln_qkv_attn

        c = self.cfg
        if x.ndim != 2:
            raise ValueError("attn_ln_fold requires the rows_2d layout")
        N = n_tokens
        W = x.shape[1]
        init = nn.initializers.lecun_normal()
        ones, zeros = nn.initializers.ones, nn.initializers.zeros
        g1 = self.param("ln1_scale", ones, (W,))
        b1 = self.param("ln1_bias", zeros, (W,))
        wqkv = self.param("qkv_kernel", init, (W, 3 * W))
        bqkv = self.param("qkv_bias", zeros, (3 * W,))
        wp = self.param("proj_kernel", init, (W, W))
        bp = self.param("proj_bias", zeros, (W,))
        g2 = self.param("ln2_scale", ones, (W,))
        b2 = self.param("ln2_bias", zeros, (W,))
        w1 = self.param("mlp1_kernel", init, (W, W * c.mlp_ratio))
        bm1 = self.param("mlp1_bias", zeros, (W * c.mlp_ratio,))
        w2 = self.param("mlp2_kernel", init, (W * c.mlp_ratio, W))
        bm2 = self.param("mlp2_bias", zeros, (W,))

        xf = x.astype(dtype)
        attn = short_ln_qkv_attn(xf, g1, b1, wqkv.astype(dtype), bqkv, N,
                                 c.heads, c.attn_env_block,
                                 bwd_kernel=c.attn_bwd_kernel)
        proj = jnp.dot(attn, wp.astype(dtype),
                       preferred_element_type=jnp.float32)
        x1 = xf + (proj + bp.astype(jnp.float32)).astype(dtype)
        if cls_only:
            x1 = x1.reshape(-1, N, W)[:, 0]
        h2 = _ln(x1, g2, b2).astype(dtype)
        hid = jnp.dot(h2, w1.astype(dtype),
                      preferred_element_type=jnp.float32)
        hid = _gelu((hid + bm1.astype(jnp.float32)).astype(dtype))
        mlp = jnp.dot(hid, w2.astype(dtype),
                      preferred_element_type=jnp.float32)
        return x1 + (mlp + bm2.astype(jnp.float32)).astype(dtype)

    def _fused_block(self, x: Array, dtype,
                     n_tokens: Optional[int] = None) -> Array:
        """Pallas block halves (ops/block_kernel.py): LN1+QKV fused, XLA
        attention, then proj+residual+LN2+MLP+residual fused.  Same math
        as the unfused path (LN f32 stats, f32-accumulated matmuls).
        With ``fused_block_full`` the whole block (attention included)
        runs in one kernel instead — same param tree."""
        from vit_marl_tpu.ops.block_kernel import (
            fused_block_full,
            fused_ln_qkv,
            fused_proj_mlp,
        )

        c = self.cfg
        if x.ndim == 2:
            if n_tokens is None:
                raise ValueError(
                    "flat (B*N, W) rows need n_tokens= (the rows_2d "
                    "layout cannot infer the token count from the shape)")
            N = n_tokens
            B, W = x.shape[0] // N, x.shape[1]
        else:
            B, N, W = x.shape
        H = c.heads
        init = nn.initializers.lecun_normal()
        ones, zeros = nn.initializers.ones, nn.initializers.zeros
        g1 = self.param("ln1_scale", ones, (W,))
        b1 = self.param("ln1_bias", zeros, (W,))
        wqkv = self.param("qkv_kernel", init, (W, 3 * W))
        bqkv = self.param("qkv_bias", zeros, (3 * W,))
        wp = self.param("proj_kernel", init, (W, W))
        bp = self.param("proj_bias", zeros, (W,))
        g2 = self.param("ln2_scale", ones, (W,))
        b2 = self.param("ln2_bias", zeros, (W,))
        w1 = self.param("mlp1_kernel", init, (W, W * c.mlp_ratio))
        bm1 = self.param("mlp1_bias", zeros, (W * c.mlp_ratio,))
        w2 = self.param("mlp2_kernel", init, (W * c.mlp_ratio, W))
        bm2 = self.param("mlp2_bias", zeros, (W,))

        xf = x.reshape(B * N, W).astype(dtype)
        if c.fused_block_full:
            out = fused_block_full(
                xf, g1, b1, wqkv.astype(dtype), bqkv, wp.astype(dtype), bp,
                g2, b2, w1.astype(dtype), bm1, w2.astype(dtype), bm2, N, H)
            return out if x.ndim == 2 else out.reshape(B, N, W)
        qkv = fused_ln_qkv(xf, g1, b1, wqkv.astype(dtype), bqkv, False)
        qkv = qkv.reshape(B, N, 3, H, W // H)
        if N <= 32:
            attn = attention_nhd(qkv, dtype)
        else:
            q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
            attn = jnp.moveaxis(dot_product_attention(q, k, v, dtype), 1, 2)
        attn = attn.reshape(B * N, W).astype(dtype)
        out = fused_proj_mlp(attn, xf, wp.astype(dtype), bp, g2, b2,
                             w1.astype(dtype), bm1, w2.astype(dtype), bm2,
                             False)
        return out if x.ndim == 2 else out.reshape(B, N, W)


class ViTEncoder(nn.Module):
    """Book image (..., levels, feats, channels) -> (..., width) fp32."""

    cfg: ViTConfig = ViTConfig()

    @nn.compact
    def __call__(self, image: Array) -> Array:
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        lead = image.shape[:-3]
        levels = image.shape[-3]
        feat = image.shape[-2] * image.shape[-1]
        x = image.reshape((-1, levels, feat)).astype(jnp.float32)

        # token embed + learned positions + CLS
        x = nn.Dense(c.width, name="patch_embed")(x).astype(dtype)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, levels + 1, c.width))
        cls = self.param("cls", nn.initializers.normal(0.02), (1, 1, c.width))
        cls = jnp.broadcast_to(cls, (x.shape[0], 1, c.width)).astype(dtype)
        x = jnp.concatenate([cls, x], axis=1) + pos.astype(dtype)

        n_tokens = levels + 1
        if c.rows_2d:
            # flat (B*N, W) rows: unpadded TPU tiles for every LN/residual/
            # MLP op (rank-3 N=11 pads the sublane dim to 16)
            x = x.reshape(-1, c.width)
        block_cls = (nn.remat(Block, static_argnums=(2, 3)) if c.remat
                     else Block)
        # the last block computes LN2+MLP for the CLS rows only (the rest
        # influence nothing downstream) — except on the fused-block paths,
        # whose kernels process full rows
        cls_short = not (c.fused_block or c.fused_block_full)
        for i in range(c.depth):
            last = cls_short and i == c.depth - 1
            x = block_cls(c, name=f"block{i}")(x, n_tokens, last)
        if not cls_short:
            if c.rows_2d:
                x = x.reshape(-1, n_tokens, c.width)
            x = x[:, 0]
        # final LN commutes with the CLS slice (LN is per-token); with
        # cls_short the last block already returned (B, W) CLS rows
        out = nn.LayerNorm(dtype=jnp.float32, name="ln_f")(x)
        out = out.astype(jnp.float32)               # CLS token
        return out.reshape(lead + (c.width,))


class GateFusion(nn.Module):
    """Gated fusion of the vision embedding with the flat feature embedding
    (a working realisation of the reference's empty ``gate_fusion.py``
    placeholder, ref: networks/gate_fusion.py)."""

    out_dim: int

    @nn.compact
    def __call__(self, vision: Array, flat: Array) -> Array:
        v = nn.Dense(self.out_dim, name="v_proj")(vision)
        f = nn.Dense(self.out_dim, name="f_proj")(flat)
        gate = nn.sigmoid(nn.Dense(self.out_dim, name="gate")(
            jnp.concatenate([v, f], axis=-1)))
        return gate * v + (1 - gate) * f


class ViTActorCriticRNN(nn.Module):
    """Recurrent actor-critic consuming ``{"obs", "vision_obs"}`` dicts.

    vision_obs -> ViT CLS embedding; obs -> Dense embedding; gated fusion
    -> GRU -> actor/critic heads (same head structure and inits as
    :class:`ActorCriticRNN` for comparability).
    """

    action_dim: int
    vit: ViTConfig = ViTConfig()
    fc_dim: int = 64
    hidden_size: int = 64
    continuous: bool = False
    action_low: Optional[Array] = None
    action_high: Optional[Array] = None

    @nn.compact
    def __call__(self, hidden, x) -> Tuple[Array, object, Array]:
        obs, dones = x
        flat, image = obs["obs"], obs["vision_obs"]

        vision_emb = ViTEncoder(self.vit, name="vit")(image)
        flat_emb = nn.Dense(self.fc_dim, kernel_init=orthogonal(jnp.sqrt(2)),
                            bias_init=constant(0.0), name="flat_embed")(flat)
        flat_emb = nn.relu(flat_emb)
        embedding = GateFusion(self.fc_dim, name="fusion")(vision_emb, flat_emb)
        embedding = nn.relu(embedding)

        hidden, embedding = ScannedGRU()(hidden, (embedding, dones))

        actor = nn.Dense(self.hidden_size, kernel_init=orthogonal(2),
                         bias_init=constant(0.0))(embedding)
        actor = nn.relu(actor)
        actor_out = nn.Dense(self.action_dim, kernel_init=orthogonal(0.01),
                             bias_init=constant(0.0))(actor)
        if self.continuous:
            log_std = self.param("log_std", constant(0.0), (self.action_dim,))
            pi = SquashedNormal(actor_out, log_std,
                                jnp.asarray(self.action_low),
                                jnp.asarray(self.action_high))
        else:
            pi = Categorical(logits=actor_out)

        critic = nn.Dense(self.fc_dim, kernel_init=orthogonal(2),
                          bias_init=constant(0.0))(embedding)
        critic = nn.relu(critic)
        critic = nn.Dense(1, kernel_init=orthogonal(1.0),
                          bias_init=constant(0.0))(critic)
        return hidden, pi, jnp.squeeze(critic, axis=-1)
