"""Stage decomposition of the ViT forward at bench shapes (VERDICT r2 #2).

Times jitted sub-stacks of the ViT-Small forward at B envs so the 58 ms
headline can be attributed (attention vs MLP vs LN/embed) and compared to
the bf16 roofline.  Methodology per CLAUDE.md: every timing varies its
input each iteration (the axon relay dedupes identical executions) and
ends with a real host fetch (block_until_ready can lie).

Usage:  python tools/profile_vit.py [--envs 8192] [--preset small]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# runnable as `python tools/profile_vit.py` from the repo root: put the
# repo root (not tools/) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn


def timed(fn, x, reps=10, warmup=2, inner=8):
    """Median seconds per call, pipelined ``inner`` calls per sync.

    Two relay gotchas shape this (CLAUDE.md #2/#2b, both hit this round):
    - the relay dedupes executions with bit-identical inputs, so every
      call gets its own pre-perturbed input (compounding (1 + 1e-4)
      factors — an additive epsilon would vanish below half-ULP);
    - a sync costs a full HTTP round trip (~60 ms floor observed:
      runs/r4/ first rerun reported ~62 ms for ln/mlp/attn stacks with
      100x different FLOPs), and device_get of a full output drags the
      tensor through the ~20 MB/s tunnel (first run: 17 s/call;
      *.tunnelbound).  So: dispatch ``inner`` async calls back-to-back,
      then fetch ONE on-device scalar — the single TPU stream executes
      in order, so the fetch returning means all ``inner`` are done.
    """
    fn = jax.jit(fn)
    # the fetched scalar depends on EVERY output (not just the last), so
    # the timing is valid even if the relay reorders independent requests
    sync = jax.jit(lambda os: sum(jnp.sum(jax.tree.leaves(o)[0])
                                  for o in os))
    perturb = lambda t, i: jax.tree.map(
        lambda v: (v * (1.0 + 1e-4) ** (i + 1)).astype(v.dtype)
        if jnp.issubdtype(v.dtype, jnp.floating) else v, t)
    xs = [perturb(x, i) for i in range(inner)]
    jax.block_until_ready(xs)
    out = fn(x)                                   # compile fn
    float(jax.device_get(sync([out])))
    # the wide sync over `inner` outputs compiles during the warmup reps
    ts = []
    for r in range(reps + warmup):
        t0 = time.time()
        outs = [fn(xi) for xi in xs]
        float(jax.device_get(sync(outs)))
        ts.append((time.time() - t0) / inner)
        xs = [perturb(xi, r) for xi in xs]        # fresh bits every rep
    ts = sorted(ts[warmup:])
    return ts[len(ts) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=8192)
    p.add_argument("--preset", default="small")
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke runs; env vars alone "
                        "cannot override the axon plugin)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vit_marl_tpu.models import VIT_PRESETS, ViTActorCriticRNN
    from vit_marl_tpu.models.rnn import ScannedGRU
    from vit_marl_tpu.models.vit import MHA, Block, ViTConfig, ViTEncoder
    from vit_marl_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    B = args.envs
    cfg: ViTConfig = VIT_PRESETS[args.preset]
    # forward-only timings; pin attn_kernel OFF so the "vit_encoder"
    # baseline row measures the XLA attention path regardless of the
    # preset default (attn_kernel went default-ON in round 4 — the first
    # post-flip profile run silently measured kernel-vs-kernel)
    cfg = dataclasses.replace(cfg, remat=False, attn_kernel=False)
    N = 11  # 10 levels + CLS
    W = cfg.width
    key = jax.random.PRNGKey(0)
    dtype = jnp.dtype(cfg.compute_dtype)

    results = {}

    # ---- full policy forward (the bench configuration) ----
    net = ViTActorCriticRNN(action_dim=3, vit=cfg, fc_dim=64, hidden_size=64,
                            continuous=True,
                            action_low=jnp.array([-1.0, 0.0, 0.0]),
                            action_high=jnp.array([3.0, 1.0, 1.0]))
    obs = {"obs": jax.random.normal(key, (1, B, 28), jnp.float32),
           "vision_obs": jax.random.normal(key, (1, B, 10, 3, 2),
                                           jnp.float32)}
    dones = jnp.zeros((1, B), jnp.float32)
    h0 = ScannedGRU.initialize_carry(B, 64)
    params = net.init(key, h0, (obs, dones))

    def full_fwd(o):
        h2, pi, v = net.apply(params, h0, (o, dones))
        return pi.mode()

    results["full_policy_fwd"] = timed(full_fwd, obs, args.reps)

    # ---- encoder alone (plain and fused-block halves) ----
    enc = ViTEncoder(cfg)
    img = jax.random.normal(key, (B, 10, 3, 2), jnp.float32)
    eparams = enc.init(key, img)
    results["vit_encoder"] = timed(lambda im: enc.apply(eparams, im), img,
                                   args.reps)
    encf = ViTEncoder(dataclasses.replace(cfg, fused_block=True))
    efparams = encf.init(key, img)
    results["vit_encoder_fusedblock"] = timed(
        lambda im: encf.apply(efparams, im), img, args.reps)
    # fully-fused block (attention included, one kernel/block); same param
    # tree as fused_block.  Gate on the kernel's real engagement predicate
    # (width/hidden VMEM guards included) so a fallback run is never timed
    # under the fused label.  try/except: a VMEM overflow at this width
    # should skip the A/B, not kill the whole profile run
    from vit_marl_tpu.ops.block_kernel import full_block_ok
    if full_block_ok(B * 11, 11, cfg.width, cfg.heads,
                     cfg.width * cfg.mlp_ratio):
        try:
            encff = ViTEncoder(dataclasses.replace(cfg, fused_block_full=True))
            results["vit_encoder_fusedblockfull"] = timed(
                lambda im: encff.apply(efparams, im), img, args.reps)
        except Exception as e:  # pragma: no cover - hardware-dependent
            print(f"skip fused-block-full A/B: {type(e).__name__}: {e}")
    else:
        print(f"skip fused-block-full A/B: envs={B}/width={cfg.width} "
              "cannot engage the kernel")
    # rank-3 token layout A/B: rows_2d (the default) runs LN/MLP/residual on
    # flat unpadded (B*N, W) rows; rank-3 (B, 11, W) pads sublanes 11->16
    enc3 = ViTEncoder(dataclasses.replace(cfg, rows_2d=False))
    results["vit_encoder_rank3"] = timed(
        lambda im: enc3.apply(eparams, im), img, args.reps)
    # fused short-seq attention kernel A/B (same param tree as the default)
    from vit_marl_tpu.ops.attention_kernel import attention_ok
    if attention_ok(B * 11, 11):
        enck = ViTEncoder(dataclasses.replace(cfg, attn_kernel=True))
        results["vit_encoder_attnkernel"] = timed(
            lambda im: enck.apply(eparams, im), img, args.reps)
    else:
        print(f"skip attn-kernel A/B: envs={B} not a 64-multiple")
    # LN1+QKV+attention fold A/B (fused-family param tree: init separately)
    from vit_marl_tpu.ops.block_kernel import ln_qkv_attn_ok
    if ln_qkv_attn_ok(B * 11, 11, cfg.width, cfg.heads):
        encl = ViTEncoder(dataclasses.replace(cfg, attn_ln_fold=True))
        elparams = encl.init(key, img)
        results["vit_encoder_lnfold"] = timed(
            lambda im: encl.apply(elparams, im), img, args.reps)
        # ... and fwd+bwd, the training-relevant direction
        def lf_grad(im):
            g = jax.grad(lambda p: jnp.sum(
                encl.apply(p, im).astype(jnp.float32) ** 2))(elparams)
            return sum(jnp.vdot(x, x).real
                       for x in jax.tree.leaves(g)).astype(jnp.float32)
        results["vit_encoder_fwdbwd_lnfold"] = timed(lf_grad, img, args.reps)
    # attention BACKWARD kernel A/B: encoder fwd+bwd (grad wrt params)
    # with the Pallas dqkv kernel vs the XLA recompute-and-differentiate
    # custom-vjp backward (both use the forward attention kernel)
    if attention_ok(B * 11, 11):
        def grad_norm(enc_mod):
            def f(im):
                g = jax.grad(lambda p: jnp.sum(
                    enc_mod.apply(p, im).astype(jnp.float32) ** 2))(eparams)
                # scalar result keeps the timing sync cheap (CLAUDE.md 2b)
                return sum(jnp.vdot(x, x).real
                           for x in jax.tree.leaves(g)).astype(jnp.float32)
            return f
        enck_b = ViTEncoder(dataclasses.replace(
            cfg, attn_kernel=True, attn_bwd_kernel=True))
        enck_x = ViTEncoder(dataclasses.replace(
            cfg, attn_kernel=True, attn_bwd_kernel=False))
        results["vit_encoder_fwdbwd_bwdkernel"] = timed(
            grad_norm(enck_b), img, args.reps)
        results["vit_encoder_fwdbwd_xlabwd"] = timed(
            grad_norm(enck_x), img, args.reps)

    # ---- 12x attention sub-stack (LN + MHA + residual) ----
    class AttnStack(nn.Module):
        cfg: ViTConfig

        @nn.compact
        def __call__(self, x):
            for i in range(self.cfg.depth):
                h = nn.LayerNorm(dtype=jnp.float32)(x).astype(dtype)
                x = x + MHA(self.cfg, name=f"attn{i}")(h)
            return x.astype(jnp.float32)

    xtok = jax.random.normal(key, (B, N, W), jnp.float32)
    astack = AttnStack(cfg)
    aparams = astack.init(key, xtok)
    results["attn_stack_x12"] = timed(lambda x: astack.apply(aparams, x),
                                      xtok, args.reps)

    # ---- 12x MLP sub-stack (LN + MLP + residual) ----
    class MLPStack(nn.Module):
        # NOTE: mirrors Block's MLP branch (models/vit.py) without the
        # attention half so the MLP cost is isolated.
        cfg: ViTConfig

        @nn.compact
        def __call__(self, x):
            c = self.cfg
            for i in range(c.depth):
                h = nn.LayerNorm(dtype=jnp.float32,
                                 name=f"ln{i}")(x).astype(dtype)
                h = nn.Dense(W * c.mlp_ratio, dtype=dtype,
                             name=f"mlp1_{i}")(h)
                h = nn.gelu(h)
                h = nn.Dense(W, dtype=dtype, name=f"mlp2_{i}")(h)
                x = x + h
            return x.astype(jnp.float32)

    mstack = MLPStack(cfg)
    mparams = mstack.init(key, xtok)
    results["mlp_stack_x12"] = timed(
        lambda x, m=mstack, p=mparams: m.apply(p, x), xtok, args.reps)

    # ---- LN-only stack (the f32 islands) ----
    class LNStack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(cfg.depth * 2):
                x = nn.LayerNorm(dtype=jnp.float32)(x)
            return x

    lstack = LNStack()
    lparams = lstack.init(key, xtok)
    results["ln_stack_x24"] = timed(lambda x: lstack.apply(lparams, x),
                                    xtok, args.reps)

    # ---- roofline ----
    # per block: qkv 2*3*N*W^2 + proj 2*N*W^2 + mlp 2*2*N*W*4W = (6+2+16)*N*W^2
    flops_env = cfg.depth * (6 + 2 + 16) * N * W * W
    total_tflop = flops_env * B / 1e12
    peak_bf16 = 197.0  # v5e TFLOP/s
    print(f"\n# {args.preset} B={B} N={N} W={W}: {flops_env/1e6:.0f} MFLOP/env, "
          f"{total_tflop:.2f} TFLOP/fwd, bf16 roofline "
          f"{total_tflop/peak_bf16*1e3:.1f} ms")
    for k, v in results.items():
        mfu = total_tflop / peak_bf16 / v if k in ("full_policy_fwd",
                                                   "vit_encoder") else float("nan")
        print(f"{k:24s} {v*1e3:8.2f} ms" +
              (f"   MFU={mfu*100:.0f}%" if mfu == mfu else ""))
    print(f"# device={jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
