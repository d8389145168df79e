"""Kernel-level A/B microbenchmarks: each Pallas kernel vs its XLA form.

Sharper and much cheaper than the end-to-end encoder A/Bs (one small
compile per side instead of a 12-block model), so a short relay window is
enough to decide every fused-kernel default.  Shapes mirror the ViT-Small
bench (8192 envs x 11 tokens, W=384).

Methodology per CLAUDE.md: inputs vary every iteration (the axon relay
dedupes identical executions) and every timing ends with a real host
fetch (``jax.block_until_ready`` can lie) — both inherited from
``tools/profile_vit.timed``.

Usage: python tools/kernel_bench.py [--envs 8192] [--width 384]
       [--heads 6] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=8192)
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--heads", type=int, default=6)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke only; every kernel "
                        "falls back to its XLA reference off-TPU, so CPU "
                        "'A/Bs' compare XLA with itself)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from tools.profile_vit import timed
    from vit_marl_tpu.ops.attention_kernel import (
        _attention_reference,
        fused_short_attention,
    )
    from vit_marl_tpu.ops.block_kernel import (
        _full_block_reference,
        _ln_qkv_reference,
        _proj_mlp_reference,
        fused_block_full,
        fused_ln_qkv,
        fused_proj_mlp,
        full_block_ok,
    )
    from vit_marl_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    N, W, H = 11, args.width, args.heads
    rows = args.envs * N
    bf16 = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)
    s = 0.05

    x = (jax.random.normal(ks[0], (rows, W)) * 0.5).astype(bf16)
    g1 = jax.random.normal(ks[1], (W,)) * 0.1 + 1.0
    b1 = jax.random.normal(ks[2], (W,)) * 0.1
    wqkv = (jax.random.normal(ks[3], (W, 3 * W)) * s).astype(bf16)
    bqkv = jax.random.normal(ks[4], (3 * W,)) * 0.1
    wp = (jax.random.normal(ks[5], (W, W)) * s).astype(bf16)
    bp = jax.random.normal(ks[6], (W,)) * 0.1
    g2 = jax.random.normal(ks[7], (W,)) * 0.1 + 1.0
    b2 = jax.random.normal(ks[8], (W,)) * 0.1
    w1 = (jax.random.normal(ks[9], (W, 4 * W)) * s).astype(bf16)
    bm1 = jax.random.normal(ks[10], (4 * W,)) * 0.1
    w2 = (jax.random.normal(ks[11], (4 * W, W)) * s).astype(bf16)
    bm2 = jax.random.normal(ks[12], (W,)) * 0.1
    qkv = (jax.random.normal(ks[13], (rows, 3 * W)) * 0.5).astype(bf16)
    attn = (jax.random.normal(ks[14], (rows, W)) * 0.5).astype(bf16)

    results = {}  # name -> (xla_s, pallas_s)

    def ab(name, xla_fn, pallas_fn, arg):
        results[name] = (timed(xla_fn, arg, args.reps),
                         timed(pallas_fn, arg, args.reps))

    ab("ln_qkv",
       lambda v: _ln_qkv_reference(v, g1, b1, wqkv, bqkv),
       lambda v: fused_ln_qkv(v, g1, b1, wqkv, bqkv, False), x)
    ab("proj_mlp",
       lambda v: _proj_mlp_reference(v, x, wp, bp, g2, b2, w1, bm1, w2, bm2),
       lambda v: fused_proj_mlp(v, x, wp, bp, g2, b2, w1, bm1, w2, bm2,
                                False), attn)
    ab("attention",
       lambda v: _attention_reference(v, N, H),
       lambda v: fused_short_attention(v, N, H), qkv)
    if full_block_ok(rows, N, W, H, 4 * W):
        ab("full_block",
           lambda v: _full_block_reference(v, g1, b1, wqkv, bqkv, wp, bp,
                                           g2, b2, w1, bm1, w2, bm2, N, H),
           lambda v: fused_block_full(v, g1, b1, wqkv, bqkv, wp, bp, g2,
                                      b2, w1, bm1, w2, bm2, N, H), x)
    else:
        print(f"skip full_block: shapes cannot engage the kernel")

    print(f"\n# kernel A/Bs @ envs={args.envs} N={N} W={W} H={H} "
          f"(rows={rows}, bf16)")
    print(f"{'kernel':12s} {'XLA ms':>9s} {'Pallas ms':>10s} {'speedup':>8s}")
    for name, (xs, ps) in results.items():
        print(f"{name:12s} {xs * 1e3:9.2f} {ps * 1e3:10.2f} "
              f"{xs / ps:7.2f}x")
    print(f"# device={jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
