"""Benchmark: vmapped LOB env-steps/sec/chip with a policy in the loop.

Measures the headline number from BASELINE.json: environment steps per
second per chip for the 2-player MARL world (market-maker + execution,
full matching-engine replay per step) with the policy forward pass in the
rollout loop.  Baseline target: 1e6 env-steps/sec/chip (v5e) with a
ViT-Small encoder in the loop.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Usage:
  python bench.py                  # full benchmark on the default device
  python bench.py --smoke          # tiny shapes, CPU-friendly sanity run
  python bench.py --policy vit-small --envs 4096
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

BASELINE_ENV_STEPS = 1_000_000.0  # north star: 1M env-steps/sec/chip


def _error_json(metric, reason, unit="env-steps/s"):
    return json.dumps({"metric": metric, "value": 0.0, "unit": unit,
                       "vs_baseline": 0.0, "error": reason})


def probe_backend(metric, timeout_s=240, unit="env-steps/s"):
    """Fail-fast TPU-availability probe.

    A wedged axon relay hangs ``jax.devices()`` (and any compile) for the
    driver's whole budget with zero output — the round-2 BENCH artifact was
    rc=1/rc=124 with an empty tail twice.  So before touching jax in this
    process, run a tiny end-to-end computation (device list + matmul +
    HOST FETCH — block_until_ready alone can lie on this runtime) in a
    subprocess with a hard timeout.  On failure, print a parseable error
    JSON line and exit 0 so the driver always records *something*.
    """
    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return  # CPU/local backends don't hang; skip the probe
    code = (
        "import sys, os\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})\n"
        "from vit_marl_tpu.utils.cache import enable_compilation_cache\n"
        "enable_compilation_cache()\n"  # warm/share the persistent cache
        "import jax, jax.numpy as jnp\n"
        # NONCE: the relay dedupes bit-identical executions — a constant
        # probe could be answered from cache by a wedged backend
        "import time as _t\n"
        "x = jnp.full((256, 256), 1.0 + (_t.time() % 86400) * 1e-6,\n"
        "             jnp.float32)\n"
        "print('probe ok', jax.devices()[0].platform,\n"
        "      float(jax.device_get((x @ x).sum())), flush=True)\n"
    )
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(_error_json(metric, f"tpu_unavailable: backend probe hung "
                                  f">{timeout_s}s (relay wedged?)", unit))
        raise SystemExit(0)
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()[-1:]
        print(_error_json(metric, "tpu_unavailable: probe rc="
                          f"{r.returncode} {' '.join(tail)[:200]}", unit))
        raise SystemExit(0)
    print(f"# backend probe ok in {time.time()-t0:.1f}s", file=sys.stderr)


def arm_deadline(metric, seconds, unit="env-steps/s"):
    """Last-resort watchdog: if the bench has not finished ``seconds`` after
    arming (relay wedged mid-run, compile stuck), print an error JSON line
    and hard-exit so the driver's artifact is never empty."""
    def fire():
        print(_error_json(metric, f"bench_deadline_exceeded: no result "
                                  f"after {seconds}s", unit), flush=True)
        os._exit(3)
    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=8192)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--data-msgs", type=int, default=100)
    p.add_argument("--policy", default="vit-small",
                   choices=["none", "gru", "vit-tiny", "vit-small", "vit-base"],
                   help="default vit-small: the BASELINE.json north-star "
                        "config (ViT-Small encoder in the loop)")
    p.add_argument("--vit-images", action="store_true",
                   help="measure the second BASELINE.json metric instead: "
                        "ViT fwd+bwd images/sec inside a PPO update")
    p.add_argument("--selfcheck", action="store_true",
                   help="run the compiled (non-interpret) Pallas kernel "
                        "vs XLA engine bit-equality check at bench shapes "
                        "on the current device, then exit")
    p.add_argument("--mode", default="loop",
                   choices=["loop", "scan", "pipeline", "pipeline-seq"],
                   help="loop: Python-dispatched steps (async-pipelined, the "
                        "realistic serving/training pattern); scan: one fused "
                        "lax.scan rollout; pipeline: split-batch software "
                        "pipeline (env step for one half merged into one "
                        "program with the policy forward for the other — "
                        "rl/pipeline.py); pipeline-seq: the identical "
                        "half-batch schedule WITHOUT merging (isolates the "
                        "merge effect from the half-batch effect)")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--fused-block", action="store_true",
                   help="use the fused block-half kernels "
                        "(ops/block_kernel.py: LN1+QKV and "
                        "proj+residual+LN2+MLP+residual)")
    p.add_argument("--fused-block-full", action="store_true",
                   help="use the fully-fused block kernel "
                        "(ops/block_kernel.py::fused_block_full: attention "
                        "included, one kernel per block)")
    p.add_argument("--attn-kernel", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="use the fused short-seq attention kernel "
                        "(ops/attention_kernel.py) in ViT blocks — the "
                        "measured default (+33%%, runs/r4); "
                        "--no-attn-kernel measures the XLA path")
    p.add_argument("--attn-bwd-kernel", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="use the Pallas backward kernel for the fused "
                        "attention (affects --vit-images and training; "
                        "--no-attn-bwd-kernel differentiates the XLA "
                        "recompute instead)")
    p.add_argument("--attn-ln-fold", action="store_true",
                   help="fold LN1+QKV into the attention kernel "
                        "(ops/block_kernel.py::fused_ln_qkv_attn); "
                        "proj/LN2/MLP stay in XLA")
    p.add_argument("--deadline", type=float, default=1500.0,
                   help="hard wall-clock budget (s); on expiry an error "
                        "JSON line is printed and the process exits, so a "
                        "mid-run relay wedge can't produce an empty artifact")
    args = p.parse_args()

    if args.smoke:
        args.envs, args.steps, args.reps, args.data_msgs = 8, 4, 1, 10

    # the fused tags only mean something when a ViT forward is measured AND
    # the kernel can actually engage: the fused paths silently fall back to
    # unfused XLA when rows (11*envs) aren't a ROW_BLOCK multiple, which
    # would record an unfused-vs-unfused "A/B" under a fused label
    vit_measured = args.vit_images or args.policy.startswith("vit")
    rows = args.envs * 11
    preset = {"none": "small", "gru": "small", "vit-tiny": "tiny",
              "vit-small": "small", "vit-base": "base"}[args.policy]
    fused_tag = ""
    if vit_measured and args.fused_block_full:
        from vit_marl_tpu.ops.block_kernel import full_block_ok
        from vit_marl_tpu.models.vit import VIT_PRESETS as _VP
        _c = _VP[preset]
        if not full_block_ok(rows, 11, _c.width, _c.heads,
                             _c.width * _c.mlp_ratio):
            print(f"WARNING: envs={args.envs} / width={_c.width} cannot "
                  "engage the fully-fused block kernel (needs envs % 64 "
                  "== 0 and width <= 512); measuring (and labeling) "
                  "UNFUSED.", file=sys.stderr)
            args.fused_block_full = False
        else:
            fused_tag = ",fusedblockfull"
    elif vit_measured and args.fused_block:
        from vit_marl_tpu.ops.block_kernel import ROW_BLOCK as BLK_RB
        if rows % BLK_RB:
            print(f"WARNING: rows={rows} (11*envs) is not a multiple of "
                  f"block-kernel ROW_BLOCK={BLK_RB}; the fused-block path "
                  "cannot engage — measuring (and labeling) UNFUSED.",
                  file=sys.stderr)
            args.fused_block = False
        else:
            fused_tag = ",fusedblock"
    if vit_measured and args.attn_kernel:
        from vit_marl_tpu.ops.attention_kernel import attention_ok
        if not attention_ok(args.envs * 11, 11):
            print(f"WARNING: envs={args.envs} is not a multiple of the "
                  "attention kernel's env block (64); the kernel cannot "
                  "engage — measuring (and labeling) the XLA path.",
                  file=sys.stderr)
            args.attn_kernel = False
            fused_tag += ",xla-attn"
    elif vit_measured:
        fused_tag += ",xla-attn"
    if vit_measured and args.attn_ln_fold:
        from vit_marl_tpu.ops.block_kernel import ln_qkv_attn_ok
        from vit_marl_tpu.models.vit import VIT_PRESETS as _VPF
        _cf = _VPF[preset]
        if not ln_qkv_attn_ok(rows, 11, _cf.width, _cf.heads):
            print(f"WARNING: envs={args.envs} / width={_cf.width} cannot "
                  "engage the LN1+QKV+attention fold kernel (needs envs % "
                  "64 == 0 and width <= 512); measuring (and labeling) "
                  "the unfolded path.", file=sys.stderr)
            args.attn_ln_fold = False
        else:
            fused_tag += ",lnfold"
    if args.vit_images:
        if args.attn_kernel and not args.attn_bwd_kernel:
            fused_tag += ",xla-bwd"
        metric = f"vit_fwd_bwd_images_per_sec[{preset}{fused_tag}]"
        unit = "images/s"
    elif args.selfcheck:
        metric, unit = "kernel_selfcheck_ok", "bool"
    else:
        metric = (f"env_steps_per_sec_per_chip[{args.policy}{fused_tag},"
                  f"{args.mode}]")
        unit = "env-steps/s"
    probe_backend(metric, unit=unit)
    watchdog = arm_deadline(metric, args.deadline, unit=unit)

    import jax
    import jax.numpy as jnp

    from vit_marl_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    try:
        if args.vit_images:
            return bench_vit_images(args, preset, metric)
        if args.selfcheck:
            return kernel_selfcheck()
    finally:
        if args.vit_images or args.selfcheck:
            watchdog.cancel()

    from vit_marl_tpu.config import (
        ExecutionConfig,
        MarketMakingConfig,
        MultiAgentConfig,
        TrainConfig,
        WorldConfig,
    )
    from vit_marl_tpu.env import make_world_env
    from vit_marl_tpu.models.rnn import ScannedGRU
    from vit_marl_tpu.rl.ppo import make_network

    use_vision = args.policy.startswith("vit")
    wcfg = WorldConfig(
        n_data_msg_per_step=args.data_msgs, ep_type="fixed_steps",
        episode_time=50, start_resolution=50,
        n_orders=128, n_trades=128,  # tile-aligned: enables the Pallas engine
        n_messages_per_synthetic_day=max(30_000, args.data_msgs * 60 * 4))
    ma = MultiAgentConfig(
        world=wcfg,
        agents=(MarketMakingConfig(action_space="spread_skew"),
                ExecutionConfig(
                    action_space=("policy_blending" if use_vision
                                  else "fixed_quants_complex"),
                    observation_space=("execution_policy" if use_vision
                                       else "engineered"),
                    reward_space="dual_ppo" if use_vision else "normal",
                    use_vision_obs=use_vision)),
        n_agents_per_type=(1, 1))
    env = make_world_env(ma)
    params = env.default_params

    n_types = len(env.agent_types)
    key = jax.random.PRNGKey(0)
    reset_keys = jax.random.split(key, args.envs)
    obs, state = jax.vmap(env.reset, in_axes=(0, None))(reset_keys, params)

    if args.policy == "none":
        def policy_actions(carry, obs, rng, net_params):
            acts = [jnp.zeros((args.envs,), jnp.int32)]
            a1 = env.action_spaces[1]
            if hasattr(a1, "n"):
                acts.append(jnp.ones((args.envs,), jnp.int32))
            else:
                acts.append(jnp.ones((args.envs, 3), jnp.float32) * 0.5)
            return carry, acts
        carry0 = ()
        net_params = []
    else:
        # `preset` comes from the single policy->preset map at the top of
        # main() (also used for the metric label); the gru network ignores it
        tc = TrainConfig(
            num_envs=args.envs,
            network=("gru", "vit_gru") if use_vision else ("gru", "gru"),
            vit_preset=preset,
            vit_fused_block=args.fused_block,
            vit_fused_block_full=args.fused_block_full,
            vit_attn_kernel=args.attn_kernel,
            vit_attn_bwd_kernel=args.attn_bwd_kernel,
            vit_attn_ln_fold=args.attn_ln_fold)
        nets, net_params, hs = [], [], []
        for i in range(n_types):
            net = make_network(tc, i, env.action_spaces[i],
                               env.observation_spaces[i])
            h = ScannedGRU.initialize_carry(args.envs, tc.hidden_size)
            obs_i = jax.tree.map(
                lambda v: v.reshape((args.envs,) + v.shape[2:])[None], obs[i])
            pi_params = net.init(jax.random.PRNGKey(i), h,
                                 (obs_i, jnp.zeros((1, args.envs))))
            nets.append(net)
            net_params.append(pi_params)
            hs.append(h)

        def policy_actions(carry, obs, rng, net_params):
            hs = list(carry)
            acts = []
            for i in range(n_types):
                obs_i = jax.tree.map(
                    lambda v: v.reshape((args.envs,) + v.shape[2:])[None],
                    obs[i])
                hs[i], pi, _ = nets[i].apply(
                    net_params[i], hs[i],
                    (obs_i, jnp.zeros((1, args.envs))))
                a = pi.sample(seed=rng)
                acts.append(jax.tree.map(lambda v: v[0], a))
            return tuple(hs), acts
        carry0 = tuple(hs)

    print(f"# pallas engine: {env.pallas_ok}", file=sys.stderr)

    # NOTE the policy params ride in loop_state (a jit ARGUMENT): closed
    # over, jit inlines every weight tensor as an MLIR constant and the
    # remote-compile payload carries them — ~345 MB for ViT-Base, which
    # the relay rejects with HTTP 413 (runs/r4/bench_vit_base.txt) and
    # which inflated every vit compile upload by the param bytes.
    def one_step(loop_state):
        key, state, obs, carry, net_params = loop_state
        key, krng, kstep = jax.random.split(key, 3)
        carry, acts = policy_actions(carry, obs, krng, net_params)
        obs, state, rew, dones, _ = env.step_vec(kstep, state, acts, params)
        return (key, state, obs, carry, net_params), rew[0].sum()

    def rollout_scan(loop_state):
        def step_fn(ls, _):
            return one_step(ls)
        ls, rsum = jax.lax.scan(step_fn, loop_state, None, args.steps)
        return ls, rsum.sum()

    if args.mode.startswith("pipeline"):
        if args.policy == "none":
            print("pipeline mode needs a policy in the loop", file=sys.stderr)
            raise SystemExit(2)
        if args.envs % 2:
            print("pipeline mode needs an even env count", file=sys.stderr)
            raise SystemExit(2)
        from vit_marl_tpu.rl.pipeline import make_pipelined_runner, split_half

        half = args.envs // 2

        def policy_half_fn(nparams, pol_state, obs_h):
            pkey, hs = pol_state
            pkey, krng = jax.random.split(pkey)
            hs = list(hs)
            acts = []
            for i in range(n_types):
                obs_i = jax.tree.map(
                    lambda v: v.reshape((half,) + v.shape[2:])[None],
                    obs_h[i])
                hs[i], pi, _ = nets[i].apply(
                    nparams[i], hs[i], (obs_i, jnp.zeros((1, half))))
                a = pi.sample(seed=krng)
                acts.append(jax.tree.map(lambda v: v[0], a))
            return (pkey, tuple(hs)), acts, ()

        def env_half_fn(nparams, env_carry, acts):
            ekey, st = env_carry
            ekey, kstep = jax.random.split(ekey)
            obs_h, st, rew, dones, _ = env.step_vec(kstep, st, acts, params)
            return (ekey, st), obs_h, rew[0].sum()

        run = make_pipelined_runner(policy_half_fn, env_half_fn,
                                    merged=(args.mode == "pipeline"))
        kp, ke = jax.random.split(key)
        kps, kes = jax.random.split(kp, 2), jax.random.split(ke, 2)
        pol_states = [(kps[h], tuple(split_half(c, h, half)
                                     for c in carry0)) for h in (0, 1)]
        env_states = [(kes[h], split_half(state, h, half)) for h in (0, 1)]
        pol_ins = [[split_half(o, h, half) for o in obs] for h in (0, 1)]
        t0 = time.time()
        pol_states, env_states, pol_ins, _, eouts = run(
            net_params, pol_states, env_states, pol_ins, args.steps)
        float(jax.device_get(eouts[0][-1] + eouts[1][-1]))
        compile_time = time.time() - t0
        t0 = time.time()
        for r in range(args.reps):
            pol_states, env_states, pol_ins, _, eouts = run(
                net_params, pol_states, env_states, pol_ins, args.steps)
        # sync on both halves' final env programs (in-order stream; the sum
        # covers the case of independent-request reordering on the relay)
        float(jax.device_get(eouts[0][-1] + eouts[1][-1]))
    elif args.mode == "scan":
        rollout_jit = jax.jit(rollout_scan)
        t0 = time.time()
        ls, _ = jax.block_until_ready(
            rollout_jit((key, state, obs, carry0, net_params)))
        compile_time = time.time() - t0
        t0 = time.time()
        for r in range(args.reps):
            ls, s = rollout_jit(ls)
        float(jax.device_get(s))   # host fetch: block_until_ready can lie
    else:
        step_jit = jax.jit(one_step)
        t0 = time.time()
        ls, _ = step_jit((key, state, obs, carry0, net_params))
        jax.block_until_ready(ls)
        compile_time = time.time() - t0
        t0 = time.time()
        for r in range(args.reps * args.steps):
            ls, s = step_jit(ls)
        float(jax.device_get(s))   # host fetch: block_until_ready can lie
    dt = time.time() - t0
    env_steps = args.envs * args.steps * args.reps
    rate = env_steps / dt

    result = {
        "metric": metric,
        "value": round(rate, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(rate / BASELINE_ENV_STEPS, 4),
    }
    watchdog.cancel()
    print(json.dumps(result))
    print(f"# device={jax.devices()[0].platform} envs={args.envs} "
          f"steps={args.steps} reps={args.reps} msgs/step="
          f"{env.num_msgs_per_step} compile={compile_time:.1f}s "
          f"run={dt:.2f}s", file=sys.stderr)


def kernel_selfcheck():
    """Compiled-mode differential check of the fused Pallas kernel vs the
    XLA engine at bench shapes (M=112 messages, 128-slot book, deep-sweep
    message mix).  The CPU test suite can only run the kernel in interpret
    mode; this proves the *compiled* Mosaic lowering on real hardware.
    Prints one JSON line with ok true/false.
    """
    import sys as _sys

    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from vit_marl_tpu.config import EngineConfig
    from vit_marl_tpu.env.common import (
        ffill_best_prices,
        summarize_trades,
        summary_from_aggs,
    )
    from vit_marl_tpu.lob import engine as eng
    from vit_marl_tpu.ops.book_kernel import (
        ENV_BLOCK,
        pallas_process_step_aggs,
    )

    import os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(
        _os.path.abspath(__file__)), "tests"))
    from test_book_kernel import AGENT_TIDS, TICK, build_case

    # n_orders=128 is the bench book shape; n_trades is oversized so the
    # XLA reference trade log holds every fill (the comparison requires an
    # exact log — same convention as tests/test_book_kernel.py)
    cfg = EngineConfig(n_orders=128, n_trades=16384)
    E, M = 2 * ENV_BLOCK, 112
    batched, msgs = build_case(cfg, E, M, percent_fill=0.5, deep_every=9,
                               agent_every=5)
    keys = jax.random.split(jax.random.PRNGKey(0), E)
    xla_book, (xa, xb) = jax.jit(jax.vmap(
        partial(eng.process_messages_save_bidask, cfg, n_last=M),
        in_axes=(0, 0, 0)))(keys, msgs, batched)
    prev = jnp.full((E, 2), 12_345, jnp.int32)
    xa = jax.vmap(ffill_best_prices)(xa, prev[:, 0])
    xb = jax.vmap(ffill_best_prices)(xb, prev[:, 1])
    n_filled = (np.asarray(xla_book.trades)[:, :, 0] != -1).sum(axis=1)
    assert n_filled.max() < cfg.n_trades, "reference log overflowed"

    tids = jnp.asarray(AGENT_TIDS, jnp.int32)
    k_book, (ka, kb), (per_agent, totals) = pallas_process_step_aggs(
        cfg, msgs, batched, tids, prev, TICK, False)

    ok = True
    for x, y in zip(jax.tree.leaves((xla_book.asks, xla_book.bids)),
                    jax.tree.leaves((k_book.asks, k_book.bids))):
        ok &= bool(jnp.array_equal(x, y))
    ok &= bool(jnp.array_equal(xa, ka)) and bool(jnp.array_equal(xb, kb))
    got = summary_from_aggs(
        per_agent, jnp.broadcast_to(totals[:, None, :],
                                    (E, len(AGENT_TIDS), 2)))
    for k, tid in enumerate(AGENT_TIDS):
        want = jax.vmap(summarize_trades, in_axes=(0, None, None))(
            xla_book.trades, jnp.int32(tid), TICK)
        for w, g in zip(want, jax.tree.map(lambda v: v[:, k], got)):
            ok &= bool(jnp.array_equal(np.asarray(w), np.asarray(g)))

    # random-cancel mode: proves the Mosaic lowering of the in-kernel
    # CDF pick (f32 prefix-sum rolls) in COMPILED mode — the CPU suite
    # can only exercise it in interpret mode
    from test_book_kernel import _random_cancel_case
    cfg_u = EngineConfig(cancel_mode=2)
    b_u, m_u = _random_cancel_case(cfg_u)
    E_u, M_u = m_u.shape[:2]
    keys_u = jax.random.split(jax.random.PRNGKey(0), E_u)
    xla_u, (xua, xub) = jax.jit(jax.vmap(
        partial(eng.process_messages_save_bidask, cfg_u, n_last=M_u),
        in_axes=(0, 0, 0)))(keys_u, m_u, b_u)
    prev_u = jnp.full((E_u, 2), 12_345, jnp.int32)
    xua = jax.vmap(ffill_best_prices)(xua, prev_u[:, 0])
    xub = jax.vmap(ffill_best_prices)(xub, prev_u[:, 1])
    k_u, (kua, kub), _ = pallas_process_step_aggs(
        cfg_u, m_u, b_u, tids, prev_u, TICK, False, engine_keys=keys_u)
    for x, y in zip(jax.tree.leaves((xla_u.asks, xla_u.bids)),
                    jax.tree.leaves((k_u.asks, k_u.bids))):
        ok &= bool(jnp.array_equal(x, y))
    ok &= bool(jnp.array_equal(xua, kua)) and bool(jnp.array_equal(xub, kub))

    print(f"# book kernel compiled checks (std + random-cancel): "
          f"{'OK' if ok else 'FAIL'}", file=_sys.stderr)

    # attention kernel: compiled Mosaic lowering vs the XLA path at ViT
    # bench shapes (the CPU suite covers interpret mode only)
    from vit_marl_tpu.models.vit import attention_nhd
    from vit_marl_tpu.ops.attention_kernel import fused_short_attention
    Ba, N, H, D = 256, 11, 6, 64
    qkv_flat = jax.random.normal(jax.random.PRNGKey(7),
                                 (Ba * N, 3 * H * D), jnp.float32)
    a_ref = attention_nhd(qkv_flat.reshape(Ba, N, 3, H, D),
                          jnp.float32).reshape(Ba * N, H * D)
    a_got = fused_short_attention(qkv_flat, N, H)
    a_err = float(jnp.max(jnp.abs(a_got - a_ref))
                  / (jnp.max(jnp.abs(a_ref)) + 1e-9))
    attn_ok = a_err < 2e-5
    ok &= attn_ok
    print(f"# attention kernel compiled check: rel err {a_err:.2e} "
          f"({'OK' if attn_ok else 'FAIL'})", file=_sys.stderr)

    # attention BACKWARD kernel: compiled Mosaic lowering of the dqkv
    # kernel vs the XLA vjp of the same math (the round-4 selfcheck
    # pattern — it caught the scoped-VMEM and f32-precision bugs the
    # interpret-mode CPU tests cannot see)
    from vit_marl_tpu.ops.attention_kernel import _attention_reference
    g_flat = jax.random.normal(jax.random.PRNGKey(8),
                               (Ba * N, H * D), jnp.float32)
    _, a_vjp = jax.vjp(lambda x: _attention_reference(x, N, H), qkv_flat)
    d_ref, = a_vjp(g_flat)
    d_got = jax.grad(
        lambda x: jnp.vdot(fused_short_attention(x, N, H), g_flat))(qkv_flat)
    d_err = float(jnp.max(jnp.abs(d_got - d_ref))
                  / (jnp.max(jnp.abs(d_ref)) + 1e-9))
    bwd_ok = d_err < 2e-5
    ok &= bwd_ok
    print(f"# attention bwd kernel compiled check: rel err {d_err:.2e} "
          f"({'OK' if bwd_ok else 'FAIL'})", file=_sys.stderr)

    # fully-fused block kernel: compiled lowering vs the composed XLA
    # reference at ViT-Small width (two grid steps of 64 envs) in the
    # PRODUCTION dtype — bf16 x/weights like the flax Block passes (f32
    # would ~1.6x the kernel's VMEM budget and can overflow on v5e; the
    # tight f32 equality is covered by the interpret-mode CPU tests).
    # Tolerance: any lowering bug (wrong roll pairing, bad selection
    # matmul) produces O(1) relative error; bf16 rounding is ~1e-3.
    from vit_marl_tpu.ops.block_kernel import (
        _full_block_reference,
        fused_block_full,
    )
    Wf, Hf = 384, 6
    bf16 = jnp.bfloat16
    ksf = jax.random.split(jax.random.PRNGKey(11), 13)
    fb_args = ((jax.random.normal(ksf[0], (128 * N, Wf)) * 0.5).astype(bf16),
               jax.random.normal(ksf[1], (Wf,)) * 0.1 + 1.0,
               jax.random.normal(ksf[2], (Wf,)) * 0.1,
               (jax.random.normal(ksf[3], (Wf, 3 * Wf)) * 0.05).astype(bf16),
               jax.random.normal(ksf[4], (3 * Wf,)) * 0.1,
               (jax.random.normal(ksf[5], (Wf, Wf)) * 0.05).astype(bf16),
               jax.random.normal(ksf[6], (Wf,)) * 0.1,
               jax.random.normal(ksf[7], (Wf,)) * 0.1 + 1.0,
               jax.random.normal(ksf[8], (Wf,)) * 0.1,
               (jax.random.normal(ksf[9], (Wf, 4 * Wf)) * 0.05).astype(bf16),
               jax.random.normal(ksf[10], (4 * Wf,)) * 0.1,
               (jax.random.normal(ksf[11], (4 * Wf, Wf)) * 0.05).astype(bf16),
               jax.random.normal(ksf[12], (Wf,)) * 0.1)
    fb_got = fused_block_full(*fb_args, N, Hf).astype(jnp.float32)
    fb_ref = _full_block_reference(*fb_args, N, Hf).astype(jnp.float32)
    fb_err = float(jnp.max(jnp.abs(fb_got - fb_ref))
                   / (jnp.max(jnp.abs(fb_ref)) + 1e-9))
    fb_ok = fb_err < 2e-2
    ok &= fb_ok
    print(f"# fused-block-full compiled check: rel err {fb_err:.2e} "
          f"({'OK' if fb_ok else 'FAIL'})", file=_sys.stderr)

    # LN1+QKV+attention fold: compiled lowering vs the composed XLA
    # reference in the production dtype (bf16 x/weights; f32 LN params) —
    # same tolerance rationale as the fused-block check above
    from vit_marl_tpu.ops.block_kernel import (
        _ln_qkv_attn_reference,
        fused_ln_qkv_attn,
    )
    ksl = jax.random.split(jax.random.PRNGKey(13), 5)
    lf_args = ((jax.random.normal(ksl[0], (128 * N, Wf)) * 0.5).astype(bf16),
               jax.random.normal(ksl[1], (Wf,)) * 0.1 + 1.0,
               jax.random.normal(ksl[2], (Wf,)) * 0.1,
               (jax.random.normal(ksl[3], (Wf, 3 * Wf)) * 0.05).astype(bf16),
               jax.random.normal(ksl[4], (3 * Wf,)) * 0.1)
    lf_got = fused_ln_qkv_attn(*lf_args, N, Hf).astype(jnp.float32)
    lf_ref = _ln_qkv_attn_reference(*lf_args, N, Hf).astype(jnp.float32)
    lf_err = float(jnp.max(jnp.abs(lf_got - lf_ref))
                   / (jnp.max(jnp.abs(lf_ref)) + 1e-9))
    lf_ok = lf_err < 2e-2
    ok &= lf_ok
    print(f"# ln_qkv_attn fold compiled check: rel err {lf_err:.2e} "
          f"({'OK' if lf_ok else 'FAIL'})", file=_sys.stderr)

    import json as _json
    print(_json.dumps({"metric": "kernel_selfcheck_ok",
                       "value": 1.0 if ok else 0.0, "unit": "bool",
                       "vs_baseline": 1.0 if ok else 0.0}))
    print(f"# device={jax.devices()[0].platform} E={E} M={M} "
          f"compiled-mode bit-equality: {'OK' if ok else 'FAIL'}",
          file=_sys.stderr)
    if not ok:
        raise SystemExit(1)


def bench_vit_images(args, preset, metric):
    """BASELINE.json metric #2: ViT fwd+bwd images/sec inside a PPO update.

    Times one PPO minibatch step (clipped-surrogate loss value_and_grad +
    adam update) on the ViT actor-critic over random book images; each
    iteration feeds the updated params back in, so inputs differ per call
    (the axon relay dedupes identical executions).
    """
    import dataclasses
    import time as _time

    import jax
    import jax.numpy as jnp
    import optax

    from vit_marl_tpu.models import VIT_PRESETS, ViTActorCriticRNN
    from vit_marl_tpu.models.rnn import ScannedGRU

    vit_cfg = VIT_PRESETS[preset]
    if (args.fused_block != vit_cfg.fused_block
            or args.fused_block_full != vit_cfg.fused_block_full
            or args.attn_kernel != vit_cfg.attn_kernel
            or args.attn_bwd_kernel != vit_cfg.attn_bwd_kernel
            or args.attn_ln_fold != vit_cfg.attn_ln_fold):
        vit_cfg = dataclasses.replace(
            vit_cfg,
            fused_block=args.fused_block,
            fused_block_full=args.fused_block_full,
            attn_kernel=args.attn_kernel,
            attn_bwd_kernel=args.attn_bwd_kernel,
            attn_ln_fold=args.attn_ln_fold)
    T, B = 16, max(args.envs // 16, 16)
    net = ViTActorCriticRNN(action_dim=3, vit=vit_cfg,
                            fc_dim=64, hidden_size=64, continuous=True,
                            action_low=jnp.array([-1.0, 0.0, 0.0]),
                            action_high=jnp.array([3.0, 1.0, 1.0]))
    key = jax.random.PRNGKey(0)
    obs = {"obs": jax.random.normal(key, (T, B, 28), jnp.float32),
           "vision_obs": jax.random.normal(key, (T, B, 10, 3, 2),
                                           jnp.float32)}
    dones = jnp.zeros((T, B), jnp.float32)
    h = ScannedGRU.initialize_carry(B, 64)
    params = net.init(key, h, (jax.tree.map(lambda v: v[:1], obs),
                               dones[:1]))
    tx = optax.adam(2.5e-4)
    opt_state = tx.init(params)
    action = jnp.zeros((T, B, 3), jnp.float32)
    old_logp = jnp.zeros((T, B), jnp.float32)
    gae = jnp.ones((T, B), jnp.float32)

    def loss_fn(p):
        _, pi, value = net.apply(p, h, (obs, dones))
        logp = pi.log_prob(action)
        ratio = jnp.exp(logp - old_logp)
        a_loss = -jnp.minimum(ratio * gae,
                              jnp.clip(ratio, 0.8, 1.2) * gae).mean()
        return a_loss + 0.5 * jnp.square(value).mean() - 0.01 * pi.entropy().mean()

    @jax.jit
    def ppo_step(p, o):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o)
        return optax.apply_updates(p, updates), o, loss

    params, opt_state, loss = ppo_step(params, opt_state)
    t0 = _time.time()
    float(jax.device_get(loss))
    compile_time = _time.time() - t0
    iters = max(args.reps * 4, 8)
    t0 = _time.time()
    for _ in range(iters):
        params, opt_state, loss = ppo_step(params, opt_state)
    float(jax.device_get(loss))  # host fetch: block_until_ready can lie
    dt = _time.time() - t0
    rate = T * B * iters / dt
    import json as _json
    print(_json.dumps({
        "metric": metric,
        "value": round(rate, 1),
        "unit": "images/s",
        "vs_baseline": round(rate / BASELINE_ENV_STEPS, 4),
    }))
    import sys as _sys
    print(f"# device={jax.devices()[0].platform} T={T} B={B} iters={iters} "
          f"compile={compile_time:.1f}s run={dt:.2f}s", file=_sys.stderr)


if __name__ == "__main__":
    main()
