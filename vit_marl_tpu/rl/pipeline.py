"""Split-batch software-pipelined rollout (VERDICT r4 item 1).

The loop-mode rollout is provably serialized on one chip: env-only is
~22 ms/step at 8192 envs (`runs/r4/bench_none.txt`) and the ViT-Small
policy forward ~41 ms (`runs/r4/profile_vit.txt`), and the measured
62.8 ms step is their sum to within noise — the HBM/VPU-bound book
engine and the MXU-bound encoder never overlap.

Mechanism: split the env batch in two halves at env boundaries.  The
data dependency (policy(obs_t) -> env step t -> obs_{t+1}) is *within*
a half; across halves the computations are independent.  So pack "env
step for half X" and "policy forward for half Y" into ONE jitted
program with no dependency between the two subgraphs, giving XLA's
latency-hiding scheduler the chance to interleave the engine's
DMA-bound ops with encoder matmuls.  Per full env step the device runs
two such merged programs instead of one policy+env program:

    prologue:  P_A(0)
    ticks:     [E_A(0) | P_B(0)], [E_B(0) | P_A(1)], [E_A(1) | P_B(1)],
               ...,               [E_A(T-1) | P_B(T-1)]
    epilogue:  E_B(T-1)

Numerics: the merged tick computes exactly what the two unmerged calls
compute — `merged=True/False` are bit-equal (tested).  Relative to the
full-batch rollout, per-half execution is a *documented divergence*:
batch-shaped RNG draws (action sampling, per-env key splits) produce a
different — identically distributed — realization, exactly like any
batch-size change.  Per-env math (engine, rewards, encoder) is
unchanged.

No reference counterpart (the reference's rollout is a single fused
scan; ref: ippo_rnn_JAXMARL.py:276-370).
"""

from __future__ import annotations

from typing import Any, Callable, List, Tuple

import jax
import jax.numpy as jnp


def split_half(tree, idx: int, half: int):
    """Slice ``[idx*half:(idx+1)*half]`` of every leaf's leading axis."""
    return jax.tree.map(
        lambda v: jax.lax.slice_in_dim(v, idx * half, (idx + 1) * half,
                                       axis=0), tree)


def concat_halves(a, b):
    """Concatenate two half-batch pytrees along the leading axis."""
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)


def make_pipelined_runner(policy_half: Callable, env_half: Callable,
                          merged: bool = True) -> Callable:
    """Build the pipelined rollout driver.

    ``policy_half(params, pol_state, pol_in) -> (pol_state', actions,
    pol_out)`` and ``env_half(params, env_state, actions) -> (env_state',
    pol_in', env_out)`` are pure half-batch functions; any RNG chains ride
    inside the states.  ``params`` is a jit ARGUMENT (closure-inlined
    weights become MLIR constants and blow up the remote-compile payload —
    the round-4 HTTP-413 lesson).

    ``merged=False`` runs the identical schedule through two separate
    jitted programs (no packing) — the bit-equality reference for tests
    and the A/B baseline arm.

    Returns ``run(params, pol_states, env_states, pol_ins, n_steps)`` with
    ``pol_states/env_states/pol_ins`` as [half0, half1] lists; it returns
    ``(pol_states, env_states, pol_ins, pol_outs, env_outs)`` where
    ``pol_outs[h]``/``env_outs[h]`` are per-step output lists (length
    ``n_steps``) for half ``h``.
    """
    pol_jit = jax.jit(policy_half)
    env_jit = jax.jit(env_half)
    if merged:
        @jax.jit
        def tick(params, env_state, actions, pol_state, pol_in):
            return (env_half(params, env_state, actions),
                    policy_half(params, pol_state, pol_in))
    else:
        def tick(params, env_state, actions, pol_state, pol_in):
            return (env_jit(params, env_state, actions),
                    pol_jit(params, pol_state, pol_in))

    def run(params, pol_states: List[Any], env_states: List[Any],
            pol_ins: List[Any], n_steps: int) -> Tuple:
        pol_states, env_states, pol_ins = (list(pol_states),
                                           list(env_states), list(pol_ins))
        acts = [None, None]
        pol_outs: List[List[Any]] = [[], []]
        env_outs: List[List[Any]] = [[], []]
        # prologue: policy for half 0
        pol_states[0], acts[0], p = pol_jit(params, pol_states[0],
                                            pol_ins[0])
        pol_outs[0].append(p)
        x, y = 0, 1
        for _ in range(2 * n_steps - 1):
            ((env_states[x], pol_ins[x], e),
             (pol_states[y], acts[y], p)) = tick(
                params, env_states[x], acts[x], pol_states[y], pol_ins[y])
            env_outs[x].append(e)
            pol_outs[y].append(p)
            x, y = y, x
        # epilogue: the pending env half (no policy half to pair with)
        env_states[x], pol_ins[x], e = env_jit(params, env_states[x],
                                               acts[x])
        env_outs[x].append(e)
        return pol_states, env_states, pol_ins, pol_outs, env_outs

    return run
