"""Learned-vs-Baseline combination rollouts.

Rebuild of the reference's evaluation harness
(ref: jaxrl/MARL/baseline_eval/baseline_JAXMARL.py:~505-665): enumerate all
2^n_types combinations of {Learned, Baseline} per agent type ("BB", "BL",
"LB", "LL", ...), roll each out over vmapped envs, and collect per-type
reward trajectories + episode statistics for the comparison matrix.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from vit_marl_tpu.env.world import WorldEnv
from vit_marl_tpu.models.rnn import ScannedGRU

Array = jax.Array


def rollout(env: WorldEnv, params, policies: Sequence, num_envs: int,
            num_steps: int, rng: Array, hidden_size: int = 64,
            mode: str = "sample") -> Dict:
    """Roll out one policy assignment; returns stacked rewards/dones/infos.

    ``mode``: "sample" draws actions from each policy's distribution (the
    reference's eval behaviour — baseline_JAXMARL.py samples from pi);
    "greedy" takes the distribution mode.
    """
    if mode not in ("sample", "greedy"):
        raise ValueError(f"mode must be 'sample' or 'greedy', got {mode!r}")
    n_types = len(env.agent_types)
    num_actors = [n * num_envs for n in env.n_per_type]

    reset_rng = jax.random.split(rng, num_envs)
    obs, state = jax.vmap(env.reset, in_axes=(0, None))(reset_rng, params)
    hstates = [ScannedGRU.initialize_carry(num_actors[i], hidden_size)
               for i in range(n_types)]
    dones0 = [jnp.zeros((num_actors[i],), bool) for i in range(n_types)]

    def step_fn(carry, _):
        rng, state, obs, dones, hstates = carry
        rng, krng, kstep = jax.random.split(rng, 3)
        actions = []
        new_h = list(hstates)
        for i, pol in enumerate(policies):
            obs_i = jax.tree.map(
                lambda v: v.reshape((num_actors[i],) + v.shape[2:])[None],
                obs[i])
            h, pi, _ = pol.apply(None, hstates[i], (obs_i, dones[i][None]))
            new_h[i] = h
            a = pi.sample(seed=krng) if mode == "sample" else pi.mode()
            a = jax.tree.map(lambda v: v[0], a)
            a = a.reshape((num_envs, env.n_per_type[i]) + a.shape[1:])
            actions.append(a.squeeze() if env.n_per_type[i] == 1 else a)
        obs, state, rewards, dones_d, infos = env.step_vec(
            kstep, state, actions, params)
        new_dones = [
            dones_d["agents"][i].reshape((num_actors[i],))
            for i in range(n_types)]
        out = {
            "rewards": rewards,
            "actions": list(actions),
            "dones": dones_d["__all__"],
            "agent_infos": [dict(infos["agents"][i])
                            for i in range(n_types)],
            "world_infos": dict(infos["world"]),
        }
        return (rng, state, obs, new_dones, new_h), out

    (_, state, obs, dones, hstates), traj = jax.lax.scan(
        step_fn, (rng, state, obs, dones0, hstates), None, num_steps)
    return traj


def evaluate_combinations(env: WorldEnv, params, learned: Sequence,
                          baseline: Sequence, num_envs: int, num_steps: int,
                          rng: Array, mode: str = "sample") -> Dict[str, Dict]:
    """All 2^n {L, B} assignments -> combo label -> rollout summary."""
    n_types = len(env.agent_types)
    results = {}
    for mask in itertools.product("LB", repeat=n_types):
        label = "".join(mask)
        policies = [learned[i] if m == "L" else baseline[i]
                    for i, m in enumerate(mask)]
        rng, sub = jax.random.split(rng)
        traj = rollout(env, params, policies, num_envs, num_steps, sub,
                       mode=mode)
        summary = {
            "mean_rewards": [float(jnp.mean(r)) for r in traj["rewards"]],
            "episode_done_frac": float(jnp.mean(traj["dones"])),
            "traj": traj,
        }
        results[label] = summary
    return results
