"""Split-batch pipelined rollout (rl/pipeline.py): packing bit-equality.

The merged tick packs "env step for half X" and "policy forward for half
Y" into one jitted program; the claim is that packing changes NOTHING
numerically — `merged=True` and `merged=False` (the identical schedule
through two separate jits) must produce bit-identical states, actions,
and outputs.  Run with the real WorldEnv + GRU policy so the test covers
step_vec-under-jit and the dict/obs plumbing, not just the driver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_marl_tpu.config import (
    ExecutionConfig,
    MarketMakingConfig,
    MultiAgentConfig,
    TrainConfig,
    WorldConfig,
)
from vit_marl_tpu.env import make_world_env
from vit_marl_tpu.models.rnn import ScannedGRU
from vit_marl_tpu.rl.pipeline import (
    concat_halves,
    make_pipelined_runner,
    split_half,
)
from vit_marl_tpu.rl.ppo import make_network


def _setup(E=8):
    ma = MultiAgentConfig(
        world=WorldConfig(n_data_msg_per_step=10, ep_type="fixed_steps",
                          episode_time=8, start_resolution=5,
                          n_messages_per_synthetic_day=2_000),
        agents=(MarketMakingConfig(),
                ExecutionConfig(action_space="simplest_case",
                                observation_space="simplest_case",
                                reward_space="simplest_case")),
        n_agents_per_type=(1, 1))
    env = make_world_env(ma)
    params = env.default_params
    tc = TrainConfig(num_envs=E, total_timesteps=E * 8)
    key = jax.random.PRNGKey(0)
    obs, state = jax.vmap(env.reset, in_axes=(0, None))(
        jax.random.split(key, E), params)
    nets, net_params, hs = [], [], []
    for i in range(len(env.agent_types)):
        net = make_network(tc, i, env.action_spaces[i],
                           env.observation_spaces[i])
        h = ScannedGRU.initialize_carry(E, tc.hidden_size)
        obs_i = jax.tree.map(
            lambda v: v.reshape((E,) + v.shape[2:])[None], obs[i])
        nets.append(net)
        net_params.append(net.init(jax.random.PRNGKey(i), h,
                                   (obs_i, jnp.zeros((1, E)))))
        hs.append(h)
    return env, params, nets, net_params, hs, obs, state


def _make_half_fns(env, params, nets, half):
    n_types = len(env.agent_types)

    def policy_half(nparams, pol_state, obs_h):
        pkey, hs = pol_state
        pkey, krng = jax.random.split(pkey)
        hs = list(hs)
        acts = []
        for i in range(n_types):
            obs_i = jax.tree.map(
                lambda v: v.reshape((half,) + v.shape[2:])[None], obs_h[i])
            hs[i], pi, val = nets[i].apply(
                nparams[i], hs[i], (obs_i, jnp.zeros((1, half))))
            a = pi.sample(seed=krng)
            acts.append(jax.tree.map(lambda v: v[0], a))
        return (pkey, tuple(hs)), acts, val

    def env_half(nparams, env_carry, acts):
        ekey, st = env_carry
        ekey, kstep = jax.random.split(ekey)
        obs_h, st, rew, dones, _ = env.step_vec(kstep, st, acts, params)
        return (ekey, st), obs_h, (rew[0].sum(), rew[1].sum())

    return policy_half, env_half


def _initial_halves(key, state, obs, hs, half):
    kp, ke = jax.random.split(key)
    kps, kes = jax.random.split(kp, 2), jax.random.split(ke, 2)
    pol_states = [(kps[h], tuple(split_half(c, h, half) for c in hs))
                  for h in (0, 1)]
    env_states = [(kes[h], split_half(state, h, half)) for h in (0, 1)]
    pol_ins = [[split_half(o, h, half) for o in obs] for h in (0, 1)]
    return pol_states, env_states, pol_ins


def test_merged_tick_bit_equal_to_sequential():
    env, params, nets, net_params, hs, obs, state = _setup(E=8)
    half = 4
    policy_half, env_half = _make_half_fns(env, params, nets, half)
    key = jax.random.PRNGKey(42)
    T = 4

    results = {}
    for merged in (True, False):
        run = make_pipelined_runner(policy_half, env_half, merged=merged)
        init = _initial_halves(key, state, obs, hs, half)
        results[merged] = run(net_params, *init, T)

    for got, want in zip(jax.tree.leaves(results[True]),
                         jax.tree.leaves(results[False])):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # shape sanity: T outputs per half on both streams
    _, _, _, pol_outs, env_outs = results[True]
    assert all(len(o) == T for o in pol_outs + env_outs)


def test_pipelined_env_stream_matches_half_replay():
    """Each half's env trajectory through the pipeline equals a straight
    per-half replay of the same (policy, env) call sequence — the pipeline
    only re-orders independent programs, never what each half computes."""
    env, params, nets, net_params, hs, obs, state = _setup(E=8)
    half = 4
    policy_half, env_half = _make_half_fns(env, params, nets, half)
    key = jax.random.PRNGKey(7)
    T = 3

    run = make_pipelined_runner(policy_half, env_half, merged=True)
    init = _initial_halves(key, state, obs, hs, half)
    pol_states, env_states, pol_ins, pol_outs, env_outs = run(
        net_params, *init, T)

    # straight replay, one half at a time, same initial states
    pol0, env0, in0 = _initial_halves(key, state, obs, hs, half)
    for h in (0, 1):
        ps, es, oi = pol0[h], env0[h], in0[h]
        for t in range(T):
            ps, acts, _ = policy_half(net_params, ps, oi)
            es, oi, eout = env_half(net_params, es, acts)
        for got, want in zip(jax.tree.leaves((pol_states[h], env_states[h],
                                              pol_ins[h], env_outs[h][-1])),
                             jax.tree.leaves((ps, es, oi, eout))):
            np.testing.assert_allclose(np.asarray(got, np.float64),
                                       np.asarray(want, np.float64),
                                       rtol=1e-6, atol=0)


def test_split_concat_roundtrip():
    tree = {"a": jnp.arange(24).reshape(8, 3),
            "b": jnp.arange(8, dtype=jnp.float32)}
    lo, hi = split_half(tree, 0, 4), split_half(tree, 1, 4)
    back = concat_halves(lo, hi)
    for got, want in zip(jax.tree.leaves(back), jax.tree.leaves(tree)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_training_with_pipeline_rollout():
    """rollout_mode=pipeline trains end-to-end: finite losses, correct
    optimizer step count, observability metrics intact, and the traj
    concat preserves the env-major actor layout (action pcts sum to 100)."""
    from vit_marl_tpu.config import TrainConfig
    from vit_marl_tpu.rl.ppo import make_train

    ma_kw = dict(n_data_msg_per_step=10, ep_type="fixed_steps",
                 episode_time=8, start_resolution=5,
                 n_messages_per_synthetic_day=2_000)
    ma = MultiAgentConfig(
        world=WorldConfig(**ma_kw),
        agents=(MarketMakingConfig(),
                ExecutionConfig(action_space="simplest_case",
                                observation_space="simplest_case",
                                reward_space="simplest_case")),
        n_agents_per_type=(1, 1))
    tc = TrainConfig(num_envs=4, num_steps=8, num_minibatches=2,
                     update_epochs=2, log_backend="none",
                     total_timesteps=4 * 8 * 2, rollout_mode="pipeline")
    out = make_train(ma, tc)(jax.random.PRNGKey(0))
    assert len(out["metrics"]) == 2
    for m in out["metrics"]:
        for k, v in m.items():
            assert np.isfinite(np.asarray(v)).all(), k
    ts = out["runner_state"][0]
    assert int(ts[0].step) == 2 * 2 * 2
    m = out["metrics"][-1]
    pct = [float(np.asarray(v)) for k, v in m.items()
           if k.startswith("MM/action_pct_")]
    assert pct and abs(sum(pct) - 100.0) < 1e-3
    # info moments survive the half-averaging: mean reward matches the
    # independently-computed traj mean
    np.testing.assert_allclose(np.asarray(m["EXE/info_reward_mean"]),
                               np.asarray(m["EXE/mean_reward"]), rtol=1e-5)


def test_pipeline_rollout_mesh_is_error():
    from vit_marl_tpu.config import TrainConfig
    from vit_marl_tpu.parallel.mesh import make_mesh
    from vit_marl_tpu.rl.ppo import make_train

    ma = MultiAgentConfig(
        world=WorldConfig(n_data_msg_per_step=10, ep_type="fixed_steps",
                          episode_time=8, start_resolution=5,
                          n_messages_per_synthetic_day=2_000),
        agents=(MarketMakingConfig(),
                ExecutionConfig(action_space="simplest_case",
                                observation_space="simplest_case",
                                reward_space="simplest_case")),
        n_agents_per_type=(1, 1))
    tc = TrainConfig(num_envs=8, num_steps=4, num_minibatches=2,
                     update_epochs=1, log_backend="none",
                     total_timesteps=32, rollout_mode="pipeline")
    mesh = make_mesh((8,), ("data",))
    with pytest.raises(ValueError, match="pipeline"):
        make_train(ma, tc, mesh=mesh)(jax.random.PRNGKey(0))
