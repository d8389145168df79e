"""Environment-layer tests: world pipeline, both agent types, vmap rollouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_marl_tpu.config import (
    ExecutionConfig,
    MarketMakingConfig,
    MultiAgentConfig,
    WorldConfig,
)
from vit_marl_tpu.env import make_world_env

KEY = jax.random.PRNGKey(0)


def small_world(**kw):
    defaults = dict(n_data_msg_per_step=20, ep_type="fixed_steps",
                    episode_time=10, start_resolution=5,
                    n_messages_per_synthetic_day=3_000)
    defaults.update(kw)
    return WorldConfig(**defaults)


def make_env(world=None, agents=None, n=None, **world_kw):
    ma = MultiAgentConfig(
        world=world or small_world(**world_kw),
        agents=agents or (MarketMakingConfig(), ExecutionConfig()),
        n_agents_per_type=n or (1, 1))
    return make_world_env(ma)


@pytest.fixture(scope="module")
def env2p():
    return make_env()


@pytest.fixture(scope="module")
def env2p_params(env2p):
    return env2p.default_params


class TestReset:
    def test_reset_shapes(self, env2p, env2p_params):
        obs, state = env2p.reset(KEY, env2p_params)
        assert obs[0].shape == (1, 10)   # MM engineered, fixed_steps
        assert obs[1].shape == (1, 12)   # Exec engineered, fixed_steps
        assert state.world.best_bids.shape == (env2p.num_msgs_per_step, 2)
        assert int(state.world.order_id_counter) == -200
        assert float(state.world.mid_price) > 0

    def test_reset_window_selection_random(self, env2p, env2p_params):
        idxs = set()
        for s in range(8):
            _, st = env2p.reset(jax.random.PRNGKey(s), env2p_params)
            idxs.add(int(st.world.window_index))
        assert len(idxs) > 1

    def test_reset_fixed_window(self):
        env = make_env(world=small_world(window_selector=3))
        params = env.default_params
        _, st = env.reset(KEY, params)
        assert int(st.world.window_index) == 3


class TestStep:
    def test_step_advances_and_autoresets(self, env2p, env2p_params):
        obs, state = env2p.reset(KEY, env2p_params)
        actions = [jnp.asarray(0), jnp.asarray(0)]
        key = KEY
        saw_done = False
        for _ in range(12):
            key, sk = jax.random.split(key)
            obs, state, rewards, dones, info = env2p.step(
                sk, state, actions, env2p_params)
            saw_done |= bool(dones["__all__"])
        assert saw_done  # 10-step episodes must have terminated once
        assert int(state.world.step_counter) < 12

    def test_trader_ids_distinct(self, env2p, env2p_params):
        tids = [int(x) for p in env2p_params.agents for x in np.asarray(p.trader_id)]
        assert len(set(tids)) == len(tids)
        assert all(t <= -100 for t in tids)

    def test_order_id_counter_decreases(self, env2p, env2p_params):
        _, state = env2p.reset(KEY, env2p_params)
        actions = [jnp.asarray(1), jnp.asarray(1)]
        _, state2, _, _, _ = env2p.step_env(KEY, state, actions, env2p_params)
        assert int(state2.world.order_id_counter) == \
            -200 - env2p.num_action_msgs_per_step

    def test_exec_task_progress(self, env2p, env2p_params):
        _, state = env2p.reset(KEY, env2p_params)
        actions = [jnp.asarray(0), jnp.asarray(1)]  # exec: FT aggressive
        key = KEY
        _, state2, _, dones, info = env2p.step_env(key, state, actions,
                                                   env2p_params)
        executed = int(state2.agents[1].quant_executed[0])
        assert executed > 0  # aggressive order must fill against the book

    def test_mm_inventory_moves(self):
        # directional_trading action 1 buys at the best ask -> crossing fill
        env = make_env(agents=(
            MarketMakingConfig(action_space="directional_trading"),
            ExecutionConfig()))
        params = env.default_params
        _, state = env.reset(KEY, params)
        actions = [jnp.asarray(1), jnp.asarray(0)]
        _, state, _, _, info = env.step_env(KEY, state, actions, params)
        assert int(np.asarray(info["agents"][0]["inventory"])[0]) > 0

    def test_rewards_finite(self, env2p, env2p_params):
        _, state = env2p.reset(KEY, env2p_params)
        key = KEY
        actions = [jnp.asarray(2), jnp.asarray(3)]
        for _ in range(5):
            key, sk = jax.random.split(key)
            _, state, rewards, _, _ = env2p.step(sk, state, actions,
                                                 env2p_params)
            for r in rewards:
                assert np.isfinite(np.asarray(r)).all()


class TestVmap:
    def test_vmapped_rollout(self, env2p, env2p_params):
        n_env = 8
        keys = jax.random.split(KEY, n_env)
        obs, states = jax.vmap(env2p.reset, in_axes=(0, None))(keys, env2p_params)
        assert obs[0].shape == (n_env, 1, 10)

        actions = [jnp.zeros((n_env,), jnp.int32),
                   jnp.ones((n_env,), jnp.int32)]
        step = jax.vmap(env2p.step, in_axes=(0, 0, [0, 0], None))
        for i in range(3):
            keys = jax.random.split(keys[0], n_env)
            obs, states, rewards, dones, infos = step(keys, states, actions,
                                                      env2p_params)
        assert rewards[0].shape == (n_env, 1)
        assert np.isfinite(np.asarray(rewards[1])).all()


class TestActionSpaces:
    @pytest.mark.parametrize("mm_space,n_act", [
        ("fixed_quants", 8), ("simple", 4), ("AvSt", 8),
        ("spread_skew", 6), ("directional_trading", 3)])
    def test_mm_action_spaces_step(self, mm_space, n_act):
        env = make_env(agents=(MarketMakingConfig(action_space=mm_space),
                               ExecutionConfig(action_space="simplest_case")))
        params = env.default_params
        _, state = env.reset(KEY, params)
        assert env.action_spaces[0].n == n_act
        for a in range(n_act):
            actions = [jnp.asarray(a), jnp.asarray(1)]
            _, s2, r, d, i = env.step_env(KEY, state, actions, params)
            assert np.isfinite(np.asarray(r[0])).all()

    @pytest.mark.parametrize("ex_space", [
        "fixed_quants", "fixed_quants_complex", "fixed_quants_1msg",
        "simplest_case", "twap"])
    def test_exec_action_spaces_step(self, ex_space):
        env = make_env(agents=(MarketMakingConfig(),
                               ExecutionConfig(action_space=ex_space)))
        params = env.default_params
        _, state = env.reset(KEY, params)
        actions = [jnp.asarray(0), jnp.asarray(1 % env.action_spaces[1].n)]
        _, s2, r, d, i = env.step_env(KEY, state, actions, params)
        assert np.isfinite(np.asarray(r[1])).all()

    def test_exec_policy_blending_continuous(self):
        env = make_env(agents=(
            MarketMakingConfig(),
            ExecutionConfig(action_space="policy_blending",
                            observation_space="execution_policy",
                            reward_space="dual_ppo")))
        params = env.default_params
        obs, state = env.reset(KEY, params)
        assert obs[1].shape == (1, 28)
        actions = [jnp.asarray(0), jnp.array([1.0, 0.5, 0.2], jnp.float32)]
        _, s2, r, d, i = env.step_env(KEY, state, actions, params)
        assert np.isfinite(np.asarray(r[1])).all()
        # quantity placed in the book or executed
        assert int(s2.agents[1].quant_executed[0]) >= 0

    @pytest.mark.parametrize("aggressive", [False, True])
    def test_exec_policy_blending_aggressive_flag(self, aggressive):
        """Default: all 3 blend orders passive at own-side levels (ref:
        vision_env.py:1426-1534). blend_aggressive (documented divergence):
        level 1 crosses to the far touch so fills exist at short horizons;
        levels 2-3 stay passive."""
        env = make_env(agents=(
            MarketMakingConfig(),
            ExecutionConfig(action_space="policy_blending",
                            observation_space="execution_policy",
                            reward_space="dual_ppo", task="buy",
                            blend_aggressive=aggressive)))
        params = env.default_params
        _, state = env.reset(KEY, params)
        agent = env.agent_types[1]
        st = jax.tree.map(lambda v: v[0], state.agents[1])
        world = state.world
        from vit_marl_tpu.lob import book as bk
        best_ask, best_bid = bk.best_bid_and_ask(
            agent.wcfg, world.asks, world.bids)
        msgs = np.asarray(agent.get_action_msgs(
            jnp.array([2.0, 2.0, 2.0], jnp.float32), world, st,
            jax.tree.map(lambda v: v[0], params.agents[1])))
        if aggressive:
            assert msgs[0, 3] == int(best_ask)   # buy L1 crosses the spread
        else:
            assert msgs[0, 3] == int(best_bid)   # buy L1 passive at the bid
            assert msgs[1, 3] <= int(best_bid)   # deeper levels passive
        assert (msgs[:3, 1] == 1).all()          # buy side


class TestVisionObs:
    def test_vision_obs_dict(self):
        env = make_env(agents=(
            MarketMakingConfig(),
            ExecutionConfig(use_vision_obs=True, vision_levels=10)))
        params = env.default_params
        obs, state = env.reset(KEY, params)
        assert set(obs[1].keys()) == {"obs", "vision_obs"}
        assert obs[1]["vision_obs"].shape == (1, 10, 3, 2)
        actions = [jnp.asarray(0), jnp.asarray(1)]
        obs2, *_ = env.step_env(KEY, state, actions, params)
        v = np.asarray(obs2[1]["vision_obs"])[0]
        # gap channel: nonnegative tick distances; volume channels log1p >= 0
        assert (v[:, 1, :] >= 0).all() and (v[:, 2, :] >= 0).all()
        assert np.isfinite(v).all()

    def test_vision_obs_normalization_semantics(self):
        env = make_env(agents=(
            MarketMakingConfig(),
            ExecutionConfig(use_vision_obs=True, vision_levels=5)))
        params = env.default_params
        obs, state = env.reset(KEY, params)
        agent = env.agent_types[1]
        raw = np.asarray(agent.get_vision_obs(state.world, normalize=False))
        norm = np.asarray(agent.get_vision_obs(state.world, normalize=True))
        mid = float(state.world.mid_price)
        tick = env.wcfg.tick_size
        # check the ask-gap and log-vol features on the first level
        assert norm[0, 0, 0] == pytest.approx((raw[0, 0, 0] - mid) / tick)
        assert norm[0, 1, 0] == pytest.approx(np.log1p(raw[0, 1, 0]), rel=1e-5)
        assert norm[0, 0, 1] == pytest.approx((mid - raw[0, 0, 1]) / tick)


class TestExecActionReshaping:
    """fixed_prices reshaping + twapV3 (ref: vision_env.py:577-610)."""

    def _exec_env(self, world_kw=None, **exec_kw):
        env = make_env(world=small_world(**(world_kw or {})),
                       agents=(MarketMakingConfig(),
                               ExecutionConfig(**exec_kw)))
        params = env.default_params
        _, state = env.reset(KEY, params)
        return env, params, state

    def test_fixed_prices_step_env(self):
        env, params, state = self._exec_env(action_space="fixed_prices",
                                            n_actions=4)
        actions = [jnp.asarray(0), jnp.array([3, 2, 1, 0], jnp.int32)]
        _, s2, r, d, i = env.step_env(KEY, state, actions, params)
        assert np.isfinite(np.asarray(r[1])).all()

    def test_twap_v3_step_env(self):
        env, params, state = self._exec_env(action_space="twap_v3")
        actions = [jnp.asarray(0), jnp.asarray(0)]
        _, s2, r, d, i = env.step_env(KEY, state, actions, params)
        assert np.isfinite(np.asarray(r[1])).all()

    def test_hamilton_truncation(self):
        """round -> clip -> Hamilton when the action exceeds the remaining
        task (ref: vision_env.py:596-604)."""
        env, params, state = self._exec_env(action_space="fixed_prices",
                                            n_actions=4, task_size=10)
        agent = env.agent_types[1]
        st = jax.tree.map(lambda v: v[0], state.agents[1])
        st = st.replace(quant_executed=jnp.int32(3))  # remaining = 7
        big = jnp.array([50, 30, 10, 10], jnp.int32)
        out = agent._reshape_action(big, state.world, st, KEY)
        out = np.asarray(out)
        assert out.sum() == 7 and (out >= 0).all()
        # proportional floor allocation is respected
        assert out[0] >= out[2] and out[0] >= out[3]
        small = jnp.array([2, 1, 0, 1], jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(agent._reshape_action(small, state.world, st, KEY)),
            np.asarray(small))

    def test_twap_v3_two_level_split(self):
        # episode_time > 60 so the (seconds-denominated) market-order switch
        # stays off at episode start (ref quirk: the switch compares seconds
        # even for fixed_steps episodes, vision_env.py:580-582)
        env, params, state = self._exec_env(
            world_kw=dict(episode_time=100, start_resolution=100),
            action_space="twap_v3", task_size=101)
        agent = env.agent_types[1]
        st = jax.tree.map(lambda v: v[0], state.agents[1])
        world = state.world
        q = agent._twap_v3_quants(world, st, KEY)
        q = np.asarray(q)
        steps_left = int(world.max_steps_in_episode - world.step_counter)
        step_quant = int(np.ceil(101 / steps_left))
        assert sorted(q.tolist()) == sorted(
            [step_quant // 2, step_quant - step_quant // 2])

    def test_twap_v3_market_order_switch(self):
        """Both levels get the full step quant in the last 60 s
        (ref: vision_env.py:579-592)."""
        env, params, state = self._exec_env(
            world_kw=dict(episode_time=100, start_resolution=100),
            action_space="twap_v3", task_size=100)
        agent = env.agent_types[1]
        st = jax.tree.map(lambda v: v[0], state.agents[1])
        world = state.world
        # push time to within 60 s of the (time-denominated) episode end
        near_end = world.init_time.at[0].add(env.wcfg.episode_time - 10)
        world = world.replace(time=near_end)
        q = np.asarray(agent._twap_v3_quants(world, st, KEY))
        steps_left = int(world.max_steps_in_episode - world.step_counter)
        step_quant = int(np.ceil(100 / steps_left))
        assert (q == step_quant).all()

    def test_delta_action_type_adds_twap_base(self):
        env, params, state = self._exec_env(action_space="fixed_prices",
                                            n_actions=2, action_type="delta",
                                            task_size=500)
        agent = env.agent_types[1]
        st = jax.tree.map(lambda v: v[0], state.agents[1])
        k_twap, _ = jax.random.split(KEY)
        base = np.asarray(agent._twap_v3_quants(state.world, st, k_twap))
        out = np.asarray(agent._reshape_action(
            jnp.zeros((2,), jnp.int32), state.world, st, KEY))
        np.testing.assert_array_equal(out, np.clip(base, 0, 500))

    def test_fixed_prices_ladder_combines_mid_into_nt(self):
        """n_actions=4 and mid == near touch folds the mid order into NT
        (ref: vision_env.py:1219-1236)."""
        env, params, state = self._exec_env(action_space="fixed_prices",
                                            n_actions=4, task="buy")
        agent = env.agent_types[1]
        st = jax.tree.map(lambda v: v[0], state.agents[1])
        world = state.world
        tick = env.wcfg.tick_size
        # bb=100_000, ba=100_100 -> mid floors to bb == NT (buy ladder)
        n = world.best_asks.shape[0]
        world = world.replace(
            best_asks=jnp.tile(jnp.array([[100_100, 5]]), (n, 1)),
            best_bids=jnp.tile(jnp.array([[100_000, 5]]), (n, 1)))
        msgs = agent.get_action_msgs(jnp.array([4, 3, 2, 1], jnp.int32),
                                     world, st, jax.tree.map(
                                         lambda v: v[0], params.agents[1]))
        msgs = np.asarray(msgs)
        assert msgs[1, 3] == -1 and msgs[1, 2] == 0   # mid wiped
        assert msgs[2, 2] == 5                        # 3 + 2 folded into NT
        assert msgs[2, 3] == 100_000
        assert msgs[0, 3] == 100_100                  # FT = best ask

    def test_fixed_prices_ladder_uses_last10_mean(self):
        env, params, state = self._exec_env(action_space="fixed_prices",
                                            n_actions=2, task="buy")
        agent = env.agent_types[1]
        st = jax.tree.map(lambda v: v[0], state.agents[1])
        world = state.world
        n = world.best_asks.shape[0]
        asks = jnp.tile(jnp.array([[100_000, 1]]), (n, 1))
        asks = asks.at[-5:, 0].set(101_000)   # mean of last 10 = 100_500
        world = world.replace(
            best_asks=asks,
            best_bids=jnp.tile(jnp.array([[99_000, 1]]), (n, 1)))
        ladder = np.asarray(agent._fixed_prices_ladder(world, st))
        assert ladder[0] == 100_500 and ladder[1] == 99_000


class TestPallasAggregatePath:
    """step_vec's fused-kernel aggregate path == the XLA trade-log path."""

    @pytest.mark.slow
    @pytest.mark.parametrize("cancel_mode", [1, 2])
    def test_step_vec_aggs_matches_xla(self, cancel_mode):
        # cancel_mode 2 (CANCEL_UNIFORM) proves the step_vec wiring hands
        # the kernel the same engine keys the XLA fallback would split
        def build(force):
            env = make_env(world=small_world(n_orders=32, n_trades=32,
                                             n_data_msg_per_step=10,
                                             cancel_mode=cancel_mode))
            env._force_pallas_interpret = force
            return env

        env_x, env_p = build(False), build(True)
        assert not env_x.pallas_ok and env_p.pallas_ok
        params = env_x.default_params
        E = 128  # ENV_BLOCK
        keys = jax.random.split(KEY, E)
        obs, state = jax.vmap(env_x.reset, in_axes=(0, None))(keys, params)
        acts = [jnp.zeros((E,), jnp.int32), jnp.ones((E,), jnp.int32)]
        step_key = jax.random.PRNGKey(7)
        ox, sx, rx, dx, ix = env_x.step_vec(step_key, state, acts, params)
        op, sp, rp, dp, ip = env_p.step_vec(step_key, state, acts, params)

        for i in range(2):
            np.testing.assert_allclose(np.asarray(rx[i]), np.asarray(rp[i]),
                                       rtol=1e-6, atol=1e-5)
            np.testing.assert_array_equal(np.asarray(dx["agents"][i]),
                                          np.asarray(dp["agents"][i]))
        # books and best-price histories identical
        for a, b in zip(jax.tree.leaves((sx.world.asks, sx.world.bids,
                                         sx.world.best_asks,
                                         sx.world.best_bids)),
                        jax.tree.leaves((sp.world.asks, sp.world.bids,
                                         sp.world.best_asks,
                                         sp.world.best_bids))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # agent states identical (inventory/PnL/quant_executed all flow
        # through the summary-based rewards)
        for a, b in zip(jax.tree.leaves(sx.agents), jax.tree.leaves(sp.agents)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-5)
        for a, b in zip(jax.tree.leaves(ox), jax.tree.leaves(op)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-5)


class TestEpisodeSemantics:
    def test_fixed_time_episode(self):
        env = make_env(world=small_world(ep_type="fixed_time",
                                         episode_time=600,
                                         start_resolution=300))
        params = env.default_params
        _, state = env.reset(KEY, params)
        actions = [jnp.asarray(0), jnp.asarray(0)]
        _, s2, _, dones, _ = env.step_env(KEY, state, actions, params)
        assert int(s2.world.time[0]) >= int(state.world.time[0])

    def test_exec_done_when_task_complete(self):
        env = make_env(agents=(
            MarketMakingConfig(),
            ExecutionConfig(action_space="fixed_quants_complex",
                            task_size=20, task="buy")))
        params = env.default_params
        _, state = env.reset(KEY, params)
        key = KEY
        done_exec = False
        for _ in range(10):
            key, sk = jax.random.split(key)
            actions = [jnp.asarray(0), jnp.asarray(9)]
            _, state, _, dones, info = env.step_env(sk, state, actions, params)
            if bool(np.asarray(dones["agents"][1][0])):
                done_exec = True
                break
        assert done_exec


class TestTokenizedObs:
    def test_mm_tokenized_obs(self):
        from vit_marl_tpu.data.tokenizer import DEFAULT_TOKENIZER
        env = make_env(agents=(
            MarketMakingConfig(observation_space="messages_tokenized"),
            ExecutionConfig(action_space="simplest_case",
                            observation_space="simplest_case",
                            reward_space="simplest_case")))
        params = env.default_params
        obs, state = env.reset(KEY, params)
        n_tok = env.num_msgs_per_step * 13 + 84
        assert obs[0].shape == (1, n_tok)
        actions = [jnp.asarray(1), jnp.asarray(1)]
        obs2, s2, r, d, i = env.step_env(KEY, state, actions, params)
        assert obs2[0].shape == (1, n_tok)
        toks = np.asarray(obs2[0])
        assert (toks >= 0).all()
        assert (toks < DEFAULT_TOKENIZER.TOTAL_NUM_TOKENS).all()

    def test_mm_raw_messages_obs(self):
        env = make_env(agents=(
            MarketMakingConfig(observation_space="messages"),
            ExecutionConfig(action_space="simplest_case",
                            observation_space="simplest_case",
                            reward_space="simplest_case")))
        params = env.default_params
        obs, state = env.reset(KEY, params)
        assert obs[0].shape == (1, env.num_msgs_per_step, 8)
        actions = [jnp.asarray(1), jnp.asarray(1)]
        obs2, *_ = env.step_env(KEY, state, actions, params)
        # step obs contains the actual combined message stream
        assert np.abs(np.asarray(obs2[0])).sum() > 0


class TestStepVec:
    def test_step_vec_matches_vmapped_step(self, env2p, env2p_params):
        n_env = 4
        keys = jax.random.split(KEY, n_env)
        obs, states = jax.vmap(env2p.reset, in_axes=(0, None))(keys,
                                                               env2p_params)
        actions = [jnp.zeros((n_env,), jnp.int32),
                   jnp.ones((n_env,), jnp.int32)]
        # step_vec splits its key internally; replicate the same split for
        # the reference vmapped path
        key = KEY
        k, k_step, k_reset = jax.random.split(key, 3)
        step_keys = jax.random.split(k_step, n_env)
        reset_keys = jax.random.split(k_reset, n_env)

        o1, s1, r1, d1, i1 = env2p.step_vec(key, states, actions, env2p_params)

        o2, s2, r2, d2, i2 = jax.vmap(
            env2p.step_env, in_axes=(0, 0, [0, 0], None))(
            step_keys, states, actions, env2p_params)
        # no episode ended at step 1, so auto-reset is a no-op
        assert not bool(np.asarray(d2["__all__"]).any())
        for a, b in zip(jax.tree.leaves((o1, s1, r1)),
                        jax.tree.leaves((o2, s2, r2))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)

    def test_step_vec_rollout(self, env2p, env2p_params):
        n_env = 4
        keys = jax.random.split(KEY, n_env)
        obs, states = jax.vmap(env2p.reset, in_axes=(0, None))(keys,
                                                               env2p_params)
        actions = [jnp.zeros((n_env,), jnp.int32),
                   jnp.ones((n_env,), jnp.int32)]
        key = KEY
        for _ in range(12):
            key, sk = jax.random.split(key)
            obs, states, rewards, dones, infos = env2p.step_vec(
                sk, states, actions, env2p_params)
        assert np.isfinite(np.asarray(rewards[0])).all()


def test_step_determinism(env2p, env2p_params):
    """Identical keys must give bit-identical trajectories."""
    def run(seed):
        key = jax.random.PRNGKey(seed)
        keys = jax.random.split(key, 4)
        obs, states = jax.vmap(env2p.reset, in_axes=(0, None))(keys,
                                                               env2p_params)
        actions = [jnp.asarray([1, 0, 2, 1]), jnp.asarray([1, 2, 0, 1])]
        outs = []
        k = key
        for _ in range(5):
            k, sk = jax.random.split(k)
            obs, states, rewards, dones, infos = env2p.step_vec(
                sk, states, actions, env2p_params)
            outs.append((obs, rewards))
        return outs

    a, b = run(7), run(7)
    for (oa, ra), (ob_, rb) in zip(a, b):
        for x, y in zip(jax.tree.leaves((oa, ra)), jax.tree.leaves((ob_, rb))):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    c = run(8)
    diff = any(not np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(jax.tree.leaves(a[-1]), jax.tree.leaves(c[-1])))
    assert diff  # different seed -> different trajectory


class TestObsSpaceShapes:
    """Every declared observation space must match the actual observation
    shape at reset AND after a step (regression: the MM 'messages' space
    declared data+own rows while the obs carried the full world stream;
    execution_policy with normalize=False emitted 22 of 28 dims)."""

    MM_SPACES = ["engineered", "basic", "messages", "messages_tokenized"]
    EXE_SPACES = ["basic", "simplest_case", "engineered", "execution_policy"]

    def _check(self, env):
        params = env.default_params
        obs, st = env.reset(KEY, params)
        acts = [sp.sample(KEY) for sp in env.action_spaces]
        obs2, _, _, _, _ = env.step(KEY, st, acts, params)
        for i, sp in enumerate(env.observation_spaces):
            for o in (obs[i], obs2[i]):
                actual = jax.tree.map(lambda v: v.shape[1:], o)  # drop inst
                if hasattr(sp, "spaces"):
                    for k, sub in sp.spaces.items():
                        assert actual[k] == sub.shape, (i, k, actual, sub.shape)
                else:
                    assert actual == sp.shape, (i, actual, sp.shape)

    @pytest.mark.parametrize("mm_space", MM_SPACES)
    def test_mm_spaces_in_2p_world(self, mm_space):
        env = make_env(agents=(
            MarketMakingConfig(observation_space=mm_space),
            ExecutionConfig(action_space="simplest_case",
                            observation_space="simplest_case",
                            reward_space="simplest_case")))
        self._check(env)

    @pytest.mark.parametrize("exe_space", EXE_SPACES)
    @pytest.mark.parametrize("normalize", [True, False])
    def test_exec_spaces(self, exe_space, normalize):
        env = make_env(agents=(
            ExecutionConfig(action_space="simplest_case",
                            observation_space=exe_space,
                            reward_space="simplest_case",
                            normalize=normalize),), n=(1,))
        self._check(env)

    def test_exec_vision_dict_space(self):
        env = make_env(agents=(
            ExecutionConfig(action_space="policy_blending",
                            observation_space="execution_policy",
                            reward_space="dual_ppo",
                            use_vision_obs=True),), n=(1,))
        self._check(env)


class TestMultiInstance:
    """Per-instance mechanics at >1 agents per type: the reference's PMAP
    config runs NUM_AGENTS_PER_TYPE=[10, 10] (ref: config/
    PMAP_ippo_rnn_JAXMARL_2player.yaml), and a round-3 bug (MM messages
    obs-space shape) only manifested in multi-agent worlds — asymmetric
    counts catch axis mixups that square configs hide."""

    @pytest.fixture(scope="class")
    def env32(self):
        return make_env(n=(3, 2))

    @pytest.fixture(scope="class")
    def params32(self, env32):
        return env32.default_params

    def test_obs_reward_done_shapes(self, env32, params32):
        obs, state = env32.reset(KEY, params32)
        assert obs[0].shape == (3, 10)
        assert obs[1].shape == (2, 12)
        actions = [jnp.zeros(3, jnp.int32), jnp.zeros(2, jnp.int32)]
        obs2, st2, rewards, dones, info = env32.step_env(
            KEY, state, actions, params32)
        assert obs2[0].shape == (3, 10) and obs2[1].shape == (2, 12)
        assert rewards[0].shape == (3,) and rewards[1].shape == (2,)
        assert dones["agents"][0].shape == (3,)
        assert dones["agents"][1].shape == (2,)

    def test_trader_ids_distinct_across_all_instances(self, env32, params32):
        tids = [int(x) for p in params32.agents
                for x in np.asarray(p.trader_id)]
        assert len(tids) == 5
        assert len(set(tids)) == 5

    def test_order_counter_scales_with_instances(self, env32, params32):
        _, state = env32.reset(KEY, params32)
        actions = [jnp.ones(3, jnp.int32), jnp.ones(2, jnp.int32)]
        _, st2, _, _, _ = env32.step_env(KEY, state, actions, params32)
        assert int(st2.world.order_id_counter) == \
            -200 - env32.num_action_msgs_per_step

    def test_per_instance_actions_diverge(self, env32, params32):
        """Exec instance 0 acts aggressively (fills now), instance 1
        stays passive — their per-instance task progress must differ."""
        _, state = env32.reset(KEY, params32)
        actions = [jnp.zeros(3, jnp.int32), jnp.asarray([1, 0])]
        _, st2, _, _, _ = env32.step_env(KEY, state, actions, params32)
        executed = np.asarray(st2.agents[1].quant_executed)
        assert executed.shape == (2,)
        assert executed[0] > executed[1]  # aggressive > passive, one step

    def test_vmapped_multi_instance_rollout(self, env32, params32):
        E = 2
        keys = jax.random.split(KEY, E)
        obs, states = jax.vmap(env32.reset, in_axes=(0, None))(
            keys, params32)
        actions = [jnp.zeros((E, 3), jnp.int32), jnp.zeros((E, 2), jnp.int32)]
        obs2, st2, rewards, dones, info = jax.vmap(
            env32.step, in_axes=(0, 0, [0, 0], None))(
            keys, states, actions, params32)
        assert obs2[0].shape == (E, 3, 10)
        assert rewards[1].shape == (E, 2)

    def test_reference_scale_10x10(self):
        env = make_env(n=(10, 10))
        params = env.default_params
        obs, state = env.reset(KEY, params)
        assert obs[0].shape == (10, 10) and obs[1].shape == (10, 12)
        actions = [jnp.ones(10, jnp.int32), jnp.ones(10, jnp.int32)]
        obs2, st2, rewards, dones, _ = env.step_env(KEY, state, actions,
                                                    params)
        assert rewards[0].shape == (10,) and rewards[1].shape == (10,)
        tids = [int(x) for p in params.agents for x in np.asarray(p.trader_id)]
        assert len(set(tids)) == 20
