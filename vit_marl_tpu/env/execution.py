"""Execution agent (vision-fork superset): optimal-execution RL agent.

Rebuild of the live ``ExecutionAgent`` (ref: gymnax_exchange/jaxen/
vision_env.py:134; the non-vision exec_env.py:134 provides the legacy
"normal" reward, also implemented here).

Capabilities:

- action spaces (ref: vision_env.py:832-1534): fixed_quants,
  fixed_quants_complex, fixed_quants_1msg, fixed_prices, simplest_case,
  twap (baseline), policy_blending (continuous Box(3,) dual-PPO blend over
  the top-3 book levels);
- observations (ref: vision_env.py:2344-2700): engineered (12/15-dim),
  basic, simplest_case, execution_policy (10 private + 2x9 normalized book
  features), plus the optional ``{"obs", "vision_obs"}`` dict with the
  normalized ``(levels, 3, 2)`` book image (gap-to-mid in ticks, log1p
  volume, log1p cumulative volume per side, ref: vision_env.py:2804-2854);
- rewards (ref: exec_env.py:1698-1930 "normal"/finish_fast/simplest_case;
  vision_env.py:2063-2277 "dual_ppo" r_comp + alpha * r_mimic);
- episode-end doom trade at a penalised far-touch price, used only inside
  the reward computation (ref: vision_env.py:2105-2146).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from vit_marl_tpu.config import ExecutionConfig, WorldConfig
from vit_marl_tpu.env import common, spaces
from vit_marl_tpu.env.structs import ExecParams, ExecState, WorldState
from vit_marl_tpu.lob import book as bk
from vit_marl_tpu.utils.ints import hamilton_apportionment_permuted

Array = jax.Array


class ExecutionAgent:
    def __init__(self, cfg: ExecutionConfig, wcfg: WorldConfig):
        self.cfg = cfg
        self.wcfg = wcfg
        if cfg.action_type == "delta" and cfg.action_space == "fixed_prices":
            # the twapV3 delta baseline is a 2-vector (FT, NT)
            # (ref: vision_env.py:591-609)
            assert cfg.n_actions == 2, (
                "action_type='delta' requires n_actions=2 (FT, NT ladder)")

    # ------------------------------------------------------------------
    # Params / reset
    # ------------------------------------------------------------------

    def default_params(self, trader_id_start: int, n_agents: int
                       ) -> Tuple[ExecParams, int]:
        """(ref: vision_env.py:184-199)"""
        next_start = trader_id_start - n_agents
        params = ExecParams(
            trader_id=jnp.arange(trader_id_start, next_start, -1),
            task_size=jnp.full((n_agents,), self.cfg.task_size),
            reward_lambda=jnp.full((n_agents,), self.cfg.reward_lambda),
            time_delay_obs_act=jnp.full((n_agents,), self.cfg.time_delay_obs_act),
            normalize=jnp.full((n_agents,), self.cfg.normalize),
        )
        return params, next_start

    def reset(self, params_i: ExecParams, key: Array, world: WorldState,
              num_msgs_per_step: int = 0) -> Tuple[Array, ExecState]:
        """(ref: vision_env.py:420-477)"""
        if self.cfg.task == "random":
            is_sell = jax.random.randint(key, (), 0, 2)
        else:
            is_sell = jnp.asarray(0 if self.cfg.task == "buy" else 1)
        z = jnp.float32(0.0)
        state = ExecState(
            init_price=world.mid_price,
            # per-INSTANCE task size (defaults to cfg.task_size via
            # default_params; heterogeneous agents may override the vector)
            task_to_execute=jnp.asarray(params_i.task_size, jnp.int32),
            quant_executed=jnp.int32(0),
            total_revenue=z, drift_return=z, advantage_return=z,
            slippage_rm=z, price_adv_rm=z, price_drift_rm=z, vwap_rm=z,
            is_sell_task=is_sell, trade_duration=z)
        obs = self.get_observation(world, state, params_i, None, world.time,
                                   world.mid_price, None,
                                   self.cfg.normalize, True)
        return obs, state

    # ------------------------------------------------------------------
    # Price ladders
    # ------------------------------------------------------------------

    def _best(self, world: WorldState) -> Tuple[Array, Array]:
        tick = self.wcfg.tick_size
        return (jnp.int32(common.floor_tick(world.best_asks[-1][0], tick)),
                jnp.int32(common.floor_tick(world.best_bids[-1][0], tick)))

    def _ladder(self, best_ask: Array, best_bid: Array,
                is_sell_task: Array) -> Array:
        """(FT, M, NT, PP) for the task direction from a pair of best
        quotes (ref: vision_env.py:848-869; the ceil(x//tick) in the sell
        mid reproduces the reference's own no-op quirk)."""
        tick = self.wcfg.tick_size

        def buy():
            FT = best_ask
            M = common.floor_tick((best_bid + best_ask) // 2, tick)
            NT = best_bid
            PP = best_bid - tick * self.cfg.n_ticks_in_book
            return jnp.stack([FT, M, NT, PP])

        def sell():
            FT = best_bid
            M = (jnp.ceil((best_bid + best_ask) / 2 // tick)
                 * tick).astype(jnp.int32)
            NT = best_ask
            PP = best_ask + tick * self.cfg.n_ticks_in_book
            return jnp.stack([FT, M, NT, PP])

        return jax.lax.cond(is_sell_task, sell, buy).astype(jnp.int32)

    def _task_prices(self, world: WorldState, state: ExecState) -> Array:
        """Ladder from the instantaneous best quotes."""
        best_ask, best_bid = self._best(world)
        return self._ladder(best_ask, best_bid, state.is_sell_task)

    def _make_msgs(self, world: WorldState, state: ExecState,
                   params_i: ExecParams, quants: Array, prices: Array) -> Array:
        n = self.cfg.num_action_messages
        side = 1 - state.is_sell_task * 2
        return common.build_action_msgs(
            types=jnp.ones((n,), jnp.int32),
            sides=side * jnp.ones((n,), jnp.int32),
            quants=quants.astype(jnp.int32),
            prices=prices.astype(jnp.int32),
            order_ids=jnp.full((n,), self.wcfg.placeholder_order_id, jnp.int32),
            trader_ids=jnp.full((n,), params_i.trader_id, jnp.int32),
            time=world.time, time_delay=params_i.time_delay_obs_act)

    def _cap_quants(self, quants: Array, quant_array_ft: Array,
                    state: ExecState) -> Array:
        """Cap at the remaining task using the reference's
        all-remaining-at-first-level fallback (ref: vision_env.py:906-913)."""
        quant_left = state.task_to_execute - state.quant_executed
        return jnp.where(quants.sum() <= quant_left, quants,
                         jnp.floor(quant_array_ft * quant_left)).astype(jnp.int32)

    # ------------------------------------------------------------------
    # Action builders
    # ------------------------------------------------------------------

    def _action_fixed_quants(self, action, world, state, params_i):
        """(ref: vision_env.py:832-935)"""
        prices = self._task_prices(world, state)
        row1 = jnp.array([10, 0, 0, 0] if self.cfg.larger_far_touch_quant
                         else [1, 0, 0, 0])
        quant_array = jnp.array([
            [0, 0, 0, 0], [1, 0, 0, 0], [0, 1, 0, 0],
            [0, 0, 1, 0], [0, 0, 0, 1]]).at[1].set(row1)
        quants = (quant_array[action, :] * self.cfg.fixed_quant_value).flatten()
        quants = self._cap_quants(quants, quant_array[1], state)
        return self._make_msgs(world, state, params_i, quants, prices)

    def _action_fixed_quants_complex(self, action, world, state, params_i):
        """13 actions: 4 levels x {1, 2, 5}x quant + no-trade
        (ref: vision_env.py:1046-1143)"""
        prices = self._task_prices(world, state)
        quant_array = jnp.array([
            [0, 0, 0, 0],
            [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1],
            [2, 0, 0, 0], [0, 2, 0, 0], [0, 0, 2, 0], [0, 0, 0, 2],
            [5, 0, 0, 0], [0, 5, 0, 0], [0, 0, 5, 0], [0, 0, 0, 5]])
        quants = (quant_array[action, :] * self.cfg.fixed_quant_value).flatten()
        quants = self._cap_quants(quants, quant_array[1], state)
        return self._make_msgs(world, state, params_i, quants, prices)

    def _action_fixed_quants_1msg(self, action, world, state, params_i):
        """Single-message ladder (ref: vision_env.py:941-1040)"""
        prices4 = self._task_prices(world, state)
        # one message: the level selected by the action (0 = no trade)
        level = jnp.maximum(action - 1, 0)
        price = prices4[level].reshape(1)
        quant = jnp.where(action == 0, 0, self.cfg.fixed_quant_value).reshape(1)
        quant_left = state.task_to_execute - state.quant_executed
        quant = jnp.minimum(quant, quant_left)
        return self._make_msgs(world, state, params_i, quant, price)

    def _action_simplest(self, action, world, state, params_i):
        """0=no trade, 1=aggressive (FT), 2=passive (NT)
        (ref: vision_env.py:1145-1211)"""
        prices4 = self._task_prices(world, state)
        prices = jnp.stack([prices4[0], prices4[2]])  # (FT, NT)
        fq = self.cfg.fixed_quant_value
        quant_array = jnp.array([[0, 0], [fq, 0], [0, fq]])
        quants = quant_array[action, :].flatten()
        quants = self._cap_quants(quants, quant_array[1], state)
        return self._make_msgs(world, state, params_i, quants, prices)

    def _fixed_prices_ladder(self, world: WorldState, state: ExecState
                             ) -> Array:
        """Price ladder for the fixed_prices space, built from the *mean of
        the last 10* best quotes (ref: vision_env.py:1294-1306); size depends
        on n_actions: 4 -> (FT, M, NT, PP), 3 -> (FT, NT, PP), 2 -> (FT, NT),
        1 -> (FT,) (ref: vision_env.py:1252-1279)."""
        tick = self.wcfg.tick_size
        best_ask = jnp.int32(common.floor_tick(
            world.best_asks[-10:, 0].mean(), tick))
        best_bid = jnp.int32(common.floor_tick(
            world.best_bids[-10:, 0].mean(), tick))
        full = self._ladder(best_ask, best_bid, state.is_sell_task)
        n = self.cfg.n_actions
        idx = {4: [0, 1, 2, 3], 3: [0, 2, 3], 2: [0, 2], 1: [0]}[n]
        return full[jnp.array(idx)]

    def _action_fixed_prices(self, action, world, state, params_i):
        """Quantity per price level (ref: vision_env.py:1213-1327).

        With n_actions == 4 and mid == near-touch, the mid order is folded
        into the near-touch one (ref: vision_env.py:1219-1236)."""
        prices = self._fixed_prices_ladder(world, state)
        quants = action.astype(jnp.int32)
        if self.cfg.n_actions == 4:
            combine = prices[1] == prices[2]
            quants = jnp.where(
                combine,
                quants.at[2].add(quants[1]).at[1].set(0), quants)
            prices = jnp.where(combine, prices.at[1].set(-1), prices)
        return self._make_msgs(world, state, params_i, quants, prices)

    def _twap_v3_quants(self, world: WorldState, state: ExecState,
                        key: Array) -> Array:
        """twapV3 two-level split (ref: vision_env.py:578-593): a random
        permutation of (ceil(q/steps) - q//2, q//2) across (FT, NT); switches
        to two market-size orders in the last 60 seconds."""
        remaining_time = (self.wcfg.episode_time
                          - (world.time - world.init_time)[0])
        if_market = remaining_time <= 60
        quant_left = state.task_to_execute - state.quant_executed
        steps_left = jnp.maximum(
            world.max_steps_in_episode - world.step_counter, 1)
        step_quant = jnp.ceil(quant_left / steps_left).astype(jnp.int32)
        limit_quants = jax.random.permutation(
            key, jnp.stack([step_quant - step_quant // 2, step_quant // 2]),
            independent=True)
        market_quants = jnp.stack([step_quant, step_quant])
        return jnp.where(if_market, market_quants, limit_quants)

    def _action_twap_v3(self, action, world, state, params_i, key):
        """twapV3 baseline as a standalone action space: two-level permuted
        TWAP split over the (FT, NT) ladder with the last-minute market-order
        switch (ref: vision_env.py:578-593); the policy action is ignored.
        Quantities pass through the reference's round -> clip -> Hamilton
        truncation (vision_env.py:595-603) so the baseline can never exceed
        the remaining task (the market-order switch sends step_quant at BOTH
        levels, which would otherwise overshoot on the final steps)."""
        k_twap, k_ham = jax.random.split(key)
        prices4 = self._task_prices(world, state)
        prices = jnp.stack([prices4[0], prices4[2]])  # (FT, NT)
        quants = self._twap_v3_quants(world, state, k_twap)
        remain = state.task_to_execute - state.quant_executed
        quants = jnp.round(quants).clip(0, remain).astype(jnp.int32)
        quants = jnp.where(
            quants.sum() <= remain, quants,
            hamilton_apportionment_permuted(quants, remain, k_ham)
        ).astype(jnp.int32)
        return self._make_msgs(world, state, params_i, quants, prices)

    def _reshape_action(self, action, world, state, key):
        """fixed_prices action post-processing (ref: vision_env.py:577-610):
        'delta' adds the action to the twapV3 baseline; quantities are then
        rounded, clipped to the remaining task, and — if they still exceed
        it — truncated by randomized Hamilton apportionment.

        RNG note: the reference reuses one key for the twapV3 permutation and
        the Hamilton tie-break; we split (cleaner key discipline, same
        per-use distribution)."""
        k_twap, k_ham = jax.random.split(key)
        if self.cfg.action_type == "delta":
            action = self._twap_v3_quants(world, state, k_twap) + action
        remain = state.task_to_execute - state.quant_executed
        action = jnp.round(action).clip(0, remain).astype(jnp.int32)
        return jnp.where(
            action.sum() <= remain, action,
            hamilton_apportionment_permuted(action, remain, k_ham)
        ).astype(jnp.int32)

    def _action_twap(self, action, world, state, params_i):
        """TWAP baseline (ref: vision_env.py:1329-1424); fixed_steps only."""
        if self.wcfg.ep_type != "fixed_steps":
            raise NotImplementedError("twap requires fixed_steps episodes")
        # max(…, 1): a one-step episode (short data window) would divide by
        # zero and ceil(inf) saturates to an int32-garbage order size
        steps_left = jnp.maximum(
            world.max_steps_in_episode - world.step_counter - 1, 1)
        quant_left = state.task_to_execute - state.quant_executed
        step_quant = jnp.ceil(quant_left / steps_left).astype(jnp.int32)
        prices4 = self._task_prices(world, state)
        prices = jnp.stack([prices4[0], prices4[2]])  # (FT, NT)
        quant_array = jnp.array([[1, 0], [0, 1]])
        quants = (quant_array[action, :] * step_quant).flatten()
        return self._make_msgs(world, state, params_i, quants, prices)

    def _action_policy_blending(self, action, world, state, params_i):
        """Continuous dual-PPO blend over the top-3 levels
        (ref: vision_env.py:1426-1534).

        Default (reference-faithful): all three orders are PASSIVE at the
        own-side top-3 levels.  With ``cfg.blend_aggressive`` (documented
        divergence, see config.py): level 1 is the FAR TOUCH — it crosses
        the spread and fills immediately, giving the dual_ppo ``r_comp``
        term gradient at short horizons where passive orders rarely fill.
        """
        tick = self.wcfg.tick_size
        l2 = bk.get_vision_l2_state(self.wcfg, 3, world.asks, world.bids)
        ask_prices = l2[:, 0, 0]
        bid_prices = l2[:, 0, 1]
        aggressive = self.cfg.blend_aggressive

        def buy_prices():
            p1 = ask_prices[0] if aggressive else bid_prices[0]
            q2 = bid_prices[0] if aggressive else bid_prices[1]
            p2 = jnp.where(q2 != -1, q2, p1 - tick)
            q3 = bid_prices[1] if aggressive else bid_prices[2]
            p3 = jnp.where(q3 != -1, q3, p2 - tick)
            return jnp.stack([p1, p2, p3]).astype(jnp.int32)

        def sell_prices():
            p1 = bid_prices[0] if aggressive else ask_prices[0]
            q2 = ask_prices[0] if aggressive else ask_prices[1]
            p2 = jnp.where(q2 != -1, q2, p1 + tick)
            q3 = ask_prices[1] if aggressive else ask_prices[2]
            p3 = jnp.where(q3 != -1, q3, p2 + tick)
            return jnp.stack([p1, p2, p3]).astype(jnp.int32)

        prices3 = jax.lax.cond(state.is_sell_task, sell_prices, buy_prices)
        v_twap = state.task_to_execute / world.max_steps_in_episode
        v_base = jnp.array([v_twap, 0.0, 0.0])
        target = jnp.floor(jnp.maximum(0, v_base + v_twap * action)).astype(jnp.int32)
        quant_left = state.task_to_execute - state.quant_executed
        total = jnp.sum(target)
        scale = jnp.where(total > quant_left,
                          quant_left / (total + 1e-6), 1.0)
        target = jnp.floor(target * scale).astype(jnp.int32)
        n = self.cfg.num_action_messages
        quants = jnp.zeros((n,), jnp.int32).at[0:3].set(target)
        prices = jnp.zeros((n,), jnp.int32).at[0:3].set(prices3)
        return self._make_msgs(world, state, params_i, quants, prices)

    def get_action_msgs(self, action, world, state, params_i,
                        key=None) -> Array:
        if self.cfg.action_space == "twap_v3":
            return self._action_twap_v3(action, world, state, params_i, key)
        fn = {
            "fixed_quants": self._action_fixed_quants,
            "fixed_quants_complex": self._action_fixed_quants_complex,
            "fixed_quants_1msg": self._action_fixed_quants_1msg,
            "simplest_case": self._action_simplest,
            "fixed_prices": self._action_fixed_prices,
            "twap": self._action_twap,
            "policy_blending": self._action_policy_blending,
        }[self.cfg.action_space]
        return fn(action, world, state, params_i)

    def get_messages(self, action, world, state, params_i,
                     key=None) -> Tuple[Array, Array]:
        """(ref: vision_env.py:1537-1587; action reshaping from the
        fork's _reshape_action, vision_env.py:577-610)"""
        if key is None:
            if self.cfg.action_space in ("fixed_prices", "twap_v3"):
                # these spaces consume randomness (Hamilton tie-break
                # permutation / twapV3 level split); a silent fixed key
                # would degenerate the randomisation every step
                raise ValueError(
                    f"action_space={self.cfg.action_space!r} requires a PRNG "
                    "key: pass key= to get_messages")
            key = jax.random.PRNGKey(0)
        key, k_reshape = jax.random.split(key)
        if self.cfg.action_space == "fixed_prices":
            action = self._reshape_action(action, world, state, k_reshape)
        action_msgs = self.get_action_msgs(action, world, state, params_i,
                                           key=key)
        side_sign = 1 - state.is_sell_task * 2
        book_side = jax.tree.map(
            lambda a, b: jnp.where(state.is_sell_task, a, b),
            world.asks, world.bids)
        cancel_msgs = bk.make_cancel_msgs(
            book_side, params_i.trader_id, self.cfg.num_messages // 2,
            side_sign, world.time[0], world.time[1])
        return common.filter_messages(action_msgs, cancel_msgs)

    # ------------------------------------------------------------------
    # Reward
    # ------------------------------------------------------------------

    def get_reward(self, world: WorldState, state: ExecState,
                   params_i: ExecParams, trades: Array, bestasks: Array,
                   bestbids: Array, time: Array,
                   summary: common.TradeSummary = None
                   ) -> Tuple[Array, Dict[str, Array]]:
        """Doom trade + reward (ref: vision_env.py:2063-2277 dual_ppo;
        exec_env.py:1698-1930 normal/finish_fast/simplest_case).

        All reward formulas are expressed over :class:`common.TradeSummary`
        sums.  ``summary`` is normally derived from the step's trade log;
        the fused Pallas aggregate path passes it directly (in which case
        ``trades`` may be a dummy log).
        """
        cfg, wcfg = self.cfg, self.wcfg
        tick = wcfg.tick_size

        if summary is None:
            summary = common.summarize_trades(trades, params_i.trader_id,
                                              tick)
        # reference quirk: quant executed this step is |sum of signed
        # quants|, not sum of |quants| (ref: vision_env.py:2077)
        quant_this_step = jnp.abs(summary.signed_sum)
        quant_left0 = state.task_to_execute - (state.quant_executed
                                               + quant_this_step)

        if wcfg.ep_type == "fixed_time":
            remaining = wcfg.episode_time - (time - world.init_time)[0]
            ep_is_over = remaining <= wcfg.last_step_seconds
        else:
            ep_is_over = world.max_steps_in_episode - world.step_counter - 1 <= 1

        penalty = cfg.doom_price_penalty
        doom_price = jnp.where(
            state.is_sell_task,
            common.floor_tick(bestbids[-1, 0] * (1 - penalty), tick),
            common.floor_tick(bestasks[-1, 0] * (1 + penalty), tick)
        ).astype(jnp.int32)
        side_sign = state.is_sell_task * 2 - 1
        s = common.summary_add_trade(
            summary, ep_is_over & (jnp.abs(quant_left0) > 0),
            params_i.trader_id, doom_price,
            (side_sign * jnp.abs(quant_left0)).astype(jnp.int32),
            pass_tid=jnp.asarray(wcfg.artificial_id_end_episode, jnp.int32),
            agr_tid=params_i.trader_id, tick=tick)
        doom_quant = ep_is_over * quant_left0

        agentQuant = s.agent_quant_abs
        direction = jnp.sign(state.is_sell_task * 2 - 1)
        revenue = s.agent_pq_tick
        rm = lambda avg, new: common.rolling_mean(avg, new, world.step_counter)

        trade_duration_step = ((s.dur_wsum
                                - world.init_time[0] * agentQuant)
                               / state.task_to_execute)
        trade_duration = state.trade_duration + trade_duration_step
        quant_left = state.task_to_execute - state.quant_executed - agentQuant

        if cfg.reward_space == "dual_ppo":
            # ref: vision_env.py:2160-2240
            p_benchmark = jnp.where(state.is_sell_task,
                                    bestbids[-1, 0] // tick,
                                    bestasks[-1, 0] // tick)
            v_base = state.task_to_execute / world.max_steps_in_episode
            c_base_matched = agentQuant * p_benchmark
            r_comp = direction * (revenue - c_base_matched)
            r_mimic_scaled = -jnp.abs(agentQuant - v_base) / (v_base + 1.0)
            reward = r_comp + cfg.mimic_alpha * r_mimic_scaled
            drift = direction * agentQuant * (p_benchmark
                                              - state.init_price // tick)
            vwap_rm = rm(state.vwap_rm, p_benchmark)
            price_adv_rm = rm(state.price_adv_rm, r_comp)
            slippage_rm = rm(state.slippage_rm,
                             revenue - (state.init_price // tick) * agentQuant)
            price_drift_rm = rm(state.price_drift_rm,
                                p_benchmark - state.init_price // tick)
            advantage = r_comp
            reward_lam1 = r_comp
            reward_scaled = reward
        else:
            # legacy path (ref: exec_env.py:1751-1930)
            other_q = s.other_quant
            vwap = jnp.where(
                other_q == 0,
                state.init_price / tick,
                s.other_pq_tick / jnp.maximum(other_q, 1))
            vwap_rm = rm(state.vwap_rm, vwap)
            price_adv_rm = rm(state.price_adv_rm,
                              revenue / (agentQuant + 0.001) - vwap)
            slippage_rm = rm(state.slippage_rm,
                             revenue - state.init_price // tick * agentQuant)
            price_drift_rm = rm(state.price_drift_rm,
                                vwap - state.init_price // tick)
            advantage = direction * (revenue - vwap * agentQuant)
            drift = direction * agentQuant * (vwap - state.init_price // tick)
            reward = advantage + params_i.reward_lambda * drift
            reward_lam1 = direction * (
                revenue - (state.init_price // tick) * agentQuant)
            reward_scaled = reward
            if cfg.reward_space == "finish_fast":
                reward = -jnp.abs(quant_left)
                reward_scaled = reward / 10
            elif cfg.reward_space == "simplest_case":
                sign = jnp.where(state.is_sell_task, 1.0, -1.0)
                # sum((p - init_price) * |q|) computed wrap-free: raw
                # price*quant sums overflow int32 at LOBSTER notionals and
                # the f32 subtraction of ~1e9 terms destroys the small true
                # value.  Fill prices are tick-aligned, so
                # agent_pq == agent_pq_tick * tick exactly; split init_price
                # into tick floor (exact int arithmetic, small residual)
                # plus sub-tick fraction (exact in f32).
                iq = jnp.floor(state.init_price / tick).astype(jnp.int32)
                frac = state.init_price - iq.astype(jnp.float32) * tick
                diff_ticks = s.agent_pq_tick - iq * agentQuant   # int32 exact
                reward = sign * (diff_ticks.astype(jnp.float32) * tick
                                 - frac * agentQuant)
                reward_scaled = reward / cfg.task_size

        extras = {
            "reward": reward_scaled,
            "agentQuant": agentQuant,
            "revenue": revenue,
            "reward_lam1": reward_lam1,
            "slippage_rm": slippage_rm,
            "price_adv_rm": price_adv_rm,
            "price_drift_rm": price_drift_rm,
            "vwap_rm": vwap_rm,
            "advantage": advantage,
            "drift": drift,
            "doom_quant": doom_quant,
            "quant_left": quant_left,
            "trade_duration": trade_duration,
        }
        return reward_scaled, extras

    # ------------------------------------------------------------------
    # State update / done / info
    # ------------------------------------------------------------------

    def is_terminal(self, world: WorldState, state: ExecState) -> Array:
        """(ref: vision_env.py:480-518)"""
        task_done = state.task_to_execute - state.quant_executed <= 0
        if self.wcfg.ep_type == "fixed_time":
            time_done = (self.wcfg.episode_time
                         - (world.time - world.init_time)[0]
                         <= self.cfg.seconds_before_episode_end)
        else:
            time_done = world.max_steps_in_episode - world.step_counter <= 1
        return time_done | task_done

    def update_state(self, world: WorldState, state: ExecState, extras
                     ) -> Tuple[ExecState, Array, Dict[str, Array]]:
        """(ref: vision_env.py:2281-2342)"""
        new_state = state.replace(
            quant_executed=state.quant_executed + extras["agentQuant"],
            total_revenue=state.total_revenue + extras["revenue"],
            drift_return=state.drift_return + extras["drift"],
            advantage_return=state.advantage_return + extras["advantage"],
            slippage_rm=extras["slippage_rm"],
            price_adv_rm=extras["price_adv_rm"],
            price_drift_rm=extras["price_drift_rm"],
            vwap_rm=extras["vwap_rm"],
            trade_duration=extras["trade_duration"])
        done = self.is_terminal(world, new_state)
        info = {
            "quant_left": extras["quant_left"],
            "done": done,
            "revenue_direction_normalised": extras["reward_lam1"],
            "drift": extras["drift"],
            "advantage": extras["advantage"],
            "doom_quant": extras["doom_quant"],
            "is_sell_task": new_state.is_sell_task,
            "reward": extras["reward"],
        }
        return new_state, done, info

    # ------------------------------------------------------------------
    # Observations
    # ------------------------------------------------------------------

    def _obs_simplest(self, world, state, normalize, flatten):
        """(ref: vision_env.py:2344-2379)"""
        used = world.time - world.init_time
        obs = {
            "percent_time_remaining":
                (self.wcfg.episode_time - (used[0] + used[1] / 1e9))
                / self.wcfg.episode_time,
            "percent_remaining_quant":
                (state.task_to_execute - state.quant_executed)
                / state.task_to_execute,
            "mid_price": world.mid_price,
        }
        means = {"percent_time_remaining": 0.5, "percent_remaining_quant": 0.5,
                 "mid_price": 7_560_000}
        stds = {"percent_time_remaining": 1, "percent_remaining_quant": 1,
                "mid_price": 1e3}
        if normalize:
            obs = common.normalize_obs_dict(obs, means, stds)
        return common.flatten_obs_dict(obs) if flatten else obs

    def _obs_basic(self, world, state, normalize, flatten):
        """(ref: vision_env.py:2382-2408)"""
        obs = {
            "best_ask_price": world.best_asks[-1][0],
            "best_bid_price": world.best_bids[-1][0],
            "remaining_quant": state.task_to_execute - state.quant_executed,
        }
        means = {"best_ask_price": 1_550_000, "best_bid_price": 1_550_000,
                 "remaining_quant": 0}
        stds = {"best_ask_price": 1e3, "best_bid_price": 1e3,
                "remaining_quant": self.cfg.task_size}
        if normalize:
            obs = common.normalize_obs_dict(obs, means, stds)
        return common.flatten_obs_dict(obs) if flatten else obs

    def _obs_engineered(self, world, state, normalize, flatten):
        """12-dim fixed_steps / 15-dim fixed_time (ref: vision_env.py:2415-2470,
        2487-2560)."""
        quote_aggr, quote_pass = jax.lax.cond(
            state.is_sell_task,
            lambda: (world.best_bids[-1], world.best_asks[-1]),
            lambda: (world.best_asks[-1], world.best_bids[-1]))
        sign_switch = 2 * state.is_sell_task - 1
        obs = {
            "is_sell_task": state.is_sell_task,
            "p_aggr": quote_aggr[0] * sign_switch,
            "p_pass": quote_pass[0] * sign_switch,
            "spread": jnp.abs(quote_aggr[0] - quote_pass[0]),
            "q_aggr": quote_aggr[1],
            "q_pass": quote_pass[1],
            "init_price": state.init_price,
            "current_task_size": state.task_to_execute,
            "executed_quant": state.quant_executed,
            "remaining_quant": state.task_to_execute - state.quant_executed,
            "step_counter": world.step_counter,
            "remaining_ratio": jnp.where(
                world.max_steps_in_episode == 0, 0.0,
                1.0 - world.step_counter / world.max_steps_in_episode),
        }
        means = {
            "is_sell_task": 0,
            "p_aggr": state.init_price * sign_switch,
            "p_pass": state.init_price * sign_switch,
            "spread": 0, "q_aggr": 0, "q_pass": 0, "init_price": 0,
            "current_task_size": 0, "executed_quant": 0, "remaining_quant": 0,
            "step_counter": 0, "remaining_ratio": 0,
        }
        stds = {
            "is_sell_task": 1, "p_aggr": 1e5, "p_pass": 1e5, "spread": 1e4,
            "q_aggr": 100, "q_pass": 100, "init_price": 1e7,
            "current_task_size": self.cfg.task_size,
            "executed_quant": self.cfg.task_size,
            "remaining_quant": self.cfg.task_size,
            "step_counter": 30, "remaining_ratio": 1,
        }
        if self.wcfg.ep_type == "fixed_time":
            t = world.time[0] + world.time[1] / 1e9
            elapsed = t - (world.init_time[0] + world.init_time[1] / 1e9)
            obs.update(time=t, delta_time=world.delta_time,
                       time_remaining=self.wcfg.episode_time - elapsed)
            means.update(time=0, delta_time=0, time_remaining=0)
            stds.update(time=1e5, delta_time=10,
                        time_remaining=self.wcfg.episode_time)
        if normalize:
            obs = common.normalize_obs_dict(obs, means, stds)
        return common.flatten_obs_dict(obs) if flatten else obs

    def normalize_vision_obs(self, raw: Array, world: WorldState) -> Array:
        """Raw (levels, 2, 2) book image -> (levels, 3, 2) features:
        (gap-to-mid in ticks, log1p volume, log1p cumulative volume) per
        (ask, bid) channel (ref: vision_env.py:2804-2854)."""
        tick = self.wcfg.tick_size
        mid = world.mid_price

        def side_feats(prices, vols, gap_sign):
            valid = prices != -1
            gap = jnp.where(valid, gap_sign * (prices - mid) / tick, 0)
            clean = jnp.where(valid, vols, 0)
            log_vol = jnp.log1p(clean)
            cum = jnp.log1p(jnp.where(valid, jnp.cumsum(clean), 0))
            return jnp.stack([gap, log_vol, cum], axis=1)

        feat_ask = side_feats(raw[:, 0, 0], raw[:, 1, 0], 1.0)
        feat_bid = side_feats(raw[:, 0, 1], raw[:, 1, 1], -1.0)
        return jnp.stack([feat_ask, feat_bid], axis=-1)

    def get_vision_obs(self, world: WorldState, normalize: bool) -> Array:
        """(ref: vision_env.py:2709-2721)"""
        raw = bk.get_vision_l2_state(self.wcfg, self.cfg.vision_levels,
                                     world.asks, world.bids)
        if normalize:
            return self.normalize_vision_obs(raw, world)
        return raw.astype(jnp.float32)

    def _obs_execution_policy(self, world, state, normalize):
        """10 private + 9 aggressive-side + 9 passive-side features
        (ref: vision_env.py:2574-2707)."""
        raw3 = bk.get_vision_l2_state(self.wcfg, 3, world.asks, world.bids)
        if normalize:
            feats = self.normalize_vision_obs(raw3, world)
        else:
            # unnormalized counterpart of the (gap, vol, cumvol) layout —
            # raw (levels, 2, 2) is (price, vol) only, and slicing it as
            # the 3-feature layout would silently emit a 22-dim obs
            # against the declared 28-dim space
            price = raw3[:, 0, :].astype(jnp.float32)
            vol = raw3[:, 1, :].astype(jnp.float32)
            cum = jnp.cumsum(jnp.maximum(vol, 0), axis=0)
            feats = jnp.stack([price, vol, cum], axis=1)
        # channel 0 = asks, 1 = bids; aggressive side faces the task
        aggr = jnp.where(state.is_sell_task, feats[:, :, 1], feats[:, :, 0])
        pass_ = jnp.where(state.is_sell_task, feats[:, :, 0], feats[:, :, 1])
        t = world.time[0] + world.time[1] / 1e9
        elapsed = t - (world.init_time[0] + world.init_time[1] / 1e9)
        priv = {
            "is_sell_task": state.is_sell_task,
            "time": t,
            "delta_time": world.delta_time,
            "time_remaining": self.wcfg.episode_time - elapsed,
            "init_price": state.init_price,
            "current_task_size": state.task_to_execute,
            "executed_quant": state.quant_executed,
            "remaining_quant": state.task_to_execute - state.quant_executed,
            "step_counter": world.step_counter,
            "remaining_ratio": jnp.where(
                world.max_steps_in_episode == 0, 0.0,
                1.0 - world.step_counter / world.max_steps_in_episode),
        }
        if normalize:
            means = {k: 0 for k in priv}
            stds = {
                "is_sell_task": 1, "time": 1e5, "delta_time": 10,
                "time_remaining": self.wcfg.episode_time, "init_price": 1e7,
                "current_task_size": self.cfg.task_size,
                "executed_quant": self.cfg.task_size,
                "remaining_quant": self.cfg.task_size,
                "step_counter": 30, "remaining_ratio": 1,
            }
            priv = common.normalize_obs_dict(priv, means, stds)
        private_feats = jnp.stack([
            priv["is_sell_task"], priv["init_price"],
            priv["current_task_size"], priv["executed_quant"],
            priv["remaining_quant"], priv["step_counter"],
            priv["remaining_ratio"], priv["time"], priv["delta_time"],
            priv["time_remaining"]]).astype(jnp.float32)
        return jnp.concatenate([private_feats, aggr.flatten(), pass_.flatten()])

    def get_observation(self, world, state, params_i, total_messages, old_time,
                        old_mid_price, lob_state_before, normalize, flatten):
        """(ref: vision_env.py:1622-1651 wrapper). Returns a dict
        {"obs", "vision_obs"} when ``use_vision_obs`` is set, matching the
        fork's dual observation contract."""
        o = self.cfg.observation_space
        if o == "engineered":
            exec_obs = self._obs_engineered(world, state, normalize, flatten)
        elif o == "basic":
            exec_obs = self._obs_basic(world, state, normalize, flatten)
        elif o == "simplest_case":
            exec_obs = self._obs_simplest(world, state, normalize, flatten)
        elif o == "execution_policy":
            exec_obs = self._obs_execution_policy(world, state, normalize)
        else:
            raise ValueError(f"invalid observation_space {o!r}")
        if self.cfg.use_vision_obs:
            return {"obs": exec_obs,
                    "vision_obs": self.get_vision_obs(world, normalize)}
        return exec_obs

    # ------------------------------------------------------------------
    # Spaces
    # ------------------------------------------------------------------

    def action_space(self):
        """(ref: vision_env.py:2856-2884)"""
        a = self.cfg.action_space
        if a == "fixed_prices":
            return spaces.Box(0, 100, (self.cfg.n_actions,), jnp.int32)
        if a == "policy_blending":
            low = jnp.array([-1.0, 0.0, 0.0], jnp.float32)
            high = jnp.array([3.0, 1.0, 1.0], jnp.float32)
            return spaces.Box(low, high, (3,), jnp.float32)
        return spaces.Discrete(self.cfg.num_actions)

    def observation_space(self):
        """(ref: vision_env.py:2887-2913)"""
        o = self.cfg.observation_space
        if o == "basic" or o == "simplest_case":
            exec_space = spaces.Box(-10_000, 10_000, (3,), jnp.float32)
        elif o == "engineered":
            dim = 15 if self.wcfg.ep_type == "fixed_time" else 12
            exec_space = spaces.Box(-10_000, 10_000, (dim,), jnp.float32)
        elif o == "execution_policy":
            exec_space = spaces.Box(-10_000, 10_000, (28,), jnp.float32)
        else:
            raise ValueError(o)
        if self.cfg.use_vision_obs:
            vision = spaces.Box(-100, 1e8,
                                (self.cfg.vision_levels, 3, 2), jnp.float32)
            return spaces.Dict({"obs": exec_space, "vision_obs": vision})
        return exec_space
