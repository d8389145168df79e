"""Market-making agent: action builders, rewards, observations.

Rebuild of ``MarketMakingAgent`` (ref: gymnax_exchange/jaxen/mm_env.py:134).
All methods are pure functions of (agent_params, agent_state, world_state);
the class instance holds only static config, so it can be closed over in
jitted code.  Per-instance leading axes are added by ``vmap`` in the world
env, exactly like the reference's call pattern (ref: marl_env.py:290-299).

Action spaces (ref: mm_env.py:959-1550): fixed_quants, simple, AvSt
(Avellaneda-Stoikov), fixed_prices, spread_skew, directional_trading.
Reward spaces (ref: mm_env.py:1940-2298): zero_inv, pnl, buy_sell_pnl,
complex, portfolio_value(_scaled), spooner(_damped/_scaled),
delta_netWorth, weight_pnl_inventory_pnl; inventory penalties
none/linear/quadratic/threshold.

Note: the reference's ``fixed_prices`` MM action builder references an
undefined ``state`` variable (mm_env.py:1330-1331) and cannot run; we
implement the evident intent using ``world_state``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from vit_marl_tpu.config import MarketMakingConfig, WorldConfig
from vit_marl_tpu.env import common, spaces
from vit_marl_tpu.env.structs import MMParams, MMState, WorldState
from vit_marl_tpu.lob import book as bk

Array = jax.Array


class MarketMakingAgent:
    def __init__(self, cfg: MarketMakingConfig, wcfg: WorldConfig):
        self.cfg = cfg
        self.wcfg = wcfg

    # ------------------------------------------------------------------
    # Params / reset
    # ------------------------------------------------------------------

    def default_params(self, trader_id_start: int, n_agents: int
                       ) -> Tuple[MMParams, int]:
        """(ref: mm_env.py:178-193)"""
        next_start = trader_id_start - n_agents
        params = MMParams(
            trader_id=jnp.arange(trader_id_start, next_start, -1),
            time_delay_obs_act=jnp.full((n_agents,), self.cfg.time_delay_obs_act),
            normalize=jnp.full((n_agents,), self.cfg.normalize),
        )
        return params, next_start

    def reset(self, params_i: MMParams, key: Array, world: WorldState,
              num_msgs_per_step: int) -> Tuple[Array, MMState]:
        """(ref: mm_env.py:407-448)"""
        state = MMState(inventory=jnp.int32(0), total_PnL=jnp.float32(0.0),
                        cash_balance=jnp.float32(0.0))
        if self.cfg.observation_space in ("messages", "messages_tokenized"):
            # blank message window + current L2 at reset (ref: mm_env.py:421-434)
            blank = jnp.zeros((num_msgs_per_step, 8), jnp.int32)
            lob_before = bk.get_l2_state(self.wcfg, 10, world.asks, world.bids)
        else:
            blank, lob_before = None, None
        obs = self.get_observation(world, state, params_i, blank, world.time,
                                   world.mid_price, lob_before,
                                   self.cfg.normalize, True)
        return obs, state

    # ------------------------------------------------------------------
    # Action builders
    # ------------------------------------------------------------------

    def _tick_best(self, world: WorldState) -> Tuple[Array, Array]:
        tick = self.wcfg.tick_size
        best_ask = jnp.int32(common.floor_tick(world.best_asks[-1][0], tick))
        best_bid = jnp.int32(common.floor_tick(world.best_bids[-1][0], tick))
        return best_ask, best_bid

    def _two_msgs(self, world: WorldState, params_i: MMParams,
                  bid_quant: Array, ask_quant: Array, bid_price: Array,
                  ask_price: Array) -> Array:
        n = self.cfg.num_action_messages
        return common.build_action_msgs(
            types=jnp.array([1, 1], jnp.int32),
            sides=jnp.array([1, -1], jnp.int32),
            quants=jnp.stack([bid_quant, ask_quant]).astype(jnp.int32).flatten(),
            prices=jnp.stack([bid_price, ask_price]).astype(jnp.int32).flatten(),
            order_ids=jnp.full((n,), self.wcfg.placeholder_order_id, jnp.int32),
            trader_ids=jnp.full((2,), params_i.trader_id, jnp.int32),
            time=world.time, time_delay=params_i.time_delay_obs_act)

    def _action_fixed_quants(self, action: Array, world: WorldState,
                             state: MMState, params_i: MMParams) -> Array:
        """(ref: mm_env.py:959-1037)"""
        tick = self.wcfg.tick_size
        best_ask, best_bid = self._tick_best(world)
        if not self.cfg.sell_buy_all_option:
            bid_offsets = jnp.array([0, 2, 4, -1, 0, 2, 5, -1], jnp.float32)
            ask_offsets = jnp.array([0, 2, 4, -1, 2, 0, -1, 5], jnp.float32)
            bid_quants = jnp.array([0, 1, 1, 1, 1, 1, 1, 1], jnp.int32)
            ask_quants = jnp.array([0, 1, 1, 1, 1, 1, 1, 1], jnp.int32)
        else:
            inv = state.inventory
            bid_offsets = jnp.array([0, 2, 4, -1, 0, 2, -20, 0], jnp.float32)
            ask_offsets = jnp.array([0, 2, 4, -1, 2, 0, 0, -20], jnp.float32)
            bid_quants = jnp.array([0, 1, 1, 1, 1, 1, 0, 0], jnp.int32
                                   ).at[6].set(inv // self.cfg.fixed_quant_value)
            ask_quants = jnp.array([0, 1, 1, 1, 1, 1, 0, 0], jnp.int32
                                   ).at[7].set(inv // self.cfg.fixed_quant_value)
        tick_offset = self.cfg.n_ticks_in_book * tick
        bid_price = best_bid - bid_offsets[action] * tick_offset
        ask_price = best_ask + ask_offsets[action] * tick_offset
        bid_price = jnp.int32(common.floor_tick(jnp.maximum(bid_price, 0), tick))
        ask_price = jnp.int32(common.floor_tick(
            jnp.maximum(bid_price + tick, ask_price), tick))
        return self._two_msgs(world, params_i,
                              bid_quants[action] * self.cfg.fixed_quant_value,
                              ask_quants[action] * self.cfg.fixed_quant_value,
                              bid_price, ask_price)

    def _action_simple(self, action: Array, world: WorldState, state: MMState,
                       params_i: MMParams) -> Array:
        """(ref: mm_env.py:1042-1161)"""
        tick = self.wcfg.tick_size
        best_ask, best_bid = self._tick_best(world)
        fq = self.cfg.fixed_quant_value
        n_act = 4 if self.cfg.simple_nothing_action else 3
        if not self.cfg.sell_buy_all_option:
            bid_offsets = jnp.array([0, -2000, 0, 0], jnp.float32)[:n_act]
            ask_offsets = jnp.array([0, 0, -2000, 0], jnp.float32)[:n_act]
            bid_q = jnp.array([1, 1, 0, 0], jnp.int32)[:n_act]
            ask_q = jnp.array([1, 0, 1, 0], jnp.int32)[:n_act]
            bid_quant = bid_q[action] * fq
            ask_quant = ask_q[action] * fq
        else:
            inv = state.inventory
            a_q, b_q = jax.lax.cond(
                inv > 0,
                lambda i: (jnp.maximum(jnp.abs(i), fq), jnp.asarray(fq)),
                lambda i: (jnp.asarray(fq), jnp.maximum(jnp.abs(i), fq)),
                inv)
            bid_offsets = jnp.array([0, -2000, 0, 0], jnp.float32)[:n_act]
            ask_offsets = jnp.array([0, 0, -2000, 0], jnp.float32)[:n_act]
            bid_q = jnp.array([fq, 0, 0, 0], jnp.int32).at[1].set(b_q)[:n_act]
            ask_q = jnp.array([fq, 0, 0, 0], jnp.int32).at[2].set(a_q)[:n_act]
            bid_quant = bid_q[action]
            ask_quant = ask_q[action]
        if self.cfg.fixed_action_setting:
            action = jnp.asarray(self.cfg.fixed_action)
            bid_quant = bid_q[action] * (1 if self.cfg.sell_buy_all_option else fq)
            ask_quant = ask_q[action] * (1 if self.cfg.sell_buy_all_option else fq)
        tick_offset = self.cfg.n_ticks_in_book * tick
        bid_price = best_bid - bid_offsets[action] * tick_offset
        ask_price = best_ask + ask_offsets[action] * tick_offset
        bid_price = jnp.int32(common.floor_tick(jnp.maximum(bid_price, 0), tick))
        ask_price = jnp.int32(common.floor_tick(ask_price, tick))
        return self._two_msgs(world, params_i, bid_quant, ask_quant,
                              bid_price, ask_price)

    def _action_avst(self, action: Array, world: WorldState, state: MMState,
                     params_i: MMParams) -> Array:
        """Avellaneda-Stoikov parameterised quotes (ref: mm_env.py:1166-1244)."""
        tick = self.wcfg.tick_size
        best_ask, best_bid = self._tick_best(world)
        mid_price = (best_ask + best_bid) // 2
        gamma = jnp.array([0.1, 0.2, 0.5, 1, 2, 5, 10, 20], jnp.float32)[action]
        # The reference's k estimate uses the (static) trade-log capacity
        # as the "order count" (mm_env.py:1182-1184); replicated.
        k = world.trades.shape[0] / world.delta_time + 0.1
        # Volatility from the (price, quant) best-quote history — the
        # reference includes the quantity column in the std (mm_env.py:1187-1191).
        mid_hist = (world.best_asks[-100:] + world.best_bids[-100:]) / 2
        returns = jnp.log(mid_hist[1:] / mid_hist[:-1])
        vol = jnp.clip(jnp.std(returns), 0.001, 0.2)
        variance = vol ** 2
        time_left = self.wcfg.episode_time - (world.time - world.init_time)[0]
        norm_t = time_left / self.wcfg.episode_time
        res_price = mid_price - state.inventory * gamma * variance * norm_t
        spread = (gamma * variance * norm_t
                  + (2 / gamma) * jnp.log(1 + gamma / k)) * tick
        spread = jnp.clip(spread, tick, self.wcfg.maxint)
        bid_price = jnp.clip(res_price - spread, 0, self.wcfg.maxint)
        ask_price = jnp.clip(res_price + spread, 0, self.wcfg.maxint)
        bid_price = common.floor_tick(bid_price, tick).astype(jnp.int32)
        ask_price = common.floor_tick(ask_price, tick).astype(jnp.int32)
        fq = jnp.asarray(self.cfg.fixed_quant_value)
        return self._two_msgs(world, params_i, fq, fq, bid_price, ask_price)

    def _action_spread_skew(self, action: Array, world: WorldState,
                            params_i: MMParams) -> Array:
        """(ref: mm_env.py:1352-1491)"""
        tick = self.wcfg.tick_size
        best_ask, best_bid = self._tick_best(world)
        mid_price = (best_ask + best_bid) / 2
        current_spread = best_ask - best_bid
        spread_type = action // 3
        skew_type = action % 3
        spread_multiplier = jnp.where(spread_type == 0, 1.0,
                                      self.cfg.spread_multiplier)
        new_spread = current_spread * spread_multiplier
        skew_ticks = jnp.where(skew_type == 0, -self.cfg.skew_multiplier,
                               jnp.where(skew_type == 1, 0,
                                         self.cfg.skew_multiplier))
        if self.cfg.multiplier_type == "spread":
            skewed_mid = mid_price + skew_ticks * new_spread
        else:
            skewed_mid = mid_price + skew_ticks * tick
        half = new_spread // 2
        bid_price = common.floor_tick(skewed_mid - half, tick).astype(jnp.int32)
        ask_price = common.floor_tick(skewed_mid + half, tick).astype(jnp.int32)
        fq = jnp.asarray(self.cfg.fixed_quant_value)
        return self._two_msgs(world, params_i, fq, fq, bid_price, ask_price)

    def _action_directional(self, action: Array, world: WorldState,
                            params_i: MMParams) -> Array:
        """(ref: mm_env.py:1495-1550)"""
        best_ask, best_bid = self._tick_best(world)
        q = self.cfg.fixed_quant_value
        bid_quant = jnp.array([0, 1, 0], jnp.int32)[action] * q
        ask_quant = jnp.array([0, 0, 1], jnp.int32)[action] * q
        # buy crosses at best ask, sell at best bid
        return self._two_msgs(world, params_i, bid_quant, ask_quant,
                              best_ask, best_bid)

    def _action_fixed_prices(self, action: Array, world: WorldState,
                             params_i: MMParams) -> Array:
        """Quantity-per-level action (ref: mm_env.py:1246-1350)."""
        tick = self.wcfg.tick_size
        n = self.cfg.n_actions
        best_ask, best_bid = self._tick_best(world)

        def buy_levels():
            FT = best_ask
            M = (jnp.ceil((best_bid + best_ask) / 2 // tick) * tick).astype(jnp.int32)
            BI = best_bid + tick * self.cfg.n_ticks_in_book
            NT = best_bid
            PP = best_bid - tick * self.cfg.n_ticks_in_book
            return {4: [FT, M, NT, PP], 3: [BI, NT, PP], 2: [NT, PP], 1: [NT]}[n // 2]

        def sell_levels():
            FT = best_bid
            M = (jnp.ceil((best_bid + best_ask) / 2 // tick) * tick).astype(jnp.int32)
            AI = best_ask - tick * self.cfg.n_ticks_in_book
            NT = best_ask
            PP = best_ask + tick * self.cfg.n_ticks_in_book
            return {4: [FT, M, NT, PP], 3: [AI, NT, PP], 2: [NT, PP], 1: [NT]}[n // 2]

        prices = jnp.concatenate([jnp.stack(buy_levels()),
                                  jnp.stack(sell_levels())]).astype(jnp.int32)
        sides = jnp.concatenate([jnp.ones((n // 2,), jnp.int32),
                                 -jnp.ones((n // 2,), jnp.int32)])
        return common.build_action_msgs(
            types=jnp.ones((n,), jnp.int32), sides=sides,
            quants=action.astype(jnp.int32), prices=prices,
            order_ids=jnp.full((n,), self.wcfg.placeholder_order_id, jnp.int32),
            trader_ids=jnp.full((n,), params_i.trader_id, jnp.int32),
            time=world.time, time_delay=params_i.time_delay_obs_act)

    def get_action_msgs(self, action: Array, world: WorldState, state: MMState,
                        params_i: MMParams) -> Array:
        """(ref: mm_env.py:2403-2423 wrapper)"""
        fn = {
            "fixed_quants": lambda: self._action_fixed_quants(action, world, state, params_i),
            "simple": lambda: self._action_simple(action, world, state, params_i),
            "AvSt": lambda: self._action_avst(action, world, state, params_i),
            "spread_skew": lambda: self._action_spread_skew(action, world, params_i),
            "directional_trading": lambda: self._action_directional(action, world, params_i),
            "fixed_prices": lambda: self._action_fixed_prices(action, world, params_i),
        }[self.cfg.action_space]
        return fn()

    def get_messages(self, action: Array, world: WorldState, state: MMState,
                     params_i: MMParams, key=None) -> Tuple[Array, Array]:
        """Action + cancel messages for one instance
        (ref: mm_env.py:1554-1587).  ``key`` is part of the shared agent
        interface (used by execution's randomized action reshaping)."""
        action_msgs = self.get_action_msgs(action, world, state, params_i)
        per_side = self.cfg.num_messages // 4
        cnl_bid = bk.make_cancel_msgs(world.bids, params_i.trader_id, per_side,
                                      1, world.time[0], world.time[1])
        cnl_ask = bk.make_cancel_msgs(world.asks, params_i.trader_id, per_side,
                                      -1, world.time[0], world.time[1])
        cancel_msgs = jnp.concatenate([cnl_bid, cnl_ask], axis=0)
        return common.filter_messages(action_msgs, cancel_msgs)

    # ------------------------------------------------------------------
    # Reward
    # ------------------------------------------------------------------

    def get_reward(self, world: WorldState, state: MMState, params_i: MMParams,
                   trades: Array, bestasks: Array, bestbids: Array,
                   time: Array, summary: common.TradeSummary = None
                   ) -> Tuple[Array, Dict[str, Array]]:
        """All MM reward spaces (ref: mm_env.py:1940-2298), expressed over
        :class:`common.TradeSummary` sums.  ``summary`` is normally derived
        from the step's trade log; the fused Pallas aggregate path passes it
        directly (in which case ``trades`` may be a dummy log)."""
        cfg, wcfg = self.cfg, self.wcfg
        tick = wcfg.tick_size

        if summary is None:
            summary = common.summarize_trades(trades, params_i.trader_id,
                                              tick)
        inv_before = state.inventory + summary.inventory_delta

        if wcfg.ep_type == "fixed_time":
            remaining = wcfg.episode_time - (time - world.init_time)[0]
            ep_is_over = remaining <= wcfg.last_step_seconds
        else:
            ep_is_over = world.max_steps_in_episode - world.step_counter - 1 <= 1

        averageMidprice = ((bestbids[:, 0] + bestasks[:, 0]) / 2).mean()
        last_mid_price = (world.best_bids[-1, 0] + world.best_asks[-1, 0]) / 2

        is_sell = jnp.where(inv_before > 0, 1, 0)
        FT_price = jnp.where(
            is_sell,
            common.floor_tick(bestbids[-1, 0], tick),
            common.floor_tick(bestasks[-1, 0], tick)).astype(jnp.int32)

        if cfg.reference_price_portfolio_value == "mid":
            unwind_price = (last_mid_price if cfg.based_on_mid_price_of_action
                            else averageMidprice)
        else:
            unwind_price = FT_price
        st = common.summary_add_trade(
            summary, ep_is_over & (jnp.abs(inv_before) > 0),
            params_i.trader_id, jnp.asarray(unwind_price).astype(jnp.int32),
            (jnp.sign(inv_before) * jnp.abs(inv_before)).astype(jnp.int32),
            pass_tid=jnp.asarray(wcfg.artificial_id_end_episode, jnp.int32),
            agr_tid=params_i.trader_id, tick=tick)
        new_inventory = state.inventory + st.inventory_delta

        mid_price_end = (bestbids[-1][0] + bestasks[-1][0]) / 2
        # All money terms below use the tick-unit sums (*_pq_tick): the raw
        # price*quant sums wrap int32 at LOBSTER notionals (a single
        # episode-end unwind of ~1000 shares at price 2.2e6 exceeds 2^31).
        # Fill prices are tick-aligned so pq == pq_tick * tick exactly; the
        # only sub-tick source is a mid-price unwind reference, truncated
        # to int by summary_add_trade (error < 1 per unwound share).
        PnL = (st.sell_pq_tick - st.buy_pq_tick).astype(jnp.float32)

        if cfg.reference_price_portfolio_value == "mid":
            reference_price = mid_price_end / tick
        elif cfg.reference_price_portfolio_value == "best_bid_ask":
            reference_price = jnp.where(new_inventory > 0,
                                        bestbids[-1][0] / tick,
                                        bestasks[-1][0] / tick)
        else:  # near_touch
            reference_price = jnp.where(new_inventory > 0,
                                        bestasks[-1][0] / tick,
                                        bestbids[-1][0] / tick)

        new_cash_balance = state.cash_balance + PnL
        inventoryValue = new_inventory * reference_price
        netWorth = new_cash_balance + inventoryValue
        other_exec_quants = st.other_quant
        traded_volume = st.traded_volume
        market_share = traded_volume / (traded_volume + other_exec_quants)

        InventoryPnL = state.inventory * (mid_price_end - world.mid_price) / tick
        buy_ref = last_mid_price if cfg.based_on_mid_price_of_action else averageMidprice
        buyPnL = buy_ref / tick * st.buy_quant - st.buy_pq_tick
        sellPnL = st.sell_pq_tick - buy_ref / tick * st.sell_quant
        aggr_buyPnL = (bestasks[-1][0] / tick * st.buy_quant
                       - st.buy_pq_tick)
        aggr_sellPnL = (st.sell_pq_tick
                        - bestbids[-1][0] / tick * st.sell_quant)

        reward_spooner = (aggr_buyPnL + aggr_sellPnL + InventoryPnL
                          - jnp.maximum(0, InventoryPnL))
        reward_spooner_damped = (aggr_buyPnL + aggr_sellPnL + InventoryPnL
                                 - (1 - cfg.inventoryPnL_lambda)
                                 * jnp.maximum(0, InventoryPnL))
        scaledInventoryPnL = InventoryPnL // (jnp.abs(state.inventory) + 1)
        reward_spooner_scaled = (aggr_buyPnL + aggr_sellPnL
                                 + cfg.inventoryPnL_lambda
                                 * (InventoryPnL
                                    - (1 - cfg.asymmetrically_dampened_lambda)
                                    * jnp.maximum(0, InventoryPnL)))

        avg_buy_t = jnp.where(st.buy_quant > 0,
                              st.buy_pq_tick / jnp.maximum(st.buy_quant, 1),
                              0)
        avg_sell_t = jnp.where(st.sell_quant > 0,
                               st.sell_pq_tick
                               / jnp.maximum(st.sell_quant, 1), 0)
        approx_realized = jnp.minimum(st.buy_quant, st.sell_quant) \
            * (avg_sell_t - avg_buy_t)
        approx_unrealized = jnp.where(
            st.inventory_delta > 0,
            st.inventory_delta * (averageMidprice / tick - avg_buy_t),
            jnp.abs(st.inventory_delta)
            * (avg_sell_t - averageMidprice / tick))
        reward_complex = (approx_realized
                          + cfg.unrealizedPnL_lambda * approx_unrealized
                          + cfg.inventoryPnL_lambda
                          * jnp.minimum(InventoryPnL,
                                        InventoryPnL * cfg.asymmetrically_dampened_lambda))

        reward_portfolio_value = new_inventory * reference_price + new_cash_balance

        if cfg.reference_price_portfolio_value == "mid":
            old_ref = world.mid_price / tick
        elif cfg.reference_price_portfolio_value == "best_bid_ask":
            old_ref = jnp.where(state.inventory > 0,
                                world.best_bids[-1][0] / tick,
                                world.best_asks[-1][0] / tick)
        else:
            old_ref = jnp.where(state.inventory > 0,
                                world.best_asks[-1][0] / tick,
                                world.best_bids[-1][0] / tick)
        old_netWorth = old_ref * state.inventory + state.cash_balance
        reward_delta_netWorth = netWorth - old_netWorth

        reward = {
            "portfolio_value": reward_portfolio_value,
            "portfolio_value_scaled": reward_portfolio_value / 100,
            "pnl": PnL,
            "buy_sell_pnl": buyPnL + sellPnL,
            "complex": reward_complex,
            "zero_inv": -jnp.abs(new_inventory),
            "spooner": reward_spooner,
            "spooner_damped": reward_spooner_damped,
            "spooner_scaled": reward_spooner_scaled / 10,
            "delta_netWorth": reward_delta_netWorth,
            "weight_pnl_inventory_pnl":
                buyPnL + sellPnL + cfg.inventoryPnL_lambda * InventoryPnL,
        }[cfg.reward_space]

        if cfg.inv_penalty == "none":
            inv_pen = 0.0
        elif cfg.inv_penalty == "linear":
            inv_pen = -jnp.abs(new_inventory)
        elif cfg.inv_penalty == "quadratic":
            inv_pen = -(new_inventory ** 2) / cfg.inv_penalty_quadratic_factor
        elif cfg.inv_penalty == "threshold":
            inv_pen = jnp.where(jnp.abs(new_inventory) > 50,
                                -1.0 * (new_inventory ** 2), 0.0)
        else:
            raise ValueError(f"invalid inv_penalty {cfg.inv_penalty!r}")
        reward = reward + cfg.inv_penalty_lambda * inv_pen

        if cfg.clip_reward:
            reward = jnp.clip(reward, -10_000, 10_000)
        if cfg.exclude_extreme_spreads:
            spread_ratio = (world.best_asks[:, 0] - world.best_bids[:, 0]) \
                / ((world.best_asks[:, 0] + world.best_bids[:, 0]) / 2)
            reward = jnp.where(jnp.any(spread_ratio > 0.1), 0.0, reward)

        extras = {
            "reward": reward,
            "reward_portfolio_value": reward_portfolio_value,
            "reward_complex": reward_complex,
            "reward_spooner": reward_spooner,
            "reward_spooner_damped": reward_spooner_damped,
            "reward_spooner_scaled": reward_spooner_scaled,
            "reward_delta_netWorth": reward_delta_netWorth,
            "market_share": market_share,
            "inventoryValue": inventoryValue,
            "buyPnL": buyPnL,
            "sellPnL": sellPnL,
            "PnL": PnL,
            "cash_balance": new_cash_balance,
            "netWorth": netWorth,
            "end_inventory": new_inventory,
            "mid_price": mid_price_end,
            "agentQuant": st.inventory_delta,
            "buyQuant": st.buy_quant,
            "sellQuant": st.sell_quant,
            "approx_realized_pnl": approx_realized,
            "approx_unrealized_pnl": approx_unrealized,
            "InventoryPnL": InventoryPnL,
            "scaledInventoryPnL": scaledInventoryPnL,
            "other_exec_quants": other_exec_quants,
            "averageMidprice": averageMidprice,
        }
        return reward, extras

    # ------------------------------------------------------------------
    # State update / done / info
    # ------------------------------------------------------------------

    def is_terminal(self, world: WorldState) -> Array:
        """(ref: mm_env.py:450-478)"""
        if self.wcfg.ep_type == "fixed_time":
            time_left = self.wcfg.episode_time - (world.time - world.init_time)[0]
            return time_left <= self.cfg.seconds_before_episode_end
        return world.max_steps_in_episode - world.step_counter <= 1

    def update_state(self, world: WorldState, state: MMState, extras
                     ) -> Tuple[MMState, Array, Dict[str, Array]]:
        """(ref: mm_env.py:2302-2348)"""
        new_state = MMState(
            inventory=extras["end_inventory"],
            total_PnL=state.total_PnL + extras["PnL"],
            cash_balance=extras["cash_balance"])
        done = self.is_terminal(world)
        info = {
            "reward": extras["reward"],
            "reward_portfolio_value": extras["reward_portfolio_value"],
            "reward_spooner": extras["reward_spooner"],
            "total_PnL": new_state.total_PnL,
            "done": done,
            "inventory": new_state.inventory,
            "buyPnL": extras["buyPnL"],
            "sellPnL": extras["sellPnL"],
            "inventoryValue": extras["inventoryValue"],
        }
        return new_state, done, info

    # ------------------------------------------------------------------
    # Observations
    # ------------------------------------------------------------------

    def _obs_engineered(self, world: WorldState, state: MMState,
                        normalize: bool, flatten: bool) -> Array:
        """12-dim (fixed_time) / 10-dim (fixed_steps) engineered features
        (ref: mm_env.py:2607-2731)."""
        obs = {
            "p_bid": world.best_bids[-1][0],
            "p_ask": world.best_asks[-1][0],
            "spread": jnp.abs(world.best_asks[-1][0] - world.best_bids[-1][0]),
            "q_bid": world.best_bids[-1][1],
            "q_ask": world.best_asks[-1][1],
            "mid_price": world.mid_price,
            "step_counter": world.step_counter,
            "total_PnL": state.total_PnL,
            "cash_balance": state.cash_balance,
            "inventory": state.inventory,
        }
        stds = {
            "p_bid": 1e7, "p_ask": 1e7, "spread": 1e4, "q_bid": 100,
            "q_ask": 100, "mid_price": 1e7, "step_counter": 10,
            "total_PnL": 1000, "cash_balance": 1000, "inventory": 10,
        }
        if self.wcfg.ep_type == "fixed_time":
            time = world.time[0] + world.time[1] / 1e9
            elapsed = time - (world.init_time[0] + world.init_time[1] / 1e9)
            obs["delta_time"] = world.delta_time
            obs["time_remaining"] = self.wcfg.episode_time - elapsed
            stds["delta_time"] = 10
            stds["time_remaining"] = self.wcfg.episode_time
        if normalize:
            means = {k: 0 for k in obs}
            obs = common.normalize_obs_dict(obs, means, stds)
        return common.flatten_obs_dict(obs) if flatten else obs

    def _obs_basic(self, world: WorldState, state: MMState, normalize: bool,
                   flatten: bool) -> Array:
        """(ref: mm_env.py:2568-2603)"""
        obs = {"inventory": state.inventory}
        if normalize:
            obs = common.normalize_obs_dict(obs, {"inventory": 0},
                                            {"inventory": 10})
        return common.flatten_obs_dict(obs) if flatten else obs

    def get_observation(self, world: WorldState, state: MMState,
                        params_i: MMParams, total_messages, old_time,
                        old_mid_price, lob_state_before, normalize: bool,
                        flatten: bool):
        """(ref: mm_env.py:2367-2400 wrapper)"""
        if self.cfg.observation_space == "engineered":
            return self._obs_engineered(world, state, normalize, flatten)
        if self.cfg.observation_space == "basic":
            return self._obs_basic(world, state, normalize, flatten)
        if self.cfg.observation_space == "messages":
            # raw message stream (zeros at reset), (ref: mm_env.py:2425-2427)
            return jnp.asarray(total_messages, jnp.int32)
        if self.cfg.observation_space == "messages_tokenized":
            # (ref: mm_env.py:2429-2564; the reference's variant cannot run —
            # its token-vocabulary import is commented out at mm_env.py:126)
            from vit_marl_tpu.data.tokenizer import (
                DEFAULT_TOKENIZER,
                tokenize_observation,
            )
            return tokenize_observation(
                DEFAULT_TOKENIZER, jnp.asarray(total_messages, jnp.int32),
                world.best_bids, world.best_asks, old_mid_price,
                lob_state_before, world.time)
        raise ValueError(
            f"invalid observation_space {self.cfg.observation_space!r}")

    # ------------------------------------------------------------------
    # Spaces
    # ------------------------------------------------------------------

    def action_space(self):
        """(ref: mm_env.py:2747-2765)"""
        a = self.cfg.action_space
        if a == "directional_trading":
            return spaces.Discrete(3)
        if a == "fixed_prices":
            return spaces.Box(0, 100, (self.cfg.n_actions,), jnp.int32)
        if a in ("fixed_quants", "AvSt"):
            return spaces.Discrete(8)
        if a == "spread_skew":
            return spaces.Discrete(6)
        if a == "simple":
            return spaces.Discrete(4 if self.cfg.simple_nothing_action else 3)
        raise ValueError(a)

    def _stream_len(self) -> int:
        """Rows in the message-stream observation: the WORLD's combined
        per-step stream (data + every agent's messages, set by WorldEnv at
        construction).  Standalone fallback: data + own messages, the
        reference's single-agent stream (ref: mm_env.py:2425-2427)."""
        return getattr(self, "total_msgs_per_step",
                       self.cfg.num_messages + self.wcfg.n_data_msg_per_step)

    def observation_space(self):
        """(ref: mm_env.py:2767-2793)"""
        o = self.cfg.observation_space
        if o == "engineered":
            dim = 12 if self.wcfg.ep_type == "fixed_time" else 10
            return spaces.Box(-1000, 1000, (dim,), jnp.float32)
        if o == "basic":
            return spaces.Box(-10_000, 10_000, (1,), jnp.float32)
        if o == "messages":
            n = self._stream_len()
            return spaces.Box(-self.wcfg.maxint, self.wcfg.maxint, (n, 8),
                              jnp.int32)
        if o == "messages_tokenized":
            from vit_marl_tpu.data.tokenizer import DEFAULT_TOKENIZER
            n = self._stream_len()
            return spaces.Box(0, DEFAULT_TOKENIZER.TOTAL_NUM_TOKENS - 1,
                              (n * 13 + 84,), jnp.int32)
        raise ValueError(o)
