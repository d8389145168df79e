"""Shared agent machinery: message netting, price ffill, trade statistics.

These helpers are identical across agent types in the reference (duplicated
in mm_env.py and vision_env.py); here they live once.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from vit_marl_tpu.config import WorldConfig, TradeCol


Array = jax.Array


def filter_messages(action_msgs: Array, cnl_msgs: Array
                    ) -> Tuple[Array, Array]:
    """Net new orders against same-price cancels
    (ref: mm_env.py:509-571 / vision_env.py:622-684).

    When a fresh action re-places an order at a price that is about to be
    cancelled and the standing quantity covers the new one, both the cancel
    and the action are reduced so the standing order simply stays (keeping
    queue priority).  Zero-quantity actions become all-zero dummy messages.
    """

    def p_in_cnl(p, prices_cnl):
        return (prices_cnl == p) & (p != 0)

    res = jax.vmap(p_in_cnl, in_axes=(0, None))(action_msgs[:, 3], cnl_msgs[:, 3])
    a_mask = jnp.any(res, axis=1)
    c_mask = jnp.any(res, axis=0)

    # Rank-pair matched actions with matched cancels (i-th matched action
    # vs i-th matched cancel, row order), like the reference.  Uses
    # compare-reduce one-hots instead of sized nonzero + argsort ranks:
    # those lower to computed-index scatters / per-env sorts, which are the
    # slowest op classes on this TPU (CLAUDE.md perf rule 5).
    n = a_mask.shape[0]
    ra = jnp.cumsum(a_mask.astype(jnp.int32)) - 1   # 0-based rank at matches
    rc = jnp.cumsum(c_mask.astype(jnp.int32)) - 1
    iota = jnp.arange(n)[:, None]
    sel_a = a_mask[None, :] & (ra[None, :] == iota)  # (n, n) one-hot rows
    sel_c = c_mask[None, :] & (rc[None, :] == iota)
    a = jnp.sum(jnp.where(sel_a, action_msgs[:, 2][None, :], 0), axis=1)
    c = jnp.sum(jnp.where(sel_c, cnl_msgs[:, 2][None, :], 0), axis=1)

    rel_cnl_quants = (c >= a) * a
    action_msgs = action_msgs.at[:, 2].set(
        action_msgs[:, 2]
        - jnp.sum(jnp.where(sel_a, rel_cnl_quants[:, None], 0), axis=0))
    action_msgs = jnp.where((action_msgs[:, 2] == 0).T, 0, action_msgs.T).T
    cnl_msgs = cnl_msgs.at[:, 2].set(
        cnl_msgs[:, 2]
        - jnp.sum(jnp.where(sel_c, rel_cnl_quants[:, None], 0), axis=0))
    return action_msgs, cnl_msgs


def ffill_best_prices(prices_quants: Array, last_valid_price: Array) -> Array:
    """Forward-fill invalid (-1) best prices over a step's message sequence
    (ref: marl_env.py:685-711)."""

    def ffill(arr, inval=-1):
        def f(prev, x):
            new = jnp.where(x != inval, x, prev)
            return new, new
        _, out = jax.lax.scan(f, inval, arr)
        return out

    prices_quants = prices_quants.at[0, 0:2].set(
        jnp.where(prices_quants[0, 0] == -1,
                  jnp.stack([last_valid_price, jnp.zeros_like(last_valid_price)]),
                  prices_quants[0, 0:2]))
    prices_quants = prices_quants.at[:, 1].set(
        jnp.where(prices_quants[:, 0] == -1, 0, prices_quants[:, 1]))
    prices_quants = prices_quants.at[:, 0].set(ffill(prices_quants[:, 0]))
    return prices_quants


class TradeStats(NamedTuple):
    """Per-step agent trade statistics (ref: mm_env.py:1906-1937)."""

    agent_trades: Array
    other_trades: Array
    agent_buys: Array
    agent_sells: Array
    buy_quant: Array
    sell_quant: Array
    traded_volume: Array
    inventory_delta: Array


def extract_trade_stats(trades: Array, trader_id: Array) -> TradeStats:
    """Split the step's trade log into this agent's buys/sells vs others.

    Reference-API surface, NOT the training hot path: rewards consume
    per-trader :class:`TradeSummary` aggregates (``summarize_trades`` /
    the kernel's in-VMEM sums) and never re-scan the trade log.  This
    trade-log formulation is kept for users of the reference's
    `get_agent_trades`-style workflow and is held consistent with the
    summary path by ``tests/test_trade_summary.py``."""
    executed = jnp.where((trades[:, TradeCol.PRICE] >= 0)[:, None], trades, 0)
    mine = ((trader_id == executed[:, TradeCol.PASS_TID])
            | (trader_id == executed[:, TradeCol.AGR_TID]))
    agent_trades = jnp.where(mine[:, None], executed, 0)
    other_trades = jnp.where(mine[:, None], 0, executed)
    q = agent_trades[:, TradeCol.QUANT]
    # q>0: passive buy filled / aggressive sell; sign plus role gives direction
    mask_buy = (((q >= 0) & (trader_id == agent_trades[:, TradeCol.PASS_TID]))
                | ((q < 0) & (trader_id == agent_trades[:, TradeCol.AGR_TID])))
    mask_sell = (((q < 0) & (trader_id == agent_trades[:, TradeCol.PASS_TID]))
                 | ((q >= 0) & (trader_id == agent_trades[:, TradeCol.AGR_TID])))
    agent_buys = jnp.where(mask_buy[:, None], agent_trades, 0)
    agent_sells = jnp.where(mask_sell[:, None], agent_trades, 0)
    buy_quant = jnp.abs(agent_buys[:, 1]).sum()
    sell_quant = jnp.abs(agent_sells[:, 1]).sum()
    return TradeStats(agent_trades, other_trades, agent_buys, agent_sells,
                      buy_quant, sell_quant, buy_quant + sell_quant,
                      buy_quant - sell_quant)


class TradeSummary(NamedTuple):
    """Linear per-agent trade statistics — the complete reward interface.

    Every reward space (MM and exec, ref: mm_env.py:1940-2298,
    vision_env.py:2063-2277) is *linear* in these sums, so they can be
    produced either from the step's trade log (:func:`summarize_trades`)
    or directly by the fused Pallas kernel's in-kernel per-trader
    aggregation (ops.book_kernel aggregate mode) without materialising a
    trade log at all.  Integer sums use int32, matching the XLA reward
    path's dtype semantics.
    """

    buy_quant: Array      # sum |q| over this agent's buy fills
    sell_quant: Array     # sum |q| over this agent's sell fills
    # All notional sums are in TICK units ((price//tick)*|q|): raw
    # price*quant sums overflow int32 at LOBSTER notionals (a $200 stock
    # traded 100k shares/step is 2e9 > 2^31), so no raw-price field is
    # exposed at all — multiply by tick at the consumer in f32 if needed.
    buy_pq_tick: Array    # sum (price//tick)*|q| over buys
    sell_pq_tick: Array
    # once-per-row sums over the agent's trades.  A self-trade (agent on
    # both sides of a fill) appears in BOTH buy_* and sell_* (reference
    # mask semantics) but only once here (reference row-wise reductions).
    agent_quant_abs: Array   # sum |q|
    agent_pq_tick: Array     # sum (price//tick)*|q|
    # sum trades[:, -2]*|q| over agent trades.  Column -2 is passive_tid;
    # the reference's trade_duration multiplies by it (vision_env.py:2247),
    # reproduced for parity.
    dur_wsum: Array
    signed_sum: Array     # sum of *signed* trade quants over agent trades
    total_quant: Array    # sum |q| over ALL executed trades this step
    total_pq_tick: Array  # sum (price//tick)*|q| over ALL executed trades

    @property
    def traded_volume(self) -> Array:
        """buy+sell volume (double-counts self-trades like the reference's
        extract-stats path, mm_env.py:1906-1937)."""
        return self.buy_quant + self.sell_quant

    @property
    def inventory_delta(self) -> Array:
        return self.buy_quant - self.sell_quant

    @property
    def other_quant(self) -> Array:
        return self.total_quant - self.agent_quant_abs

    @property
    def other_pq_tick(self) -> Array:
        return self.total_pq_tick - self.agent_pq_tick


def summarize_trades(trades: Array, trader_id: Array, tick: int
                     ) -> TradeSummary:
    """Build a :class:`TradeSummary` from a step's trade log."""
    executed = jnp.where((trades[:, TradeCol.PRICE] >= 0)[:, None], trades, 0)
    q_signed = executed[:, TradeCol.QUANT]
    q = jnp.abs(q_signed)
    p = executed[:, TradeCol.PRICE]
    is_pass = trader_id == executed[:, TradeCol.PASS_TID]
    is_agr = trader_id == executed[:, TradeCol.AGR_TID]
    mine = is_pass | is_agr
    mask_buy = mine & (((q_signed >= 0) & is_pass) | ((q_signed < 0) & is_agr))
    mask_sell = mine & (((q_signed < 0) & is_pass) | ((q_signed >= 0) & is_agr))
    pt = p // tick

    def msum(mask, v):
        return jnp.sum(jnp.where(mask, v, 0))

    return TradeSummary(
        buy_quant=msum(mask_buy, q),
        sell_quant=msum(mask_sell, q),
        buy_pq_tick=msum(mask_buy, pt * q),
        sell_pq_tick=msum(mask_sell, pt * q),
        agent_quant_abs=msum(mine, q),
        agent_pq_tick=msum(mine, pt * q),
        dur_wsum=msum(mine, executed[:, TradeCol.PASS_TID] * q),
        signed_sum=jnp.sum(jnp.where(mine, q_signed, 0)),
        total_quant=jnp.sum(q),
        total_pq_tick=jnp.sum(pt * q),
    )


def summary_from_aggs(per_agent: Array, totals: Array) -> TradeSummary:
    """TradeSummary from the fused kernel's aggregate planes.

    ``per_agent`` has the AGG_STATS (= 8: buy_q, sell_q, buy_pqt, sell_pqt,
    a_q, a_pqt, dur, signed) in the kernel's bump order — which is exactly
    TradeSummary field order — on the last axis; ``totals`` carries
    (total_quant, total_pq_tick).  Leading axes (env batch, agent instances)
    pass through.  This positional correspondence is the contract between
    ops/book_kernel.py's bump sequence and TradeSummary — change both
    together (tests/test_book_kernel.py checks it field by field).
    """
    parts = [per_agent[..., i] for i in range(per_agent.shape[-1])]
    return TradeSummary(*parts, totals[..., 0], totals[..., 1])


def summary_add_trade(s: TradeSummary, enabled: Array, trader_id: Array,
                      price: Array, quant_signed: Array, pass_tid: Array,
                      agr_tid: Array, tick: int) -> TradeSummary:
    """Fold one (artificial) trade row into a summary when ``enabled``.

    Analytic equivalent of ``add_artificial_trade`` + re-summarize, used for
    the episode-end unwind/doom trade (ref: mm_env.py:1988-2013,
    vision_env.py:2120-2146).  Divergence note: the log-based path overwrites
    the last log row when the trade log is full; the analytic fold always
    adds (strictly more faithful to the trade that economically happened).
    """
    price = jnp.asarray(price, jnp.int32)
    quant_signed = jnp.asarray(quant_signed, jnp.int32)
    q = jnp.abs(quant_signed)
    is_pass = trader_id == pass_tid
    is_agr = trader_id == agr_tid
    mine = is_pass | is_agr
    is_buy = mine & (((quant_signed >= 0) & is_pass)
                     | ((quant_signed < 0) & is_agr))
    is_sell = mine & (((quant_signed < 0) & is_pass)
                      | ((quant_signed >= 0) & is_agr))
    pt = price // tick

    def add(cur, cond, v):
        return cur + jnp.where(enabled & cond, v, 0)

    return TradeSummary(
        buy_quant=add(s.buy_quant, is_buy, q),
        sell_quant=add(s.sell_quant, is_sell, q),
        buy_pq_tick=add(s.buy_pq_tick, is_buy, pt * q),
        sell_pq_tick=add(s.sell_pq_tick, is_sell, pt * q),
        agent_quant_abs=add(s.agent_quant_abs, mine, q),
        agent_pq_tick=add(s.agent_pq_tick, mine, pt * q),
        dur_wsum=add(s.dur_wsum, mine, pass_tid * q),
        signed_sum=add(s.signed_sum, mine, quant_signed),
        total_quant=add(s.total_quant, True, q),
        total_pq_tick=add(s.total_pq_tick, True, pt * q),
    )


def floor_tick(x: Array, tick: int) -> Array:
    """Floor a price to the tick grid (the reference's ubiquitous
    ``// tick * tick``)."""
    return x // tick * tick


def add_artificial_trade(wcfg: WorldConfig, trades: Array, price: Array,
                         quant: Array, time: Array, trader_id: Array) -> Array:
    """Insert the episode-end unwind/doom trade row used only for reward
    computation (ref: mm_env.py:1988-2013, vision_env.py:2120-2146)."""
    row = jnp.concatenate([
        jnp.stack([price, quant,
                   jnp.asarray(wcfg.artificial_id_end_episode),
                   jnp.asarray(wcfg.placeholder_order_id)]),
        time,
        jnp.stack([jnp.asarray(wcfg.artificial_id_end_episode), trader_id]),
    ]).astype(jnp.int32)
    empty = trades == -1
    first_empty = jnp.where(jnp.any(empty),
                            jnp.argmax(jnp.all(empty, axis=1)),
                            trades.shape[0] - 1)
    return trades.at[first_empty].set(row)


def rolling_mean(avg: Array, new: Array, step_counter: Array) -> Array:
    """(avg * n + new) / (n + 1) (ref: vision_env.py rollingMeanValueFunc)."""
    return (avg * step_counter + new) / (step_counter + 1)


def build_action_msgs(types: Array, sides: Array, quants: Array, prices: Array,
                      order_ids: Array, trader_ids: Array, time: Array,
                      time_delay: Array) -> Array:
    """Stack the per-message columns into (n, 8) int32 messages with the
    agent's (possibly delayed) timestamps."""
    n = types.shape[0]
    times = jnp.resize(time + time_delay, (n, 2))
    msgs = jnp.stack([types, sides, quants, prices, order_ids, trader_ids],
                     axis=1)
    return jnp.concatenate([msgs, times], axis=1).astype(jnp.int32)


def normalize_obs_dict(obs: dict, means: dict, stds: dict) -> dict:
    return jax.tree.map(lambda x, m, s: (x - m) / s, obs, means, stds)


def flatten_obs_dict(obs: dict) -> Array:
    """Dict -> flat vector.  NOTE: ``ravel_pytree`` orders dict keys
    alphabetically; the reference relies on this (mm_env.py:2704-2706)."""
    flat, _ = ravel_pytree(obs)
    return flat
