"""TradeSummary: the linear trade statistics all rewards are built on.

Checks that the summary path is equivalent to direct trade-log reductions
(the shape of the original reward implementations, ref: mm_env.py:1940-2298
/ vision_env.py:2063-2277) and that the analytic doom-trade fold matches
appending the artificial trade to the log and re-summarizing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_marl_tpu.config import WorldConfig
from vit_marl_tpu.env import common

TICK = 100
TID = jnp.int32(-42)


def random_log(key, n_rows=32, n_filled=20, tids=(-42, -43, -7)):
    """Random trade log: [price, +-q, pass_oid, agr_oid, t_s, t_ns,
    pass_tid, agr_tid]; unfilled rows are -1."""
    ks = jax.random.split(key, 6)
    price = jax.random.randint(ks[0], (n_filled,), 99_000, 101_000)
    q = jax.random.randint(ks[1], (n_filled,), 1, 50)
    sign = jax.random.choice(ks[2], jnp.array([-1, 1]), (n_filled,))
    pass_tid = jax.random.choice(ks[3], jnp.array(tids), (n_filled,))
    agr_tid = jax.random.choice(ks[4], jnp.array(tids), (n_filled,))
    t = jax.random.randint(ks[5], (n_filled, 2), 34_200, 36_000)
    rows = jnp.stack([price, q * sign,
                      jnp.full((n_filled,), -100), jnp.full((n_filled,), -200),
                      t[:, 0], t[:, 1], pass_tid, agr_tid], axis=1)
    pad = jnp.full((n_rows - n_filled, 8), -1, jnp.int32)
    return jnp.concatenate([rows, pad]).astype(jnp.int32)


@pytest.mark.parametrize("seed", range(5))
def test_summarize_matches_log_reductions(seed):
    trades = random_log(jax.random.PRNGKey(seed))
    s = common.summarize_trades(trades, TID, TICK)
    st = common.extract_trade_stats(trades, TID)

    assert int(s.buy_quant) == int(st.buy_quant)
    assert int(s.sell_quant) == int(st.sell_quant)
    assert int(s.signed_sum) == int(st.agent_trades[:, 1].sum())
    buys, sells = st.agent_buys, st.agent_sells
    assert int(s.buy_pq_tick) == int(
        (buys[:, 0] // TICK * jnp.abs(buys[:, 1])).sum())
    # once-per-row sums (self-trades counted once, like the reference's
    # row-wise agentTrades reductions)
    assert int(s.agent_quant_abs) == int(jnp.abs(st.agent_trades[:, 1]).sum())
    assert int(s.agent_pq_tick) == int(
        (st.agent_trades[:, 0] // TICK * jnp.abs(st.agent_trades[:, 1])).sum())
    assert int(s.dur_wsum) == int(
        (st.agent_trades[:, -2] * jnp.abs(st.agent_trades[:, 1])).sum())
    assert int(s.other_quant) == int(jnp.abs(st.other_trades[:, 1]).sum())
    assert int(s.other_pq_tick) == int(
        (st.other_trades[:, 0] // TICK * jnp.abs(st.other_trades[:, 1])).sum())
    assert int(s.inventory_delta) == int(st.inventory_delta)
    assert int(s.traded_volume) == int(st.traded_volume)


@pytest.mark.parametrize("seed,q_signed", [(0, 17), (1, -9), (2, 120)])
def test_summary_add_trade_matches_log_append(seed, q_signed):
    wcfg = WorldConfig()
    trades = random_log(jax.random.PRNGKey(seed))
    price = jnp.int32(100_300)
    time = jnp.array([35_000, 123], jnp.int32)
    appended = common.add_artificial_trade(
        wcfg, trades, price, jnp.int32(q_signed), time, TID)
    want = common.summarize_trades(appended, TID, TICK)
    got = common.summary_add_trade(
        common.summarize_trades(trades, TID, TICK),
        jnp.bool_(True), TID, price, jnp.int32(q_signed),
        pass_tid=jnp.int32(wcfg.artificial_id_end_episode),
        agr_tid=TID, tick=TICK)
    for name, a, b in zip(want._fields, want, got):
        assert int(a) == int(b), (name, int(a), int(b))


def test_summary_add_trade_disabled_is_identity():
    trades = random_log(jax.random.PRNGKey(3))
    s0 = common.summarize_trades(trades, TID, TICK)
    s1 = common.summary_add_trade(
        s0, jnp.bool_(False), TID, jnp.int32(100_000), jnp.int32(10),
        pass_tid=jnp.int32(-666_666), agr_tid=TID, tick=TICK)
    for a, b in zip(s0, s1):
        assert int(a) == int(b)


def test_summary_under_vmap():
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    logs = jnp.stack([random_log(k) for k in keys])
    s = jax.vmap(common.summarize_trades, in_axes=(0, None, None))(
        logs, TID, TICK)
    assert s.buy_quant.shape == (4,)
    assert np.isfinite(np.asarray(s.total_pq_tick)).all()
