"""Golden + differential tests for the vectorized matching engine.

Strategy (SURVEY.md section 4's "do better" plan):
- hand-written golden scenarios assert exact book/trade contents;
- differential tests replay random message streams through both the
  vectorized engine and the sequential numpy oracle and require identical
  final books and trade logs;
- property tests check invariants (quantity conservation, price-time
  priority) on random streams.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_marl_tpu.config import EngineConfig, CancelMode, MsgCol
from vit_marl_tpu.lob import book as bk
from vit_marl_tpu.lob import engine
from vit_marl_tpu.lob.oracle import OracleBook
from vit_marl_tpu.utils.fixtures import (
    random_aggressive_message,
    random_book,
    random_cancel_for_book,
    random_message,
)

CFG = EngineConfig(n_orders=20, n_trades=20)
KEY = jax.random.PRNGKey(0)


def _pad(rows, n, width):
    arr = np.full((n, width), -1, dtype=np.int32)
    rows = np.asarray(rows, dtype=np.int32).reshape(-1, width)
    arr[: len(rows)] = rows
    return jnp.asarray(arr)


def make_book(cfg, asks=None, bids=None, trades=None):
    b = bk.init_book(cfg)
    if asks is not None:
        b = b.replace(asks=bk.side_from_dense(_pad(asks, cfg.n_orders, 6)))
    if bids is not None:
        b = b.replace(bids=bk.side_from_dense(_pad(bids, cfg.n_orders, 6)))
    if trades is not None:
        b = b.replace(trades=_pad(trades, cfg.n_trades, 8))
    # engine precondition: sorted-prefix invariant
    return bk.canonicalize_book(b)


def msg(type_, side, quant, price, oid=-300, tid=-300, ts=34_201, tns=0):
    return jnp.array([type_, side, quant, price, oid, tid, ts, tns], jnp.int32)


def book_sets(state):
    """Canonical comparable form: sets of occupied order rows + trade rows."""
    asks = np.asarray(bk.side_to_dense(state.asks))
    bids = np.asarray(bk.side_to_dense(state.bids))
    trades = np.asarray(state.trades)
    rows = lambda a: sorted(map(tuple, a[a[:, 0] != -1]))
    return rows(asks), rows(bids), sorted(map(tuple, trades[trades[:, 0] != -1]))


# -----------------------------------------------------------------------
# Golden scenarios
# -----------------------------------------------------------------------


class TestGolden:
    def test_add_limit_to_empty_book(self):
        b = bk.init_book(CFG)
        b = engine.process_message(CFG, b, KEY, msg(1, 1, 10, 100_000))
        dense = np.asarray(bk.side_to_dense(b.bids))
        assert (dense[0] == [100_000, 10, -300, -300, 34_201, 0]).all()
        assert (dense[1:] == -1).all()
        assert (np.asarray(bk.side_to_dense(b.asks)) == -1).all()
        assert (np.asarray(b.trades) == -1).all()

    def test_full_match_single_order(self):
        asks = [[100_000, 10, -10, -10, 34_200, 0]]
        b = make_book(CFG, asks=asks)
        b = engine.process_message(CFG, b, KEY, msg(1, 1, 10, 100_000, oid=-300))
        assert (np.asarray(bk.side_to_dense(b.asks)) == -1).all()
        assert (np.asarray(bk.side_to_dense(b.bids)) == -1).all()
        tr = np.asarray(b.trades)
        # bid aggressor -> negative trade quantity (-side * q)
        assert (tr[0] == [100_000, -10, -10, -300, 34_201, 0, -10, -300]).all()

    def test_partial_fill_remainder_added(self):
        asks = [[100_000, 4, -10, -10, 34_200, 0]]
        b = make_book(CFG, asks=asks)
        b = engine.process_message(CFG, b, KEY, msg(1, 1, 10, 100_100, oid=-300))
        bids = np.asarray(bk.side_to_dense(b.bids))
        assert (bids[0] == [100_100, 6, -300, -300, 34_201, 0]).all()
        tr = np.asarray(b.trades)
        assert tr[0][1] == -4

    def test_partial_fill_standing_order_survives(self):
        asks = [[100_000, 50, -10, -10, 34_200, 0]]
        b = make_book(CFG, asks=asks)
        b = engine.process_message(CFG, b, KEY, msg(1, 1, 10, 100_000, oid=-300))
        asks_d = np.asarray(bk.side_to_dense(b.asks))
        assert (asks_d[0] == [100_000, 40, -10, -10, 34_200, 0]).all()
        assert (np.asarray(bk.side_to_dense(b.bids)) == -1).all()

    def test_price_priority(self):
        # two asks, cheaper one must fill first
        asks = [[100_200, 5, -10, -10, 34_200, 0],
                [100_000, 5, -11, -11, 34_200, 5]]
        b = make_book(CFG, asks=asks)
        b = engine.process_message(CFG, b, KEY, msg(1, 1, 7, 100_200, oid=-300))
        tr = np.asarray(b.trades)
        assert tr[0][0] == 100_000 and tr[0][1] == -5
        assert tr[1][0] == 100_200 and tr[1][1] == -2

    def test_time_priority_tiebreak(self):
        asks = [[100_000, 5, -10, -10, 34_200, 10],
                [100_000, 5, -11, -11, 34_200, 3]]
        b = make_book(CFG, asks=asks)
        b = engine.process_message(CFG, b, KEY, msg(1, 1, 5, 100_000, oid=-300))
        tr = np.asarray(b.trades)
        assert tr[0][2] == -11  # earlier time_ns matched first

    def test_slot_index_tiebreak(self):
        asks = [[100_000, 5, -10, -10, 34_200, 0],
                [100_000, 5, -11, -11, 34_200, 0]]
        b = make_book(CFG, asks=asks)
        b = engine.process_message(CFG, b, KEY, msg(1, 1, 5, 100_000, oid=-300))
        tr = np.asarray(b.trades)
        assert tr[0][2] == -10  # identical priority -> lower slot first

    def test_ask_side_aggressor_sign(self):
        bids = [[100_000, 10, -10, -10, 34_200, 0]]
        b = make_book(CFG, bids=bids)
        b = engine.process_message(CFG, b, KEY, msg(1, -1, 6, 100_000, oid=-300))
        tr = np.asarray(b.trades)
        assert tr[0][1] == 6  # -(-1) * 6

    def test_match_type_is_opposite_side_limit(self):
        # MATCH (type 4) with side=+1 behaves as an *ask* limit hitting bids
        bids = [[100_000, 10, -10, -10, 34_200, 0]]
        b = make_book(CFG, bids=bids)
        b = engine.process_message(CFG, b, KEY, msg(4, 1, 10, 100_000, oid=-300))
        assert (np.asarray(bk.side_to_dense(b.bids)) == -1).all()
        tr = np.asarray(b.trades)
        assert tr[0][1] == -10  # raw side (+1) drives the sign

    def test_cancel_strict_by_id(self):
        bids = [[100_000, 10, -50, -50, 34_200, 0]]
        b = make_book(CFG, bids=bids)
        b = engine.process_message(CFG, b, KEY, msg(2, 1, 4, 100_000, oid=-50))
        assert np.asarray(b.bids.quant)[0] == 6
        b = engine.process_message(CFG, b, KEY, msg(2, 1, 6, 100_000, oid=-50))
        assert (np.asarray(bk.side_to_dense(b.bids)) == -1).all()

    def test_delete_is_cancel(self):
        bids = [[100_000, 10, -50, -50, 34_200, 0]]
        b = make_book(CFG, bids=bids)
        b = engine.process_message(CFG, b, KEY, msg(3, 1, 10, 100_000, oid=-50))
        assert (np.asarray(bk.side_to_dense(b.bids)) == -1).all()

    def test_cancel_falls_back_to_init_order(self):
        bids = [[100_000, 10, CFG.init_id, CFG.init_id, 34_200, 0]]
        b = make_book(CFG, bids=bids)
        # unknown oid, but price matches an init order with enough quantity
        b = engine.process_message(CFG, b, KEY, msg(2, 1, 4, 100_000, oid=-777))
        assert np.asarray(b.bids.quant)[0] == 6

    def test_cancel_init_fallback_needs_enough_quantity(self):
        bids = [[100_000, 3, CFG.init_id, CFG.init_id, 34_200, 0]]
        b = make_book(CFG, bids=bids)
        b = engine.process_message(CFG, b, KEY, msg(2, 1, 4, 100_000, oid=-777))
        # no eligible fallback (3 < 4): reference wraps to last slot (empty
        # here) -> no-op on the standing order
        assert np.asarray(b.bids.quant)[0] == 3

    def test_cancel_strict_mode_ignores_inits(self):
        cfg = EngineConfig(n_orders=20, n_trades=20,
                           cancel_mode=CancelMode.STRICT_BY_ID)
        bids = [[100_000, 10, cfg.init_id, cfg.init_id, 34_200, 0]]
        b = make_book(cfg, bids=bids)
        b = engine.process_message(cfg, b, KEY, msg(2, 1, 4, 100_000, oid=-777))
        assert np.asarray(b.bids.quant)[0] == 10

    def test_noop_message(self):
        asks, bids, trades = random_book(CFG, np.random.default_rng(1))
        b = make_book(CFG, asks, bids, trades)
        b2 = engine.process_message(CFG, b, KEY, jnp.zeros(8, jnp.int32))
        assert book_sets(b) == book_sets(b2)

    def test_crossing_stops_at_price(self):
        asks = [[100_000, 5, -10, -10, 34_200, 0],
                [100_100, 5, -11, -11, 34_200, 0],
                [100_300, 5, -12, -12, 34_200, 0]]
        b = make_book(CFG, asks=asks)
        b = engine.process_message(CFG, b, KEY, msg(1, 1, 100, 100_100, oid=-300))
        asks_d = np.asarray(bk.side_to_dense(b.asks))
        occ = asks_d[asks_d[:, 0] != -1]
        assert (occ[:, 0] == 100_300).all()          # only far level survives
        bids_d = np.asarray(bk.side_to_dense(b.bids))
        assert bids_d[bids_d[:, 0] != -1][0, 1] == 90  # 100 - 10 matched

    def test_trade_log_overflow_keeps_last(self):
        cfg = EngineConfig(n_orders=8, n_trades=3)
        asks = [[100_000, 1, -10, -10, 34_200, 0],
                [100_001, 1, -11, -11, 34_200, 0],
                [100_002, 1, -12, -12, 34_200, 0],
                [100_003, 1, -13, -13, 34_200, 0],
                [100_004, 1, -14, -14, 34_200, 0]]
        b = make_book(cfg, asks=asks)
        b = engine.process_message(cfg, b, KEY, msg(1, 1, 5, 100_004, oid=-300))
        tr = np.asarray(b.trades)
        assert tr[0][2] == -10 and tr[1][2] == -11
        assert tr[2][2] == -14  # overflow: last-matched trade wins slot n-1

    def test_book_overflow_overwrites_last_slot(self):
        cfg = EngineConfig(n_orders=2, n_trades=4)
        bids = [[100_000, 5, -10, -10, 34_200, 0],
                [99_000, 5, -11, -11, 34_200, 0]]
        b = make_book(cfg, bids=bids)
        b = engine.process_message(cfg, b, KEY, msg(1, 1, 7, 98_000, oid=-300))
        bids_d = np.asarray(bk.side_to_dense(b.bids))
        assert (bids_d[0] == [100_000, 5, -10, -10, 34_200, 0]).all()
        assert (bids_d[1] == [98_000, 7, -300, -300, 34_201, 0]).all()


# -----------------------------------------------------------------------
# Differential vs sequential oracle
# -----------------------------------------------------------------------


def run_both(cfg, msgs, asks, bids, trades):
    b = make_book(cfg, asks, bids, trades)
    b = engine.process_messages(cfg, KEY, jnp.asarray(np.array(msgs), jnp.int32), b)
    oracle = OracleBook(cfg)
    oracle.load_dense(asks, bids, trades)
    oracle.process_all(msgs)
    return b, oracle


def assert_equal_books(vec, oracle):
    # the engine's arena may contain holes; compare canonical sorted layouts
    np.testing.assert_array_equal(
        np.asarray(bk.side_to_dense(bk.sort_side(vec.asks, is_bid=False)),
                   dtype=np.int64),
        oracle.dense(oracle.asks))
    np.testing.assert_array_equal(
        np.asarray(bk.side_to_dense(bk.sort_side(vec.bids, is_bid=True)),
                   dtype=np.int64),
        oracle.dense(oracle.bids))
    np.testing.assert_array_equal(
        np.asarray(vec.trades, dtype=np.int64), oracle.trades)


@pytest.mark.parametrize("seed", range(12))
def test_differential_random_streams(seed):
    rng = np.random.default_rng(seed)
    cfg = EngineConfig(n_orders=24, n_trades=24)
    asks, bids, trades = random_book(cfg, rng, percent_fill=0.4)
    msgs = []
    t = 34_201
    oid = -300
    for i in range(120):
        roll = rng.random()
        if roll < 0.45:
            m = random_message(rng, time_s=t, oid=oid, tid=oid, kind="limit")
        elif roll < 0.6:
            m = random_aggressive_message(rng, asks, bids, time_s=t, oid=oid)
        elif roll < 0.8:
            side_arr = asks if rng.random() < 0.5 else bids
            sign = -1 if side_arr is asks else 1
            m = random_cancel_for_book(rng, side_arr, sign, time_s=t)
        elif roll < 0.9:
            m = random_message(rng, time_s=t, oid=oid, tid=oid, kind="match")
        else:
            m = random_message(rng, time_s=t, oid=oid, tid=oid, kind="noop")
        msgs.append(m)
        t += 1
        oid -= 1
    vec, oracle = run_both(cfg, msgs, asks, bids, trades)
    assert_equal_books(vec, oracle)


@pytest.mark.parametrize("seed", range(6))
def test_differential_tiny_book_heavy_overflow(seed):
    """Small capacities force the overflow/index-wrap edge paths."""
    rng = np.random.default_rng(100 + seed)
    cfg = EngineConfig(n_orders=6, n_trades=5)
    asks, bids, trades = random_book(cfg, rng, percent_fill=0.8, n_levels=3)
    msgs = [random_message(rng, time_s=34_201 + i, oid=-300 - i, tid=-300 - i,
                           n_levels=4, quant_range=(1, 800))
            for i in range(80)]
    vec, oracle = run_both(cfg, msgs, asks, bids, trades)
    assert_equal_books(vec, oracle)


# -----------------------------------------------------------------------
# Properties
# -----------------------------------------------------------------------


def test_quantity_conservation(rng):
    """limit-in == standing + traded when nothing overflows."""
    cfg = EngineConfig(n_orders=64, n_trades=64)
    b = bk.init_book(cfg)
    total_in = 0
    msgs = []
    for i in range(40):
        m = random_message(rng, time_s=34_201 + i, oid=-300 - i, kind="limit",
                           quant_range=(1, 50))
        total_in += int(m[MsgCol.QUANT])
        msgs.append(m)
    b = engine.process_messages(cfg, KEY, jnp.asarray(np.array(msgs), jnp.int32), b)
    standing = int(jnp.sum(jnp.maximum(b.asks.quant, 0))
                   + jnp.sum(jnp.maximum(b.bids.quant, 0)))
    traded = int(jnp.sum(jnp.abs(jnp.where(b.trades[:, 0] != -1,
                                           b.trades[:, 1], 0))))
    assert standing + 2 * traded == total_in  # each trade consumes both sides


def test_vmap_consistency(rng):
    """vmapped engine == per-env loop."""
    cfg = EngineConfig(n_orders=16, n_trades=16)
    n_env = 4
    books, msgs_all = [], []
    for e in range(n_env):
        asks, bids, trades = random_book(cfg, rng, percent_fill=0.5)
        books.append(make_book(cfg, asks, bids, trades))
        msgs_all.append([random_message(rng, time_s=34_201 + i, oid=-300 - i)
                         for i in range(30)])
    stacked = jax.tree.map(lambda *v: jnp.stack(v), *books)
    msgs_arr = jnp.asarray(np.array(msgs_all), jnp.int32)
    keys = jax.random.split(KEY, n_env)
    out = jax.vmap(engine.process_messages, in_axes=(None, 0, 0, 0))(
        cfg, keys, msgs_arr, stacked)
    for e in range(n_env):
        single = engine.process_messages(cfg, keys[e], msgs_arr[e], books[e])
        got = jax.tree.map(lambda v: v[e], out)
        for a, g in zip(jax.tree.leaves(single), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(g))


def test_random_cancel_mode_statistics():
    """CANCEL_UNIFORM picks orders at the price uniformly at random."""
    cfg = EngineConfig(n_orders=8, n_trades=8,
                       cancel_mode=CancelMode.CANCEL_UNIFORM)
    bids = [[100_000, 10, 10, 10, 34_200, 0],
            [100_000, 10, 11, 11, 34_200, 0],
            [100_000, 10, 12, 12, 34_200, 0]]
    b0 = make_book(cfg, bids=bids)
    hit = {10: 0, 11: 0, 12: 0}
    m = msg(2, 1, 10, 100_000, oid=999)  # unknown oid -> random fallback
    for s in range(120):
        out = engine.process_message(cfg, b0, jax.random.PRNGKey(s), m)
        remaining = set(np.asarray(out.bids.oid)[np.asarray(out.bids.price) != -1])
        gone = {10, 11, 12} - remaining
        assert len(gone) == 1
        hit[gone.pop()] += 1
    assert all(v > 10 for v in hit.values())
