"""Tests for book queries: L2 aggregation, lookups, cancel-message builder."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_marl_tpu.config import EngineConfig
from vit_marl_tpu.lob import book as bk
from vit_marl_tpu.lob import engine
from vit_marl_tpu.lob.orderbook import OrderBook

CFG = EngineConfig(n_orders=16, n_trades=16)
KEY = jax.random.PRNGKey(0)


def side_from_rows(rows, n=16):
    arr = np.full((n, 6), -1, dtype=np.int32)
    rows = np.asarray(rows, dtype=np.int32).reshape(-1, 6)
    arr[: len(rows)] = rows
    return bk.side_from_dense(jnp.asarray(arr))


ASKS = side_from_rows([
    [100_200, 5, 10, 10, 34_200, 0],
    [100_100, 3, 11, 11, 34_200, 1],
    [100_100, 2, 12, 12, 34_200, 2],
    [100_400, 7, 13, 13, 34_200, 3],
])
BIDS = side_from_rows([
    [99_900, 4, 20, 20, 34_200, 0],
    [99_800, 6, 21, 21, 34_200, 1],
    [99_900, 1, 22, 22, 34_200, 2],
])


def test_side_levels_match_unique_reference():
    """The sort-free level extraction == the fixed-size-unique formulation
    (the reference's method, JaxOrderBookArrays.py:1086-1093) on random
    canonical books."""
    from vit_marl_tpu.utils.fixtures import random_book

    rng = np.random.default_rng(7)
    for trial in range(8):
        asks_d, bids_d, _ = random_book(CFG, rng,
                                        percent_fill=rng.uniform(0.1, 1.0))
        asks = bk.sort_side(bk.side_from_dense(jnp.asarray(asks_d, jnp.int32)),
                            False)
        bids = bk.sort_side(bk.side_from_dense(jnp.asarray(bids_d, jnp.int32)),
                            True)
        for n_levels in (3, 10, 20):
            bid_p = -1 * jnp.unique(-1 * bids.price, size=n_levels,
                                    fill_value=1)
            ask_p = jnp.unique(jnp.where(asks.price == -1, CFG.maxint,
                                         asks.price),
                               size=n_levels, fill_value=-1)
            ask_p = jnp.where(ask_p == CFG.maxint, -1, ask_p)
            vol = jax.vmap(bk.volume_at_price, in_axes=(None, 0))
            want_av = jnp.maximum(vol(asks, ask_p), 0)
            want_bv = jnp.maximum(vol(bids, bid_p), 0)
            got_ap, got_av = bk._side_levels(asks, n_levels)
            got_bp, got_bv = bk._side_levels(bids, n_levels)
            np.testing.assert_array_equal(np.asarray(ask_p), np.asarray(got_ap))
            np.testing.assert_array_equal(np.asarray(bid_p), np.asarray(got_bp))
            np.testing.assert_array_equal(np.asarray(want_av), np.asarray(got_av))
            np.testing.assert_array_equal(np.asarray(want_bv), np.asarray(got_bv))


def test_best_prices():
    assert int(bk.best_ask(CFG, ASKS)) == 100_100
    assert int(bk.best_bid(CFG, BIDS)) == 99_900
    a, b = bk.best_bid_and_ask_incl_quants(CFG, ASKS, BIDS)
    assert a.tolist() == [100_100, 5]
    assert b.tolist() == [99_900, 5]


def test_best_prices_empty_book():
    empty = bk.init_side(16)
    assert int(bk.best_ask(CFG, empty)) == -1
    assert int(bk.best_bid(CFG, empty)) == -1


def test_volume_at_price():
    assert int(bk.volume_at_price(ASKS, 100_100)) == 5
    assert int(bk.volume_at_price(ASKS, 123)) == 0


def test_l2_state_layout():
    # L2 extraction requires the sorted-arena invariant (engine-produced
    # states satisfy it; external books must pass sort_side first)
    l2 = bk.get_l2_state(CFG, 3, bk.sort_side(ASKS, False),
                         bk.sort_side(BIDS, True))
    # [ask_p, ask_q, bid_p, bid_q] x levels, best level first
    assert l2.tolist() == [
        100_100, 5, 99_900, 5,
        100_200, 5, 99_800, 6,
        100_400, 7, -1, 0,       # missing bid level -> price -1, vol 0
    ]


def test_l2_state_empty_fills():
    empty = bk.init_side(16)
    l2 = bk.get_l2_state(CFG, 2, empty, empty)
    assert l2.tolist() == [-1, 0, -1, 0, -1, 0, -1, 0]


def test_vision_l2_state():
    v = bk.get_vision_l2_state(CFG, 3, bk.sort_side(ASKS, False),
                               bk.sort_side(BIDS, True))
    assert v.shape == (3, 2, 2)
    # channel 0 = asks, channel 1 = bids
    assert v[:, 0, 0].tolist() == [100_100, 100_200, 100_400]
    assert v[:, 1, 0].tolist() == [5, 5, 7]
    assert v[:, 0, 1].tolist() == [99_900, 99_800, -1]
    assert v[:, 1, 1].tolist() == [5, 6, 0]


def test_lookups():
    row = bk.get_order_by_id(ASKS, 11)
    assert row.tolist() == [100_100, 3, 11, 11, 34_200, 1]
    assert bk.get_order_by_id(ASKS, 999).tolist() == [-1] * 6
    row = bk.get_order_by_id_and_price(ASKS, 12, 100_100)
    assert row[2] == 12
    row = bk.get_order_by_time(ASKS, 34_200, 3)
    assert row[2] == 13
    assert bk.get_order_by_time(ASKS, 1, 1).tolist() == [-2] * 6


def test_next_executable_order():
    best = bk.get_next_executable_order(CFG, 0, ASKS)
    assert best[0] == 100_100 and best[2] == 11  # earlier time_ns wins
    best = bk.get_next_executable_order(CFG, 1, BIDS)
    assert best[0] == 99_900 and best[2] == 20


def test_agent_trades_filter():
    trades = jnp.asarray(np.array([
        [100, 5, 1, 2, 34_200, 0, 7, 8],
        [101, -3, 3, 4, 34_200, 0, 9, 7],
        [-1] * 8,
    ] + [[-1] * 8] * 13, dtype=np.int32))
    mine = bk.get_agent_trades(trades, 7)
    assert mine[0].tolist()[0] == 100
    assert mine[1].tolist()[0] == 101
    assert (np.asarray(mine[2:]) == 0).all()
    other = bk.get_agent_trades(trades, 8)
    assert other[0][0] == 100 and (np.asarray(other[1:]) == 0).all()


def test_init_msgs_from_l2_roundtrip():
    # L2 row: [ask_p, ask_q, bid_p, bid_q] x levels
    l2 = jnp.array([100_100, 5, 99_900, 4, 100_200, 2, 99_800, 6], jnp.int32)
    msgs = bk.init_msgs_from_l2(CFG, l2)
    book = engine.process_messages(CFG, KEY, msgs, bk.init_book(CFG))
    out = bk.get_l2_state(CFG, 2, book.asks, book.bids)
    assert out.tolist() == l2.tolist()
    # init orders carry init_id
    occ = np.asarray(book.asks.oid)[np.asarray(book.asks.price) != -1]
    assert (occ == CFG.init_id).all()


def test_init_volume_at_price():
    side = side_from_rows([
        [100_000, 5, CFG.init_id, CFG.init_id, 34_200, 0],
        [100_000, 3, 44, 44, 34_200, 0],
    ])
    assert int(bk.init_volume_at_price(CFG, side, 100_000)) == 5


def test_make_cancel_msgs():
    side = side_from_rows([
        [100_000, 5, 30, 7, 34_200, 0],
        [100_100, 3, 31, 8, 34_200, 0],
        [100_200, 2, 32, 7, 34_200, 0],
    ])
    msgs = bk.make_cancel_msgs(side, 7, 4, -1, 34_300, 5)
    assert msgs.shape == (4, 8)
    assert msgs[0].tolist() == [2, -1, 5, 100_000, 30, 7, 34_300, 5]
    assert msgs[1].tolist() == [2, -1, 2, 100_200, 32, 7, 34_300, 5]
    # unmatched rows are harmless zero cancels
    assert msgs[2].tolist() == [2, -1, 0, 0, 0, 0, 34_300, 5]
    # applying them removes exactly trader 7's orders
    book = bk.init_book(CFG).replace(asks=side)
    book = engine.process_messages(CFG, KEY, msgs, book)
    left = np.asarray(book.asks.tid)[np.asarray(book.asks.price) != -1]
    assert left.tolist() == [8]


def test_orderbook_facade_reset_and_process():
    ob = OrderBook(CFG)
    l2 = jnp.array([100_100, 5, 99_900, 4, 100_200, 2, 99_800, 6], jnp.int32)
    state = ob.reset(l2)
    bb, ba = ob.get_best_bid_and_ask(state)
    assert (int(bb), int(ba)) == (99_900, 100_100)
    msg = jnp.array([1, 1, 2, 100_100, 50, 50, 34_201, 0], jnp.int32)
    state = ob.process_order_array(state, KEY, msg)
    assert int(ob.get_volume_at_price(state, -1, 100_100)) == 3

    # facade passes through jit as a static pytree
    @jax.jit
    def f(ob_, s):
        return ob_.get_l2_state(s, 2)

    assert f(ob, state).shape == (8,)


def test_is_sorted_arena_detects_unsorted():
    """Debug invariant check: engine-produced sides pass; a shuffled
    external side fails until canonicalised with sort_side (ADVICE r2:
    _side_levels silently mis-levels unsorted books)."""
    key = jax.random.PRNGKey(7)
    prices = jnp.array([100, 101, -1, 103, 104, -1, 105, 106], jnp.int32)
    side = bk.SideState(price=prices, quant=jnp.abs(prices),
                        oid=prices, tid=prices,
                        time_s=jnp.zeros_like(prices),
                        time_ns=jnp.zeros_like(prices))
    assert bool(bk.is_sorted_arena(side, is_bid=False))
    assert not bool(bk.is_sorted_arena(side, is_bid=True))
    perm = jax.random.permutation(key, prices.shape[0])
    shuffled = jax.tree.map(lambda v: v[perm], side)
    # the shuffle used must actually break ask ordering for the test to bite
    assert not bool(bk.is_sorted_arena(shuffled, is_bid=False))
    assert bool(bk.is_sorted_arena(bk.sort_side(shuffled, is_bid=False),
                                   is_bid=False))
