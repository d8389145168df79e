"""Order-book state representation and queries.

Struct-of-arrays layout: each book side is six parallel ``(n_orders,)`` int32
vectors instead of the reference's ``(n_orders, 6)`` row-major table
(ref: gymnax_exchange/jaxob/jaxob_constants.py:36-42).  SoA keeps every
engine primitive a pure lane-wise vector op on TPU and gives Pallas kernels a
clean VMEM layout.  ``side_to_dense``/``side_from_dense`` convert to the
reference layout for interop and golden tests.

Conventions preserved exactly from the reference:
- empty slots are ``-1`` in every field;
- trade rows are ``[price, +-quant, pass_oid, agr_oid, t_s, t_ns, pass_tid,
  agr_tid]`` with quant sign ``-side`` of the aggressor
  (ref: JaxOrderBookArrays.py:206-216);
- L2 aggregation uses fixed-size unique with ``1``/``-1`` fill
  (ref: JaxOrderBookArrays.py:1075-1106).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vit_marl_tpu.config import EngineConfig, MsgCol, TradeCol, EMPTY_SLOT

Array = jax.Array


@struct.dataclass
class SideState:
    """One side (bid or ask) of the book, struct-of-arrays."""

    price: Array    # (n,) int32, -1 = empty
    quant: Array    # (n,) int32
    oid: Array      # (n,) int32 order id
    tid: Array      # (n,) int32 trader id
    time_s: Array   # (n,) int32 arrival seconds
    time_ns: Array  # (n,) int32 arrival nanoseconds

    @property
    def n(self) -> int:
        return self.price.shape[-1]

    @property
    def is_empty(self) -> Array:
        return self.price == EMPTY_SLOT


@struct.dataclass
class BookState:
    """Full book: both sides + trade log."""

    asks: SideState
    bids: SideState
    trades: Array   # (n_trades, 8) int32, -1-filled when empty


def sort_side(side: SideState, is_bid: bool) -> SideState:
    """Canonicalise an arbitrary side layout into the engine's sorted-prefix
    invariant: occupied slots first, ordered by price-time priority
    (ascending price for asks / descending for bids, then time_s, time_ns,
    then original slot index).  Off the hot path — used once when ingesting
    external book states; the engine maintains the invariant incrementally.
    """
    occupied = side.price != EMPTY_SLOT
    inel = (~occupied).astype(jnp.int32)
    price_key = jnp.where(is_bid, -side.price, side.price)
    slot = jnp.arange(side.n, dtype=jnp.int32)
    (_, _, _, _, _, p, q, o, t, ts, tns) = jax.lax.sort(
        (inel, price_key, side.time_s, side.time_ns, slot,
         side.price, side.quant, side.oid, side.tid, side.time_s,
         side.time_ns),
        num_keys=5)
    wipe = lambda v: jnp.where(jnp.sort(inel) == 1, EMPTY_SLOT, v)
    return SideState(price=wipe(p), quant=wipe(q), oid=wipe(o), tid=wipe(t),
                     time_s=wipe(ts), time_ns=wipe(tns))


def canonicalize_book(book: "BookState") -> "BookState":
    """Apply :func:`sort_side` to both sides of a book."""
    return book.replace(asks=sort_side(book.asks, is_bid=False),
                        bids=sort_side(book.bids, is_bid=True))


def is_sorted_arena(side: SideState, is_bid: bool) -> Array:
    """Debug check of the sorted-arena invariant (bool scalar).

    True iff occupied-slot prices are price-priority ordered (non-decreasing
    for asks / non-increasing for bids) over the arena — the precondition of
    :func:`_side_levels` and the engine itself.  Cheap (one scan) but not
    free: use in tests/assertions, not on the hot path.
    """
    occ = side.price != EMPTY_SLOT
    key = jnp.where(is_bid, -side.price, side.price)
    # forward-fill the previous occupied key; every occupied slot must be
    # >= it (time keys are not checked — price ordering is what _side_levels
    # and the match loop rely on structurally)
    def combine(a, b):
        va, oa = a
        vb, ob = b
        return jnp.where(ob, vb, va), oa | ob

    shifted_k = jnp.concatenate(
        [jnp.full((1,), jnp.iinfo(jnp.int32).min, key.dtype), key[:-1]])
    shifted_o = jnp.concatenate([jnp.zeros((1,), bool), occ[:-1]])
    prev_k, prev_o = jax.lax.associative_scan(combine, (shifted_k, shifted_o))
    ok = ~occ | ~prev_o | (key >= prev_k)
    return jnp.all(ok)


def init_side(n_orders: int) -> SideState:
    """All-empty side (ref: JaxOrderBookArrays.py:901-911)."""
    empty = jnp.full((n_orders,), EMPTY_SLOT, dtype=jnp.int32)
    return SideState(price=empty, quant=empty, oid=empty, tid=empty,
                     time_s=empty, time_ns=empty)


def init_trades(n_trades: int) -> Array:
    return jnp.full((n_trades, 8), EMPTY_SLOT, dtype=jnp.int32)


def init_book(cfg: EngineConfig) -> BookState:
    return BookState(asks=init_side(cfg.n_orders),
                     bids=init_side(cfg.n_orders),
                     trades=init_trades(cfg.n_trades))


# --------------------------------------------------------------------------
# Dense <-> SoA interop (reference layout: (n, 6) [p, q, oid, tid, s, ns])
# --------------------------------------------------------------------------


def side_to_dense(side: SideState) -> Array:
    return jnp.stack(
        [side.price, side.quant, side.oid, side.tid, side.time_s, side.time_ns],
        axis=-1).astype(jnp.int32)


def side_from_dense(dense: Array) -> SideState:
    dense = dense.astype(jnp.int32)
    return SideState(price=dense[..., 0], quant=dense[..., 1], oid=dense[..., 2],
                     tid=dense[..., 3], time_s=dense[..., 4], time_ns=dense[..., 5])


# --------------------------------------------------------------------------
# Queries
# --------------------------------------------------------------------------


def best_ask(cfg: EngineConfig, asks: SideState) -> Array:
    """Lowest ask price, -1 if no asks (ref: JaxOrderBookArrays.py:846-855)."""
    lo = jnp.min(jnp.where(asks.price == EMPTY_SLOT, cfg.maxint, asks.price))
    return jnp.where(lo == cfg.maxint, EMPTY_SLOT, lo)


def best_bid(cfg: EngineConfig, bids: SideState) -> Array:
    """Highest bid price, -1 if no bids (ref: JaxOrderBookArrays.py:857-865)."""
    return jnp.max(bids.price)


def best_bid_and_ask(cfg: EngineConfig, asks: SideState, bids: SideState
                     ) -> Tuple[Array, Array]:
    """(best_ask, best_bid) (ref: JaxOrderBookArrays.py:867-879)."""
    return best_ask(cfg, asks), best_bid(cfg, bids)


def volume_at_price(side: SideState, price: Array) -> Array:
    """Total standing quantity at a price (ref: JaxOrderBookArrays.py:833-844)."""
    return jnp.sum(jnp.where(side.price == price, side.quant, 0))


def init_volume_at_price(cfg: EngineConfig, side: SideState, price: Array) -> Array:
    """Volume of initialisation orders (oid <= init_id) at a price
    (ref: JaxOrderBookArrays.py:944-960)."""
    mask = (side.price == price) & (side.oid <= cfg.init_id)
    return jnp.sum(jnp.where(mask, side.quant, 0))


def best_bid_and_ask_incl_quants(cfg: EngineConfig, asks: SideState,
                                 bids: SideState) -> Tuple[Array, Array]:
    """((ask_p, ask_q), (bid_p, bid_q)) int32 pairs
    (ref: JaxOrderBookArrays.py:881-898)."""
    a, b = best_bid_and_ask(cfg, asks, bids)
    a_q = volume_at_price(asks, a)
    b_q = volume_at_price(bids, b)
    return (jnp.stack([a, a_q]).astype(jnp.int32),
            jnp.stack([b, b_q]).astype(jnp.int32))


def _side_levels(side: SideState, n_levels: int) -> Tuple[Array, Array]:
    """(level_prices, level_volumes) of the top ``n_levels`` price levels.

    PRECONDITION: ``side`` satisfies the sorted-arena invariant (all
    engine-produced states do; sort external books with :func:`sort_side`).

    Exploits the sorted-arena invariant (slot order == price-time priority
    among occupied slots, holes anywhere): distinct prices appear in
    priority order with same-price orders contiguous, so levels fall out of
    a log-depth forward-fill plus compare-reduce — no sort.  The reference
    (and the round-1 rebuild) used fixed-size ``jnp.unique``, which lowers
    to a per-env sort (ref: JaxOrderBookArrays.py:1086-1093); this is the
    TPU-native equivalent.  Missing levels read price=-1, volume=0.
    """
    occ = side.price != EMPTY_SLOT

    # exclusive forward-fill of the previous occupied price
    def combine(a, b):
        va, oa = a
        vb, ob = b
        return jnp.where(ob, vb, va), oa | ob

    shifted_p = jnp.concatenate([jnp.full((1,), EMPTY_SLOT, side.price.dtype),
                                 side.price[:-1]])
    shifted_o = jnp.concatenate([jnp.zeros((1,), bool), occ[:-1]])
    prev_p, prev_o = jax.lax.associative_scan(combine, (shifted_p, shifted_o))

    is_new = occ & (~prev_o | (side.price != prev_p))
    lvl = jnp.cumsum(is_new.astype(jnp.int32))          # occupied: 1..n
    lvl = jnp.where(occ, lvl, 0)
    take = min(n_levels, side.price.shape[0])
    lv = jnp.arange(1, take + 1)[:, None]               # (n_levels, 1)
    sel = lvl[None, :] == lv                            # (n_levels, S)
    prices = jnp.max(jnp.where(sel, side.price[None, :], EMPTY_SLOT), axis=1)
    vols = jnp.sum(jnp.where(sel, side.quant[None, :], 0), axis=1)
    if take < n_levels:
        pad = n_levels - take
        prices = jnp.concatenate([prices, jnp.full((pad,), EMPTY_SLOT,
                                                   prices.dtype)])
        vols = jnp.concatenate([vols, jnp.zeros((pad,), vols.dtype)])
    return prices.astype(jnp.int32), jnp.maximum(vols, 0).astype(jnp.int32)


@partial(jax.jit, static_argnums=(0, 1))
def get_l2_state(cfg: EngineConfig, n_levels: int, asks: SideState,
                 bids: SideState) -> Array:
    """Flat ``(4*n_levels,)`` [ask_p, ask_q, bid_p, bid_q] per level
    (ref: JaxOrderBookArrays.py:1075-1106).

    Missing levels read price=-1/volume=0 on both sides, exactly like the
    reference's fixed-size ``jnp.unique`` trick.
    """
    ask_prices, ask_v = _side_levels(asks, n_levels)
    bid_prices, bid_v = _side_levels(bids, n_levels)
    l2 = jnp.stack([ask_prices, ask_v, bid_prices, bid_v], axis=1)
    return l2.flatten().astype(jnp.int32)


@partial(jax.jit, static_argnums=(0, 1))
def get_vision_l2_state(cfg: EngineConfig, n_levels: int, asks: SideState,
                        bids: SideState) -> Array:
    """Raw book-image tensor ``(n_levels, 2, 2)``:
    dim1 = (price, volume), dim2 = (ask, bid) channels
    (ref: JaxOrderBookArrays.py:1108-1140, the fork's vision snapshot)."""
    ask_prices, ask_v = _side_levels(asks, n_levels)
    bid_prices, bid_v = _side_levels(bids, n_levels)
    ask_raw = jnp.stack([ask_prices, ask_v], axis=1)   # (n_levels, 2)
    bid_raw = jnp.stack([bid_prices, bid_v], axis=1)
    return jnp.stack([ask_raw, bid_raw], axis=2).astype(jnp.int32)


def _lookup(side: SideState, mask: Array, not_found_val: int) -> Array:
    idx = jnp.argmax(mask)
    found = jnp.any(mask)
    row = jnp.stack([side.price[idx], side.quant[idx], side.oid[idx],
                     side.tid[idx], side.time_s[idx], side.time_ns[idx]])
    return jnp.where(found, row, jnp.full((6,), not_found_val)).astype(jnp.int32)


def get_order_by_id(side: SideState, order_id: Array) -> Array:
    """First order row matching oid; -1-row if absent
    (ref: JaxOrderBookArrays.py:962-985)."""
    return _lookup(side, side.oid == order_id, -1)


def get_order_by_id_and_price(side: SideState, order_id: Array, price: Array) -> Array:
    """(ref: JaxOrderBookArrays.py:987-1012)."""
    return _lookup(side, (side.oid == order_id) & (side.price == price), -1)


def get_order_by_time(side: SideState, time_s: Array, time_ns: Array) -> Array:
    """-2-row if absent, matching the reference's sentinel
    (ref: JaxOrderBookArrays.py:1015-1042)."""
    return _lookup(side, (side.time_s == time_s) & (side.time_ns == time_ns), -2)


def get_order_ids(side: SideState) -> Array:
    """Unique order ids, padded with 1 (ref: JaxOrderBookArrays.py:1044-1053)."""
    return jnp.unique(side.oid, size=side.n, fill_value=1)


def top_order_index(cfg: EngineConfig, side: SideState, is_bid: bool) -> Array:
    """Index of the price-time-priority top order on a side
    (ref: JaxOrderBookArrays.py:240-267).

    Best price (max for bids / min for asks, empty slots excluded for asks),
    then earliest (time_s, time_ns), then lowest slot index.
    """
    if is_bid:
        price_key = -side.price  # max price
    else:
        price_key = jnp.where(side.price == EMPTY_SLOT, cfg.maxint, side.price)
    best_p = jnp.min(price_key)
    t = jnp.where(price_key == best_p, side.time_s, cfg.maxint)
    best_t = jnp.min(t)
    tns = jnp.where(t == best_t, side.time_ns, cfg.maxint)
    best_tns = jnp.min(tns)
    return jnp.argmax(tns == best_tns)


@partial(jax.jit, static_argnums=(0, 1))
def get_next_executable_order(cfg: EngineConfig, side_idx: int, side: SideState) -> Array:
    """Best order row; ``side_idx``: 0=ask, 1=bid
    (ref: JaxOrderBookArrays.py:1055-1073)."""
    idx = top_order_index(cfg, side, is_bid=(side_idx == 1))
    return jnp.stack([side.price[idx], side.quant[idx], side.oid[idx],
                      side.tid[idx], side.time_s[idx], side.time_ns[idx]])


def get_agent_trades(trades: Array, agent_id: Array) -> Array:
    """Zero all trade rows not involving ``agent_id``
    (ref: JaxOrderBookArrays.py:824-831)."""
    executed = jnp.where((trades[:, TradeCol.PRICE] >= 0)[:, None], trades, 0)
    mask = ((executed[:, TradeCol.PASS_TID] == agent_id)
            | (executed[:, TradeCol.AGR_TID] == agent_id))
    return jnp.where(mask[:, None], executed, 0)


# --------------------------------------------------------------------------
# Book initialisation from L2 data
# --------------------------------------------------------------------------


def init_msgs_from_l2(cfg: EngineConfig, book_l2: Array,
                      time: Optional[Array] = None) -> Array:
    """Limit-order messages reconstructing an L2 snapshot
    (ref: JaxOrderBookArrays.py:913-942).

    ``book_l2`` is the LOBSTER orderbook row ``(4*levels,)``:
    [ask_p, ask_q, bid_p, bid_q] per level.  Init orders get
    oid = ``cfg.init_id`` and descending trader ids.
    """
    n_levels = book_l2.shape[0] // 4
    data = book_l2.reshape(n_levels * 2, 2)
    if time is None:
        time = jnp.array([34_200, 0])
    msgs = jnp.zeros((n_levels * 2, 8), dtype=jnp.int32)
    msgs = (msgs
            .at[:, MsgCol.PRICE].set(data[:, 0])
            .at[:, MsgCol.QUANT].set(data[:, 1])
            .at[:, MsgCol.TYPE].set(1)
            .at[0::2, MsgCol.SIDE].set(-1)   # even rows: asks
            .at[1::2, MsgCol.SIDE].set(1)    # odd rows: bids
            .at[:, MsgCol.OID].set(cfg.init_id)
            .at[:, MsgCol.TID].set(cfg.init_id - jnp.arange(n_levels * 2))
            .at[:, MsgCol.TIME_S].set(time[0])
            .at[:, MsgCol.TIME_NS].set(time[1]))
    return msgs


def make_cancel_msgs(side: SideState, agent_id: Array, size: int,
                     side_sign: int, time_s: Array, time_ns: Array) -> Array:
    """Cancel messages for all standing orders of a trader, fixed size
    (ref: JaxOrderBookArrays.py:756-782).

    Unmatched rows become zero-quantity/zero-price cancels, which are
    harmless no-ops in the engine (no order ever has oid 0 or price 0).
    """
    match = side.tid == agent_id
    # compact matches to the front via compare-reduce one-hots, NOT
    # jnp.where(size=...): sized nonzero lowers to a computed-index
    # scatter-add over the whole arena, which measures ~1000x slower on
    # this TPU than the masked-sum formulation (CLAUDE.md perf rule 5)
    rank = jnp.cumsum(match.astype(jnp.int32))            # 1-based at matches
    sel = match[None, :] & (rank[None, :]
                            == jnp.arange(1, size + 1)[:, None])  # (size, S)
    pick = lambda v: jnp.sum(jnp.where(sel, v[None, :], 0), axis=1)
    msgs = jnp.stack([
        jnp.full((size,), 2, dtype=jnp.int32),             # type: CANCEL
        jnp.full((size,), side_sign, dtype=jnp.int32),     # side
        pick(side.quant),                                   # quant
        pick(side.price),                                   # price
        pick(side.oid),                                     # oid
        pick(side.tid),                                     # tid
        jnp.full((size,), time_s, dtype=jnp.int32),
        jnp.full((size,), time_ns, dtype=jnp.int32),
    ], axis=1)
    return msgs.astype(jnp.int32)
