"""Branch-free vectorized matching engine.

This is a ground-up TPU redesign of the reference's message processor
(ref: gymnax_exchange/jaxob/JaxOrderBookArrays.py:500-752).  The reference
dispatches each message through ``lax.switch`` into per-type handlers whose
matching runs a data-dependent ``lax.while_loop`` (one standing order matched
per iteration).  Under ``vmap`` over thousands of environments that compiles
to all-branches-executed plus a convoy while-loop — hostile to XLA fusion and
TPU scheduling.

Here every message does identical dense work, with *no control flow at all*:

1. **Dispatch** is a set of boolean masks derived from the same (side, type)
   index arithmetic as the reference (ref: JaxOrderBookArrays.py:534-538).
2. **Matching** is closed-form: sort the opposite side by
   (eligibility, price-priority, time_s, time_ns, slot) with a single
   multi-key ``lax.sort``, take a masked exclusive prefix-sum of quantities,
   and fill each standing order ``clip(Q - cum_before, 0, q)``.  This is
   mathematically identical to the reference's sequential best-order loop
   (each iteration there consumes exactly the next order in this sort order)
   but compiles to one fused vector kernel.
3. **Cancel** is masked argmax lookups with the reference's 3-stage fallback
   (strict oid -> init-order at price -> random at price,
   ref: JaxOrderBookArrays.py:93-163).
4. Results of the limit-pass and cancel-pass are combined with lane-wise
   selects; a no-op message selects the untouched book.

Semantics replicated exactly (bug-for-bug where observable):

- trade rows ``[p, -side*q, pass_oid, agr_oid, t_s, t_ns, pass_tid, agr_tid]``
  written at consecutive empty trade slots in match order
  (ref: JaxOrderBookArrays.py:204-216);
- on trade-log overflow the reference repeatedly overwrites the *last* row
  (``.at[-1]`` index wrap), so the final overflow row is the last-matched
  trade; we reproduce that final state;
- ``add_order`` with a full book overwrites the last slot (index wrap of the
  ``-1`` fill value, ref: JaxOrderBookArrays.py:73-74); reproduced;
- a cancel that matches nothing decrements the *last* slot (index wrap,
  ref: JaxOrderBookArrays.py:111-117); reproduced;
- any slot with quant <= 0 is fully emptied after each operation
  (ref: JaxOrderBookArrays.py:85-90);
- MATCH(4) messages are processed as limit orders of the *opposite* side and
  DELETE(3) as CANCEL(2) in GENERAL_EXCHANGE mode; the trade sign uses the
  *raw* message side (ref: JaxOrderBookArrays.py:531-546).

Known deliberate divergence: in CANCEL_UNIFORM modes with *zero* candidates
the reference hits ``jax.random.choice`` with an all-zero weight vector
(undefined behaviour); we deterministically fall through to "no match"
(the index-wrap decrement) instead.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from vit_marl_tpu.config import CancelMode, EngineConfig, MsgCol, EMPTY_SLOT
from vit_marl_tpu.lob.book import (
    BookState,
    SideState,
    best_bid_and_ask_incl_quants,
)

Array = jax.Array


def _select_side(pred: Array, a: SideState, b: SideState) -> SideState:
    """Lane-wise select between two sides on a scalar bool."""
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def _remove_nonpositive(side: SideState) -> SideState:
    """Empty every slot whose quantity is <= 0
    (ref: JaxOrderBookArrays.py:85-90)."""
    dead = side.quant <= 0
    wipe = lambda v: jnp.where(dead, EMPTY_SLOT, v)
    return SideState(price=wipe(side.price), quant=wipe(side.quant),
                     oid=wipe(side.oid), tid=wipe(side.tid),
                     time_s=wipe(side.time_s), time_ns=wipe(side.time_ns))


# --------------------------------------------------------------------------
# Limit-order pass: vectorized match + add
# --------------------------------------------------------------------------


def _match_and_add(
    cfg: EngineConfig,
    opp: SideState,      # side being hit by the aggressor
    same: SideState,     # side the remainder is added to
    trades: Array,
    opp_is_ask: Array,   # bool scalar: True when the aggressor is a bid
    price: Array,
    quant: Array,
    oid: Array,
    tid: Array,
    time_s: Array,
    time_ns: Array,
    raw_side: Array,
) -> Tuple[SideState, SideState, Array]:
    """One aggressor against ``opp``; remainder added to ``same``.

    Equivalent to the reference's ``bid_lim``/``ask_lim``
    (ref: JaxOrderBookArrays.py:356-391, 417-453) with the while-loop
    matching replaced by sort + prefix-sum.
    """
    n = opp.n
    occupied = opp.price != EMPTY_SLOT
    crosses = jnp.where(opp_is_ask, opp.price <= price, opp.price >= price)
    eligible = occupied & crosses

    # Priority key: ascending for asks (lowest first), descending for bids.
    price_key = jnp.where(opp_is_ask, opp.price, -opp.price)
    slot = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    inel = (~eligible).astype(jnp.int32)

    # Lexicographic sort: eligible first, then price-time priority, then slot.
    (inel_s, _pk, _ts, _tns, slot_s, q_s, p_s, oid_s, tid_s) = jax.lax.sort(
        (inel, price_key, opp.time_s, opp.time_ns, slot,
         opp.quant, opp.price, opp.oid, opp.tid),
        num_keys=5,
    )
    elig_s = inel_s == 0
    cum_before = jnp.cumsum(q_s) - q_s            # exclusive prefix sum
    matched_s = jnp.where(elig_s, jnp.clip(quant - cum_before, 0, q_s), 0)
    total_matched = jnp.sum(matched_s)
    remaining = quant - total_matched

    # Write fills back to the original slots (slot_s is a permutation).
    new_quant = opp.quant.at[slot_s].add(-matched_s)
    opp = _remove_nonpositive(opp.replace(quant=new_quant))

    # ---- trade log ----
    n_t = trades.shape[0]
    was_matched = matched_s > 0
    trade_rank = jnp.cumsum(was_matched.astype(jnp.int32)) - was_matched
    empty_t = trades[:, 0] == EMPTY_SLOT
    any_empty_t = jnp.any(empty_t)
    first_empty = jnp.where(any_empty_t, jnp.argmax(empty_t), n_t)
    target = first_empty + trade_rank
    # Overflow: the reference's repeated ``.at[-1]`` overwrites leave the
    # *last matched* trade in the final slot; everything else >= n_t-1 drops.
    has_overflow = jnp.any(was_matched & (target >= n_t))
    max_rank = jnp.max(jnp.where(was_matched, trade_rank, -1))
    is_last = was_matched & (trade_rank == max_rank)
    write = was_matched & jnp.where(
        has_overflow, (target < n_t - 1) | is_last, target < n_t)
    target = jnp.where(is_last, jnp.minimum(target, n_t - 1), target)
    target = jnp.where(write, target, n_t)        # out of bounds -> dropped

    rows = jnp.stack([
        p_s,
        -raw_side * matched_s,
        oid_s,
        jnp.full((n,), oid, dtype=jnp.int32),
        jnp.full((n,), time_s, dtype=jnp.int32),
        jnp.full((n,), time_ns, dtype=jnp.int32),
        tid_s,
        jnp.full((n,), tid, dtype=jnp.int32),
    ], axis=1).astype(jnp.int32)
    trades = trades.at[target].set(rows, mode="drop")

    # ---- add remainder to the same side (ref: JaxOrderBookArrays.py:62-83)
    empty_o = same.price == EMPTY_SLOT
    any_empty_o = jnp.any(empty_o)
    # Index wrap: full book -> overwrite last slot, like ``.at[-1]``.
    add_at = jnp.where(any_empty_o, jnp.argmax(empty_o), same.n - 1)
    add_q = jnp.maximum(0, remaining)
    same = SideState(
        price=same.price.at[add_at].set(price),
        quant=same.quant.at[add_at].set(add_q),
        oid=same.oid.at[add_at].set(oid),
        tid=same.tid.at[add_at].set(tid),
        time_s=same.time_s.at[add_at].set(time_s),
        time_ns=same.time_ns.at[add_at].set(time_ns),
    )
    same = _remove_nonpositive(same)
    return opp, same, trades


# --------------------------------------------------------------------------
# Cancel pass
# --------------------------------------------------------------------------


def _first_index(mask: Array) -> Array:
    """First True index, or -1 (ref pattern: jnp.where(..., size=1, fill=-1))."""
    return jnp.where(jnp.any(mask), jnp.argmax(mask), -1)


def _cancel(
    cfg: EngineConfig,
    key: Array,
    side: SideState,
    price: Array,
    quant: Array,
    oid: Array,
) -> SideState:
    """Three-stage cancel (ref: JaxOrderBookArrays.py:93-163).

    Stage 1: first slot with exact oid match.
    Stage 2 (cancel_mode >= 1): first init order (oid <= init_id) at the
      price with enough quantity.
    Stage 3 (cancel_mode >= 2): uniform-random standing order at the price
      with enough quantity; cancel_mode == 3 falls back to price-only match.
    No match at all: decrement the *last* slot (the reference's ``.at[-1]``
    index wrap), which `_remove_nonpositive` then cleans up if it was empty.
    """
    idx = _first_index(side.oid == oid)

    if cfg.cancel_mode >= CancelMode.INCLUDE_INITS:
        m2 = (side.price == price) & (side.oid <= cfg.init_id) & (side.quant >= quant)
        idx = jnp.where(idx == -1, _first_index(m2), idx)

    if cfg.cancel_mode >= CancelMode.CANCEL_UNIFORM:
        m3 = (side.price == price) & (side.quant >= quant)
        idx3 = _random_id_pick(key, side, m3)
        idx = jnp.where(idx == -1, idx3, idx)

    if cfg.cancel_mode >= CancelMode.CANCEL_UNIFORM_AND_LARGE:
        m3b = side.price == price
        idx3b = _random_id_pick(key, side, m3b)
        idx = jnp.where(idx == -1, idx3b, idx)

    wrapped = jnp.where(idx == -1, side.n - 1, idx)
    new_quant = side.quant.at[wrapped].add(-quant)
    return _remove_nonpositive(side.replace(quant=new_quant))


def _random_id_pick(key: Array, side: SideState, mask: Array) -> Array:
    """Uniform pick among masked slots, by order id, first-slot-of-id
    (ref: JaxOrderBookArrays.py:140-163).  Returns -1 when no candidate."""
    ids = jnp.where(mask, side.oid, 0)
    weights = jnp.abs(jnp.sign(ids)).astype(jnp.float32)
    total = jnp.sum(weights)
    key, _ = jax.random.split(key)
    # Inverse-CDF sample; degenerate (no candidates) -> we return -1 rather
    # than the reference's undefined all-zero-weight jax.random.choice.
    u = jax.random.uniform(key) * jnp.maximum(total, 1.0)
    cdf = jnp.cumsum(weights)
    pick = jnp.argmax(cdf > u)
    chosen = ids[pick]
    idx = _first_index(side.oid == chosen)
    return jnp.where(total > 0, idx, -1)


# --------------------------------------------------------------------------
# Single-message processor (branch-free dispatcher)
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0,))
def process_message(cfg: EngineConfig, book: BookState, key: Array,
                    msg: Array) -> BookState:
    """Apply one (8,) int32 message to the book.

    Replaces ``cond_type_side`` (ref: JaxOrderBookArrays.py:500-566); the
    branch index arithmetic is identical, but all "branches" execute as
    masked dense ops and are combined with selects — the shape of work is
    message-independent, so ``vmap``/``scan`` lower to one uniform kernel.
    """
    t = msg[MsgCol.TYPE]
    s = msg[MsgCol.SIDE]
    price = msg[MsgCol.PRICE]
    quant = msg[MsgCol.QUANT]
    oid = msg[MsgCol.OID]
    tid = msg[MsgCol.TID]
    time_s = msg[MsgCol.TIME_S]
    time_ns = msg[MsgCol.TIME_NS]

    # Branch index (ref: JaxOrderBookArrays.py:534-538). In GENERAL_EXCHANGE
    # mode MATCH(4) acts as a limit order of the opposite side and DELETE(3)
    # as CANCEL(2). Unrecognised combinations default to index 0 (ask_lim),
    # exactly like the reference's arithmetic.
    index = ((((s == -1) & (t == 1)) | ((s == 1) & (t == 4))) * 0
             + (((s == 1) & (t == 1)) | ((s == -1) & (t == 4))) * 1
             + (((s == -1) & (t == 2)) | ((s == -1) & (t == 3))) * 2
             + (((s == 1) & (t == 2)) | ((s == 1) & (t == 3))) * 3
             + ((s == 0) & (t == 0)) * 4)

    is_ask_lim = index == 0
    is_bid_lim = index == 1
    is_lim = is_ask_lim | is_bid_lim
    is_ask_cancel = index == 2
    is_bid_cancel = index == 3
    is_cancel = is_ask_cancel | is_bid_cancel

    # ---- limit pass (computed unconditionally; gated by quant mask) ----
    opp = _select_side(is_bid_lim, book.asks, book.bids)
    same = _select_side(is_bid_lim, book.bids, book.asks)
    lim_quant = jnp.where(is_lim, quant, 0)
    opp2, same2, trades2 = _match_and_add(
        cfg, opp, same, book.trades, is_bid_lim, price, lim_quant,
        oid, tid, time_s, time_ns, s)

    # ---- cancel pass ----
    cside = _select_side(is_bid_cancel, book.bids, book.asks)
    c_quant = jnp.where(is_cancel, quant, 0)
    cside2 = _cancel(cfg, key, cside, price, c_quant, oid)
    # A zero-quantity cancel is a no-op *except* for `_remove_nonpositive`'s
    # wipe of pre-existing q<=0 slots, which cannot occur in a well-formed
    # book; keep original side when not cancelling to be exact.
    cside2 = _select_side(is_cancel, cside2, cside)

    # ---- combine ----
    asks = _select_side(
        is_lim,
        _select_side(is_bid_lim, opp2, same2),
        _select_side(is_ask_cancel, cside2, book.asks))
    bids = _select_side(
        is_lim,
        _select_side(is_bid_lim, same2, opp2),
        _select_side(is_bid_cancel, cside2, book.bids))
    trades = jnp.where(is_lim, trades2, book.trades)
    return BookState(asks=asks, bids=bids, trades=trades)


# --------------------------------------------------------------------------
# Scan drivers (ref: JaxOrderBookArrays.py:665-752)
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0,))
def process_messages(cfg: EngineConfig, key: Array, msgs: Array,
                     book: BookState) -> BookState:
    """Scan all ``(m, 8)`` messages through the book
    (ref: scan_through_entire_array, JaxOrderBookArrays.py:665-685)."""
    keys = jax.random.split(key, msgs.shape[0])

    def step(b, kv):
        k, m = kv
        return process_message(cfg, b, k, m), None

    book, _ = jax.lax.scan(step, book, (keys, msgs))
    return book


@partial(jax.jit, static_argnums=(0, 4))
def process_messages_save_bidask(cfg: EngineConfig, key: Array, msgs: Array,
                                 book: BookState, n_last: int
                                 ) -> Tuple[BookState, Tuple[Array, Array]]:
    """Scan messages, also returning ((ask_p, ask_q), (bid_p, bid_q)) int32
    pairs after each of the last ``n_last`` messages
    (ref: scan_through_entire_array_save_bidask,
    JaxOrderBookArrays.py:720-752)."""
    keys = jax.random.split(key, msgs.shape[0])

    def step(b, kv):
        k, m = kv
        b = process_message(cfg, b, k, m)
        return b, best_bid_and_ask_incl_quants(cfg, b.asks, b.bids)

    book, (asks_seq, bids_seq) = jax.lax.scan(step, book, (keys, msgs))
    return book, (asks_seq[-n_last:], bids_seq[-n_last:])


@partial(jax.jit, static_argnums=(0, 4))
def process_messages_save_states(cfg: EngineConfig, key: Array, msgs: Array,
                                 book: BookState, n_last: int
                                 ) -> Tuple[SideState, SideState, Array]:
    """Scan messages, returning book sides after each of the last ``n_last``
    messages plus the final trade log
    (ref: scan_through_entire_array_save_states,
    JaxOrderBookArrays.py:687-718)."""
    keys = jax.random.split(key, msgs.shape[0])

    def step(b, kv):
        k, m = kv
        b = process_message(cfg, b, k, m)
        return b, (b.asks, b.bids)

    book, (asks_seq, bids_seq) = jax.lax.scan(step, book, (keys, msgs))
    take = lambda side: jax.tree.map(lambda v: v[-n_last:], side)
    return take(asks_seq), take(bids_seq), book.trades
