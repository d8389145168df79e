"""Slow sequential numpy oracle of the matching-engine semantics.

Used *only* by the test suite to differentially validate the vectorized
engine in :mod:`vit_marl_tpu.lob.engine`.  Implements, step by step, the
behaviour documented for the reference engine
(ref: gymnax_exchange/jaxob/JaxOrderBookArrays.py):

- per-message dispatch on (side, type) with MATCH->opposite-limit and
  DELETE->CANCEL rewrites (GENERAL_EXCHANGE);
- matching loop: repeatedly take the best opposite order (best price, then
  earliest time_s/time_ns, then lowest slot index) while the price crosses
  and unmatched quantity remains; record one trade row per matched order;
- trade rows ``[p, -side*q, pass_oid, agr_oid, t_s, t_ns, pass_tid,
  agr_tid]`` written at the first empty trade slot, with the reference's
  index-wrap overwrite of the last row when the log is full;
- remainder added at the first empty slot (index-wrap overwrite when full);
- cancels: strict-oid -> init-order-at-price -> (not modelled: random)
  fallback; a complete miss decrements the last slot (index wrap);
- any slot with quantity <= 0 is emptied entirely.

Deterministic cancel modes (STRICT_BY_ID, INCLUDE_INITS) are modelled
exactly; CANCEL_UNIFORM's random stage is out of scope here (covered by
statistical tests instead).

This file is intentionally plain Python/numpy with O(n) scans — clarity
over speed.
"""

from __future__ import annotations

import numpy as np

from vit_marl_tpu.config import CancelMode, EngineConfig

EMPTY = -1


class OracleBook:
    """Mutable sequential order book, reference layout (n, 6) per side."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.asks = np.full((cfg.n_orders, 6), EMPTY, dtype=np.int64)
        self.bids = np.full((cfg.n_orders, 6), EMPTY, dtype=np.int64)
        self.trades = np.full((cfg.n_trades, 8), EMPTY, dtype=np.int64)

    # -- helpers ----------------------------------------------------------

    @staticmethod
    def _remove_nonpositive(side: np.ndarray) -> None:
        dead = side[:, 1] <= 0
        side[dead, :] = EMPTY

    def _best_idx(self, side: np.ndarray, is_bid: bool) -> int:
        """Best-order slot: price, then time_s, then time_ns, then index."""
        prices = side[:, 0].copy()
        if is_bid:
            key_p = -prices  # max price first
        else:
            key_p = np.where(prices == EMPTY, self.cfg.maxint, prices)
        best_p = key_p.min()
        cand = key_p == best_p
        t = np.where(cand, side[:, 4], self.cfg.maxint)
        best_t = t.min()
        cand &= t == best_t
        tns = np.where(cand, side[:, 5], self.cfg.maxint)
        best_tns = tns.min()
        cand &= tns == best_tns
        return int(np.argmax(cand))

    def _add_trade(self, row) -> None:
        empty = np.where(self.trades[:, 0] == EMPTY)[0]
        # Index wrap on overflow: the reference's ``.at[-1]`` write.
        idx = int(empty[0]) if len(empty) else self.cfg.n_trades - 1
        self.trades[idx] = row

    def _add_order(self, side: np.ndarray, price, quant, oid, tid, ts, tns) -> None:
        empty = np.where(side[:, 0] == EMPTY)[0]
        idx = int(empty[0]) if len(empty) else self.cfg.n_orders - 1
        side[idx] = [price, max(0, quant), oid, tid, ts, tns]
        self._remove_nonpositive(side)

    # -- operations -------------------------------------------------------

    def _limit(self, opp: np.ndarray, same: np.ndarray, opp_is_ask: bool,
               price, quant, oid, tid, ts, tns, raw_side) -> None:
        qtm = quant
        while qtm > 0:
            i = self._best_idx(opp, is_bid=not opp_is_ask)
            p = opp[i, 0]
            if p == EMPTY:
                break
            if opp_is_ask and not (p <= price):
                break
            if (not opp_is_ask) and not (p >= price):
                break
            standing_q = opp[i, 1]
            newq = max(0, standing_q - qtm)
            fill = standing_q - newq
            self._add_trade([p, -raw_side * fill, opp[i, 2], oid, ts, tns,
                             opp[i, 3], tid])
            opp[i, 1] = newq
            self._remove_nonpositive(opp)
            qtm -= standing_q
        self._add_order(same, price, qtm, oid, tid, ts, tns)

    def _cancel(self, side: np.ndarray, price, quant, oid) -> None:
        match = np.where(side[:, 2] == oid)[0]
        idx = int(match[0]) if len(match) else -1
        if idx == -1 and self.cfg.cancel_mode >= CancelMode.INCLUDE_INITS:
            m2 = ((side[:, 0] == price) & (side[:, 2] <= self.cfg.init_id)
                  & (side[:, 1] >= quant))
            w = np.where(m2)[0]
            idx = int(w[0]) if len(w) else -1
        # Index wrap: complete miss decrements the last slot.
        if idx == -1:
            idx = self.cfg.n_orders - 1
        side[idx, 1] -= quant
        self._remove_nonpositive(side)

    def process(self, msg) -> None:
        """Apply one (8,) message: [type, side, quant, price, oid, tid, s, ns]."""
        t, s, quant, price, oid, tid, ts, tns = [int(x) for x in msg]
        if (s == 0) and (t == 0):
            return
        if ((s == 1) and (t == 1)) or ((s == -1) and (t == 4)):
            # bid limit: match against asks, remainder to bids
            self._limit(self.asks, self.bids, True, price, quant, oid, tid,
                        ts, tns, s)
        elif (s == -1) and (t in (2, 3)):
            self._cancel(self.asks, price, quant, oid)
        elif (s == 1) and (t in (2, 3)):
            self._cancel(self.bids, price, quant, oid)
        else:
            # default branch 0 of the reference's index arithmetic: ask limit
            self._limit(self.bids, self.asks, False, price, quant, oid, tid,
                        ts, tns, s)

    def process_all(self, msgs) -> None:
        for m in np.asarray(msgs):
            self.process(m)
