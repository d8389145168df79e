"""Synthetic LOBSTER-format day generator.

Produces statistically plausible limit-order-book message streams plus the
matching per-message L2 orderbook rows, in exactly the LOBSTER CSV schema the
real loader consumes:

- message row: ``time(float s), type, order_id, qty, price, direction``
- orderbook row: ``ask_p1, ask_q1, bid_p1, bid_q1, ..., level n``

This replaces real market data in tests and demos (the reference had no
equivalent; its tests required LOBSTER files on disk).  The generator keeps
its own sequential book so cancels/deletes always reference live orders and
the emitted orderbook rows are consistent with the message stream.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np


@dataclass
class SyntheticDay:
    messages: np.ndarray   # (n, 6) float64: time, type, oid, qty, price, dir
    orderbook: np.ndarray  # (n, 4*levels) int64, row i = book after msg i


@dataclass
class _Book:
    """Tiny sequential price->fifo book used only for generation."""

    levels: int
    asks: dict = field(default_factory=dict)   # price -> list[(oid, qty)]
    bids: dict = field(default_factory=dict)

    def add(self, side, price, oid, qty):
        book = self.asks if side == -1 else self.bids
        book.setdefault(price, []).append([oid, qty])

    def cancel(self, side, price, oid, qty):
        book = self.asks if side == -1 else self.bids
        queue = book.get(price, [])
        for entry in queue:
            if entry[0] == oid:
                entry[1] -= qty
                if entry[1] <= 0:
                    queue.remove(entry)
                break
        if not queue and price in book:
            del book[price]

    def best(self, side):
        book = self.asks if side == -1 else self.bids
        if not book:
            return None
        return min(book) if side == -1 else max(book)

    def execute(self, side, qty) -> List[Tuple[int, int, int]]:
        """Consume ``qty`` from the best levels of ``side``.
        Returns [(price, oid, filled)]."""
        book = self.asks if side == -1 else self.bids
        fills = []
        while qty > 0 and book:
            p = min(book) if side == -1 else max(book)
            queue = book[p]
            oid, q = queue[0]
            take = min(q, qty)
            fills.append((p, oid, take))
            queue[0][1] -= take
            qty -= take
            if queue[0][1] <= 0:
                queue.pop(0)
            if not queue:
                del book[p]
        return fills

    def l2_row(self) -> List[int]:
        asks = sorted(self.asks)[: self.levels]
        bids = sorted(self.bids, reverse=True)[: self.levels]
        row = []
        for i in range(self.levels):
            if i < len(asks):
                p = asks[i]
                row += [p, sum(q for _, q in self.asks[p])]
            else:
                row += [-1, 0]   # LOBSTER uses sentinel prices for gaps
            if i < len(bids):
                p = bids[i]
                row += [p, sum(q for _, q in self.bids[p])]
            else:
                row += [1, 0]
        return row

    def random_order(self, rng, side):
        book = self.asks if side == -1 else self.bids
        if not book:
            return None
        price = rng.choice(list(book))
        oid, qty = book[price][int(rng.integers(len(book[price])))]
        return price, oid, qty


def generate_day(
    seed: int = 0,
    n_messages: int = 50_000,
    levels: int = 10,
    mid_price: int = 2_200_000,
    tick: int = 100,
    day_start: int = 34_200,
    day_end: int = 57_600,
    mean_quant: int = 60,
) -> SyntheticDay:
    """Generate one synthetic trading day.

    Event mix roughly mirrors LOBSTER equity data: ~55% new limits, ~35%
    cancels/deletes, ~10% executions.  Prices follow the touch with a
    geometric offset; the generator seeds an initial book so the stream
    starts from a populated state.
    """
    rng = np.random.default_rng(seed)
    book = _Book(levels=levels)
    msgs: List[List[float]] = []
    l2_rows: List[List[int]] = []
    next_oid = 10_000

    # Seed a starting book (these rows are *not* emitted; LOBSTER data also
    # starts mid-session with a populated book).
    for lvl in range(1, levels + 1):
        for _ in range(2):
            book.add(-1, mid_price + lvl * tick,
                     next_oid, int(rng.integers(10, 3 * mean_quant)))
            next_oid += 1
            book.add(1, mid_price - lvl * tick,
                     next_oid, int(rng.integers(10, 3 * mean_quant)))
            next_oid += 1

    t = float(day_start)
    dt_scale = (day_end - day_start - 60) / n_messages
    while len(msgs) < n_messages:
        t += rng.exponential(dt_scale)
        side = int(rng.choice([-1, 1]))
        roll = rng.random()
        qty = max(1, int(rng.exponential(mean_quant)))
        if roll < 0.55 or (roll < 0.90 and book.best(side) is None):
            # new limit order near the touch
            ref = book.best(side)
            opp = book.best(-side)
            if ref is None:
                ref = mid_price + (-side) * tick * levels // 2
            off = int(rng.geometric(0.3)) - 1
            price = ref + (tick * off if side == -1 else -tick * off)
            if opp is not None:
                # keep it passive: never cross the opposite touch
                price = max(price, opp + tick) if side == -1 else min(price, opp - tick)
            book.add(side, price, next_oid, qty)
            msgs.append([t, 1, next_oid, qty, price, side])
            next_oid += 1
        elif roll < 0.90:
            # cancel (partial, type 2) or delete (full, type 3)
            target = book.random_order(rng, side)
            if target is None:
                continue
            price, oid, oqty = target
            if rng.random() < 0.5 and oqty > 1:
                c = int(rng.integers(1, oqty))
                book.cancel(side, price, oid, c)
                msgs.append([t, 2, oid, c, price, side])
            else:
                book.cancel(side, price, oid, oqty)
                msgs.append([t, 3, oid, oqty, price, side])
        else:
            # execution against side's standing orders: LOBSTER type 4 rows
            # report the *standing* order's side in `direction`
            fills = book.execute(side, qty)
            for p, oid, filled in fills:
                msgs.append([t, 4, oid, filled, p, side])
                if len(msgs) >= n_messages:
                    break
        l2_rows.append(book.l2_row())
        # keep l2 rows aligned 1:1 with messages (executions may emit several)
        while len(l2_rows) < len(msgs):
            l2_rows.append(book.l2_row())

    messages = np.array(msgs[:n_messages], dtype=np.float64)
    orderbook = np.array(l2_rows[:n_messages], dtype=np.int64)
    return SyntheticDay(messages=messages, orderbook=orderbook)


def write_day_csvs(day: SyntheticDay, directory: str, stock: str = "SYNTH",
                   date: str = "2024-01-02", levels: int = 10) -> Tuple[str, str]:
    """Write a day in LOBSTER CSV naming convention."""
    os.makedirs(directory, exist_ok=True)
    mpath = os.path.join(
        directory, f"{stock}_{date}_34200000_57600000_message_{levels}.csv")
    bpath = os.path.join(
        directory, f"{stock}_{date}_34200000_57600000_orderbook_{levels}.csv")
    np.savetxt(mpath, day.messages, delimiter=",",
               fmt=["%.9f", "%d", "%d", "%d", "%d", "%d"])
    np.savetxt(bpath, day.orderbook, delimiter=",", fmt="%d")
    return mpath, bpath
