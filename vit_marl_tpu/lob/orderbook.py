"""Object-oriented facade over the functional engine.

Mirrors the reference's ``jorderbook.OrderBook`` convenience class
(ref: gymnax_exchange/jaxob/jorderbook.py:19-283): holds a static
:class:`EngineConfig`, exposes init/reset/process/query methods, and is
registered as a pytree (cfg as static aux data) so instances pass through
``jax.jit``/``vmap`` untouched.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vit_marl_tpu.config import EngineConfig
from vit_marl_tpu.lob import book as bk
from vit_marl_tpu.lob import engine

Array = jax.Array


class OrderBook:
    """Thin stateless wrapper; all state lives in :class:`BookState` pytrees."""

    def __init__(self, cfg: Optional[EngineConfig] = None):
        self.cfg = cfg or EngineConfig()

    # -- state construction ----------------------------------------------

    def init(self) -> bk.BookState:
        return bk.init_book(self.cfg)

    def reset(self, l2_book: Array, time: Optional[Array] = None) -> bk.BookState:
        """Fresh book replayed from an L2 snapshot row
        (ref: jorderbook.py:42-55)."""
        msgs = bk.init_msgs_from_l2(self.cfg, l2_book, time)
        key = jax.random.PRNGKey(self.cfg.seed)
        return engine.process_messages(self.cfg, key, msgs, self.init())

    # -- message processing ----------------------------------------------

    def process_order_array(self, state: bk.BookState, key: Array,
                            msg: Array) -> bk.BookState:
        return engine.process_message(self.cfg, state, key, msg)

    def process_orders_array(self, state: bk.BookState, key: Array,
                             msgs: Array) -> bk.BookState:
        return engine.process_messages(self.cfg, key, msgs, state)

    def process_orders_array_l2(self, state: bk.BookState, key: Array,
                                msgs: Array, n_levels: int
                                ) -> Tuple[bk.BookState, Array]:
        """Process messages and return the resulting L2 state."""
        state = engine.process_messages(self.cfg, key, msgs, state)
        return state, self.get_l2_state(state, n_levels)

    # -- queries ----------------------------------------------------------

    def get_l2_state(self, state: bk.BookState, n_levels: int = 10) -> Array:
        return bk.get_l2_state(self.cfg, n_levels, state.asks, state.bids)

    def get_vision_l2_state(self, state: bk.BookState, n_levels: int = 10) -> Array:
        return bk.get_vision_l2_state(self.cfg, n_levels, state.asks, state.bids)

    def get_best_bid_and_ask(self, state: bk.BookState) -> Tuple[Array, Array]:
        a, b = bk.best_bid_and_ask(self.cfg, state.asks, state.bids)
        return b, a  # (best_bid, best_ask) like the reference facade

    def get_volume_at_price(self, state: bk.BookState, side: int,
                            price: Array) -> Array:
        s = state.bids if side == 1 else state.asks
        return bk.volume_at_price(s, price)

    def get_agent_trades(self, state: bk.BookState, agent_id: Array) -> Array:
        return bk.get_agent_trades(state.trades, agent_id)


def _flatten(ob: OrderBook):
    return (), ob.cfg


def _unflatten(cfg, _children):
    return OrderBook(cfg)


jax.tree_util.register_pytree_node(OrderBook, _flatten, _unflatten)
