"""Token-stream observation encoding for sequence models.

Rebuild of the reference's message/book tokenizer observation
(ref: gymnax_exchange/jaxen/mm_env.py:2429-2564 ``_get_obs_msg_new_tokenizer``
and the Mamba-pretraining pipeline in gymnax_exchange/jaxlobster/
data_loading.py).  NOTE: the reference's own import of its token vocabulary
(``from lobgen... import get_config``) is commented out
(ref: mm_env.py:126), so that code path cannot run there; this module
defines a self-contained vocabulary with the same structure:

- each int32 field splits into two 16-bit halves, each offset into its own
  token band (order-id, price, size, time);
- a combined event/direction token;
- the L2 book snapshot (+ timestamp) bitcast into 16-bit tokens with
  per-column band offsets;
- observation = [book tokens, message tokens].

Token layout per message: 13 tokens (1 event/dir + 2x6 split fields); book:
84 tokens (42 fields x 2 halves).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

Array = jax.Array

_BAND = 1 << 16  # each band holds one 16-bit half-word


@dataclass(frozen=True)
class TokenizerConfig:
    EVENT_START: int = 0
    ORDER_ID_B_START: int = 16
    PRICE_B_START: int = ORDER_ID_B_START + _BAND
    SIZE_B_START: int = PRICE_B_START + _BAND
    TIME_B_START: int = SIZE_B_START + _BAND

    @property
    def TOTAL_NUM_TOKENS(self) -> int:
        return self.TIME_B_START + _BAND


DEFAULT_TOKENIZER = TokenizerConfig()


def split_and_offset(x: Array, offset: int) -> Array:
    """int32 -> two 16-bit tokens with a band offset
    (ref: mm_env.py:2505-2509)."""
    x = x.astype(jnp.int32)
    low = (x & 0xFFFF).astype(jnp.uint32) + offset
    high = ((x >> 16) & 0xFFFF).astype(jnp.uint32) + offset
    return jnp.stack([low, high], axis=-1)


def tokenize_messages(cfg: TokenizerConfig, total_msgs: Array,
                      best_bids: Array, best_asks: Array,
                      old_mid_price: Array) -> Array:
    """Messages -> (n_msgs * 13,) uint32 tokens (ref: mm_env.py:2429-2533)."""
    event = total_msgs[:, 0]
    direction = total_msgs[:, 1]
    order_id = total_msgs[:, 4]
    price = total_msgs[:, 3] // 100
    size = total_msgs[:, 2]
    time_s = total_msgs[:, 6]
    time_ns = total_msgs[:, 7]

    ds = time_s[1:] - time_s[:-1]
    dns = time_ns[1:] - time_ns[:-1]
    ds = ds - (dns < 0)
    dns = jnp.where(dns < 0, dns + 1_000_000_000, dns)
    delta_time_s = jnp.zeros_like(time_s).at[1:].set(ds)
    delta_time_ns = jnp.zeros_like(time_ns).at[1:].set(dns)

    bb = best_bids[:, 0] // 100
    ba = best_asks[:, 0] // 100
    old_mid = old_mid_price // 100
    mid = (bb + ba) // 2
    delta_price = jnp.zeros_like(mid)
    delta_price = delta_price.at[0].set(
        (2 * (mid[0] - old_mid)).astype(delta_price.dtype))
    delta_price = delta_price.at[1:].set((ba[1:] - ba[:-1]) + (bb[1:] - bb[:-1]))

    event_dir = (direction.astype(jnp.uint8) * 4
                 + event.astype(jnp.uint8)).astype(jnp.uint32) + cfg.EVENT_START
    tokens = jnp.concatenate([
        event_dir[:, None],
        split_and_offset(order_id, cfg.ORDER_ID_B_START),
        split_and_offset(price, cfg.PRICE_B_START),
        split_and_offset(size, cfg.SIZE_B_START),
        split_and_offset(delta_time_s, cfg.TIME_B_START),
        split_and_offset(delta_time_ns, cfg.TIME_B_START),
        split_and_offset(delta_price.astype(jnp.int32), cfg.PRICE_B_START),
    ], axis=-1)
    return tokens.reshape(-1)


def tokenize_book(cfg: TokenizerConfig, l2_state: Array, time: Array,
                  n_levels: int = 10) -> Array:
    """L2 snapshot + timestamp -> (84,) uint32 tokens
    (ref: mm_env.py:2536-2555)."""
    with_time = jnp.concatenate(
        [time.astype(jnp.int32), l2_state.astype(jnp.int32)])
    halves = jax.lax.bitcast_convert_type(with_time, jnp.uint16).reshape(-1)
    shift = jnp.array(
        [cfg.TIME_B_START] * 4
        + [cfg.PRICE_B_START, cfg.PRICE_B_START,
           cfg.SIZE_B_START, cfg.SIZE_B_START] * 2 * n_levels)
    return halves.astype(jnp.uint32) + shift


def tokenize_observation(cfg: TokenizerConfig, total_msgs: Array,
                         best_bids: Array, best_asks: Array,
                         old_mid_price: Array, l2_before: Array,
                         time: Array) -> Array:
    """[book tokens, message tokens] (ref: mm_env.py:2557-2564)."""
    book = tokenize_book(cfg, l2_before, time)
    msgs = tokenize_messages(cfg, total_msgs, best_bids, best_asks,
                             old_mid_price)
    return jnp.concatenate([book, msgs])
