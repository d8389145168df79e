"""Differential test: the fused Pallas book kernel vs the XLA engine.

Runs the kernel in interpreter mode on CPU; the same test drives the
compiled kernel when a TPU is present (bit-equality of final books,
best-price sequences, and trade logs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial

from vit_marl_tpu.config import EngineConfig
from vit_marl_tpu.lob import book as bk
from vit_marl_tpu.lob import engine as eng
from vit_marl_tpu.env.common import ffill_best_prices
from vit_marl_tpu.ops.book_kernel import (
    ENV_BLOCK,
    pallas_process_step,
    finalize_trade_log_from_records,
)
from vit_marl_tpu.utils.fixtures import (
    random_aggressive_message,
    random_book,
    random_cancel_for_book,
    random_message,
)


@pytest.mark.slow
def test_kernel_matches_xla_engine():
    cfg = EngineConfig(n_orders=32, n_trades=32)
    E, M = ENV_BLOCK, 12
    rng = np.random.default_rng(0)
    books, streams = [], []
    for e in range(E):
        asks, bids, trades = random_book(cfg, rng, percent_fill=0.3)
        b = bk.BookState(
            asks=bk.side_from_dense(jnp.asarray(asks, jnp.int32)),
            bids=bk.side_from_dense(jnp.asarray(bids, jnp.int32)),
            trades=jnp.asarray(trades, jnp.int32))
        books.append(bk.canonicalize_book(b))
        ms = []
        for i in range(M):
            r = rng.random()
            if r < 0.5:
                m = random_message(rng, time_s=34201 + i, oid=300 + e * 100 + i,
                                   tid=300 + e * 100 + i, kind="limit")
            elif r < 0.7:
                m = random_aggressive_message(rng, asks, bids,
                                              time_s=34201 + i,
                                              oid=90000 + e * 100 + i,
                                              quant_range=(1, 400))
            elif r < 0.9:
                m = random_cancel_for_book(rng, bids, 1, time_s=34201 + i)
            else:
                m = random_message(rng, time_s=34201 + i, kind="noop")
            ms.append(m)
        streams.append(ms)
    batched = jax.tree.map(lambda *v: jnp.stack(v), *books)
    msgs = jnp.asarray(np.array(streams), jnp.int32)

    keys = jax.random.split(jax.random.PRNGKey(0), E)
    xla_book, (xa, xb) = jax.jit(jax.vmap(
        partial(eng.process_messages_save_bidask, cfg, n_last=M),
        in_axes=(0, 0, 0)))(keys, msgs, batched)
    prev = jnp.full((E, 2), 12_345, jnp.int32)
    xa = jax.vmap(ffill_best_prices)(xa, prev[:, 0])
    xb = jax.vmap(ffill_best_prices)(xb, prev[:, 1])

    interpret = jax.default_backend() != "tpu"
    pal_book, (pa, pb), (recs, counts) = pallas_process_step(
        cfg, msgs, batched, prev, interpret)
    trades = jax.vmap(finalize_trade_log_from_records)(
        batched.trades, recs, msgs)

    for a, b in zip(jax.tree.leaves((xla_book.asks, xla_book.bids)),
                    jax.tree.leaves((pal_book.asks, pal_book.bids))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(xa), np.asarray(pa))
    np.testing.assert_array_equal(np.asarray(xb), np.asarray(pb))
    np.testing.assert_array_equal(np.asarray(xla_book.trades),
                                  np.asarray(trades))
    assert int(np.asarray(counts).max()) <= 16
