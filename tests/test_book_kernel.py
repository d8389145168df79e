"""Differential tests: the fused Pallas book kernel vs the XLA engine.

Runs the kernel in interpreter mode on CPU; the same tests drive the
compiled kernel when a TPU is present.  Coverage:

- bit-equality of final books, best-price sequences, and trade logs at the
  baseline shape (single grid block, single record-DMA group);
- M >= 48 so the double-buffered record-DMA group machinery (grp >= 2
  waits, trailing flush, multi-group reshape) actually executes;
- E = 256 (multi-block grid);
- deep-sweep messages filling > 16 resting orders in one message, with
  rec_k raised so the trade log stays exact;
- rec_k truncation detectability via the raw fill-count output;
- aggregate mode: in-kernel per-trader TradeSummary sums == summarizing the
  XLA engine's trade log.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial

from vit_marl_tpu.config import EngineConfig
from vit_marl_tpu.lob import book as bk
from vit_marl_tpu.lob import engine as eng
from vit_marl_tpu.env.common import (
    ffill_best_prices,
    summarize_trades,
    summary_from_aggs,
)
from vit_marl_tpu.ops.book_kernel import (
    ENV_BLOCK,
    pallas_process_step,
    pallas_process_step_aggs,
    finalize_trade_log_from_records,
)
from vit_marl_tpu.utils.fixtures import (
    random_aggressive_message,
    random_book,
    random_cancel_for_book,
    random_message,
)

AGENT_TIDS = (-42, -43)
TICK = 100


def build_case(cfg, E, M, seed=0, percent_fill=0.3, deep_every=0,
               agent_every=0):
    """Batched random books + message streams.

    deep_every > 0: every deep_every-th message is a huge aggressive order
    sweeping many levels.  agent_every > 0: every agent_every-th message
    carries an agent trader id, and a few standing orders are re-tagged as
    agent orders (so both passive and aggressive agent fills occur).
    """
    rng = np.random.default_rng(seed)
    books, streams = [], []
    for e in range(E):
        asks, bids, trades = random_book(cfg, rng, percent_fill=percent_fill)
        if agent_every:
            for arr in (asks, bids):
                occ = np.where(arr[:, 0] != -1)[0]
                take = occ[:: max(len(occ) // 3, 1)][:4]
                arr[take, 3] = AGENT_TIDS[e % len(AGENT_TIDS)]
        b = bk.BookState(
            asks=bk.side_from_dense(jnp.asarray(asks, jnp.int32)),
            bids=bk.side_from_dense(jnp.asarray(bids, jnp.int32)),
            trades=jnp.asarray(trades, jnp.int32))
        books.append(bk.canonicalize_book(b))
        ms = []
        for i in range(M):
            oid = 300 + e * 1000 + i
            if deep_every and i % deep_every == deep_every - 1:
                m = random_aggressive_message(rng, asks, bids,
                                              time_s=34201 + i, oid=oid,
                                              quant_range=(5_000, 40_000))
            else:
                r = rng.random()
                if r < 0.5:
                    m = random_message(rng, time_s=34201 + i, oid=oid,
                                       tid=oid, kind="limit")
                elif r < 0.7:
                    m = random_aggressive_message(rng, asks, bids,
                                                  time_s=34201 + i, oid=oid,
                                                  quant_range=(1, 400))
                elif r < 0.9:
                    m = random_cancel_for_book(rng, bids, 1, time_s=34201 + i)
                else:
                    m = random_message(rng, time_s=34201 + i, kind="noop")
            if agent_every and i % agent_every == agent_every - 2 % agent_every:
                m[5] = AGENT_TIDS[(e + i) % len(AGENT_TIDS)]
            ms.append(m)
        streams.append(ms)
    batched = jax.tree.map(lambda *v: jnp.stack(v), *books)
    msgs = jnp.asarray(np.array(streams), jnp.int32)
    return batched, msgs


def run_xla(cfg, msgs, batched, M):
    E = msgs.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(0), E)
    xla_book, (xa, xb) = jax.jit(jax.vmap(
        partial(eng.process_messages_save_bidask, cfg, n_last=M),
        in_axes=(0, 0, 0)))(keys, msgs, batched)
    prev = jnp.full((E, 2), 12_345, jnp.int32)
    xa = jax.vmap(ffill_best_prices)(xa, prev[:, 0])
    xb = jax.vmap(ffill_best_prices)(xb, prev[:, 1])
    return xla_book, xa, xb, prev


def assert_books_equal(a: bk.BookState, b: bk.BookState):
    for x, y in zip(jax.tree.leaves((a.asks, a.bids)),
                    jax.tree.leaves((b.asks, b.bids))):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
@pytest.mark.parametrize("E,M,deep,rec_k,percent_fill", [
    (ENV_BLOCK, 12, 0, 16, 0.3),       # baseline: 1 block, 1 DMA group
    (ENV_BLOCK, 48, 0, 16, 0.3),       # 3 DMA groups: double-buffer machinery
    (2 * ENV_BLOCK, 48, 0, 16, 0.3),   # multi-block grid
    (ENV_BLOCK, 20, 5, 64, 0.8),       # deep sweeps >16 fills, rec_k raised
])
def test_kernel_matches_xla_engine(E, M, deep, rec_k, percent_fill):
    cfg = EngineConfig(n_orders=64, n_trades=256)
    batched, msgs = build_case(cfg, E, M, percent_fill=percent_fill,
                               deep_every=deep)
    xla_book, xa, xb, prev = run_xla(cfg, msgs, batched, M)

    interpret = jax.default_backend() != "tpu"
    pal_book, (pa, pb), (recs, counts) = pallas_process_step(
        cfg, msgs, batched, prev, interpret, rec_k)
    trades = jax.vmap(finalize_trade_log_from_records)(
        batched.trades, recs, msgs, counts)

    assert_books_equal(xla_book, pal_book)
    np.testing.assert_array_equal(np.asarray(xa), np.asarray(pa))
    np.testing.assert_array_equal(np.asarray(xb), np.asarray(pb))
    np.testing.assert_array_equal(np.asarray(xla_book.trades),
                                  np.asarray(trades))
    if deep:
        # the deep case must actually exercise > default-REC_K fills
        assert int(np.asarray(counts).max()) > 16


@pytest.mark.slow
def test_rec_k_truncation_is_detectable():
    """With default rec_k, deep sweeps truncate records but (a) the book is
    still exact and (b) the raw fill counts expose the truncation."""
    cfg = EngineConfig(n_orders=64, n_trades=256)
    batched, msgs = build_case(cfg, ENV_BLOCK, 20, percent_fill=0.8,
                               deep_every=5)
    xla_book, xa, xb, prev = run_xla(cfg, msgs, batched, 20)
    interpret = jax.default_backend() != "tpu"
    pal_book, _, (recs, counts) = pallas_process_step(
        cfg, msgs, batched, prev, interpret)
    assert_books_equal(xla_book, pal_book)          # book exact regardless
    assert int(np.asarray(counts).max()) > 16       # truncation detectable
    rec_valid = (np.asarray(recs)[:, :, :, 0] != -1).sum(axis=2)
    assert rec_valid.max() == 16                    # records capped


@pytest.mark.slow
@pytest.mark.parametrize("E,M,deep,percent_fill", [
    (ENV_BLOCK, 24, 0, 0.3),
    (ENV_BLOCK, 20, 5, 0.8),           # deep sweeps: aggregates stay exact
    (2 * ENV_BLOCK, 32, 8, 0.5),       # multi-block
])
def test_kernel_aggregates_match_trade_log_summaries(E, M, deep,
                                                     percent_fill):
    """Aggregate mode == summarize_trades over the XLA engine's trade log
    (which is exact here: n_trades is large enough to hold every fill)."""
    cfg = EngineConfig(n_orders=64, n_trades=4096)
    batched, msgs = build_case(cfg, E, M, percent_fill=percent_fill,
                               deep_every=deep, agent_every=3)
    xla_book, xa, xb, prev = run_xla(cfg, msgs, batched, M)
    # the log must not have overflowed, else the comparison is invalid
    n_filled = (np.asarray(xla_book.trades)[:, :, 0] != -1).sum(axis=1)
    assert n_filled.max() < cfg.n_trades

    interpret = jax.default_backend() != "tpu"
    tids = jnp.asarray(AGENT_TIDS, jnp.int32)
    pal_book, (pa, pb), (per_agent, totals) = pallas_process_step_aggs(
        cfg, msgs, batched, tids, prev, TICK, interpret)

    assert_books_equal(xla_book, pal_book)
    np.testing.assert_array_equal(np.asarray(xa), np.asarray(pa))
    np.testing.assert_array_equal(np.asarray(xb), np.asarray(pb))

    got = summary_from_aggs(
        per_agent, jnp.broadcast_to(totals[:, None, :],
                                    (E, len(AGENT_TIDS), 2)))  # (E, n_agg)
    for k, tid in enumerate(AGENT_TIDS):
        want = jax.vmap(summarize_trades, in_axes=(0, None, None))(
            xla_book.trades, jnp.int32(tid), TICK)
        for name, w, g in zip(want._fields, want,
                              jax.tree.map(lambda v: v[:, k], got)):
            np.testing.assert_array_equal(
                np.asarray(w), np.asarray(g), err_msg=name)
    # at least some agent activity must have occurred for the test to bite
    assert int(np.asarray(got.agent_quant_abs).sum()) > 0
    assert int(np.asarray(got.total_quant).sum()) > 0


def test_cancel_after_full_fill_does_not_hit_stale_hole():
    """Regression for the deferred-hole-wipe optimisation: a slot emptied
    by a full fill keeps its stale oid in VMEM until the end-of-loop
    canonicalisation; a later cancel for that oid must NOT touch the hole
    (the XLA engine wipes immediately, so bit-equality would break).
    Sequence per env: bid rests -> market sell consumes it fully -> a new
    bid lands in the hole -> cancel for the consumed oid arrives."""
    cfg = EngineConfig(n_orders=16, n_trades=64)
    E = ENV_BLOCK
    asks = jnp.full((E, 16, 6), -1, jnp.int32)
    bids = jnp.full((E, 16, 6), -1, jnp.int32)
    # one resting bid: price 100_000, quant 5, oid 777
    bids = bids.at[:, 0].set(jnp.array([100_000, 5, 777, 901, 34_200, 0]))
    book = bk.BookState(
        asks=bk.SideState(*[asks[:, :, i] for i in range(6)]),
        bids=bk.SideState(*[bids[:, :, i] for i in range(6)]),
        trades=jnp.broadcast_to(bk.init_trades(64), (E, 64, 8)))
    msgs_one = np.array([
        [1, -1, 5, 100_000, 500, 500, 34_201, 0],   # sell 5 -> fills oid 777
        [1, 1, 3, 100_000, 501, 501, 34_202, 0],    # new bid reuses the slot
        [2, 1, 5, 100_000, 777, 901, 34_203, 0],    # cancel the DEAD oid
    ], dtype=np.int64)
    msgs = jnp.asarray(np.broadcast_to(msgs_one, (E, 3, 8)), jnp.int32)
    prev = jnp.full((E, 2), 99_999, jnp.int32)

    xla_book, xa, xb, _ = run_xla(cfg, msgs, book, 3)
    interpret = jax.default_backend() != "tpu"
    pal_book, (pa, pb), _ = pallas_process_step(cfg, msgs, book, prev,
                                                interpret)
    assert_books_equal(xla_book, pal_book)
    # the new bid must survive the stale-oid cancel with quant 3
    occ = np.asarray(pal_book.bids.oid) == 501
    assert occ.any(axis=1).all()
    q = np.where(occ, np.asarray(pal_book.bids.quant), 0).sum(axis=1)
    np.testing.assert_array_equal(q, np.full((E,), 3))


# --------------------------------------------------------------------------
# Random-cancel modes (CANCEL_UNIFORM / CANCEL_UNIFORM_AND_LARGE) in-kernel
# --------------------------------------------------------------------------


def _random_cancel_case(cfg):
    """Book with 6 same-price bids (distinct positive oids — stages 1/2
    miss) + a message stream that exercises every fallback stage."""
    E = ENV_BLOCK
    S = cfg.n_orders
    dense = np.full((S, 6), -1, np.int32)
    for i, oid in enumerate([500, 501, 502, 503, 504, 505]):
        # alternate agent/non-agent owners so random-cancel picks and the
        # crossing fill below involve the aggregate-mode trader ids
        tid = AGENT_TIDS[0] if i % 2 == 0 else 7
        dense[i] = [1000, 10, oid, tid, 34200, i]
    dense[6] = [990, 8, 510, AGENT_TIDS[1], 34200, 6]
    bids = bk.side_from_dense(jnp.asarray(dense))
    adense = np.full((S, 6), -1, np.int32)
    adense[0] = [1010, 5, 600, 7, 34200, 0]
    asks = bk.side_from_dense(jnp.asarray(adense))
    one = bk.canonicalize_book(bk.BookState(
        asks=asks, bids=bids,
        trades=jnp.full((cfg.n_trades, 8), -1, jnp.int32)))
    batched = jax.tree.map(lambda v: jnp.broadcast_to(v, (E,) + v.shape), one)
    stream = np.stack([
        [2, 1, 5, 1000, 99999, 55, 34201, 0],   # stage-3: 6 candidates
        [2, 1, 5, 1000, 99998, 55, 34202, 0],   # stage-3 on the mutated book
        # crossing ask -> trades; aggressor = AGENT_TIDS[1] so BOTH agent
        # ids are involved in fills (passive AGENT_TIDS[0] bids + this)
        [1, -1, 12, 995, 700, AGENT_TIDS[1], 34203, 0],
        [2, 1, 50, 1000, 99997, 55, 34204, 0],  # quant > all -> stage-4 only
        [2, 1, 3, 990, 99996, 55, 34205, 0],    # single candidate
        [1, 1, 7, 998, 701, 66, 34206, 1],      # fresh bid limit
        [2, 1, 5, 1234, 99995, 55, 34207, 0],   # no candidates at price
        [0, 0, 0, 0, 0, 0, 0, 0],               # noop
    ]).astype(np.int32)
    msgs = jnp.broadcast_to(jnp.asarray(stream), (E, stream.shape[0], 8))
    return batched, msgs


@pytest.mark.parametrize("mode", [2, 3])  # CANCEL_UNIFORM / ..._AND_LARGE
def test_random_cancel_modes_match_engine(mode):
    """Kernel random-cancel picks are bit-exact vs the XLA engine: both
    consume ``uniform(split(key_m)[0])`` (the kernel's draws precomputed by
    ``_per_message_uniforms``), and the 0/1-weight CDF is exact in f32."""
    cfg = EngineConfig(cancel_mode=mode)
    batched, msgs = _random_cancel_case(cfg)
    E, M = msgs.shape[:2]
    # run_xla derives its keys from PRNGKey(0) — use the SAME keys for the
    # kernel so both paths draw identical uniforms
    keys = jax.random.split(jax.random.PRNGKey(0), E)
    xla_book, xa, xb, prev = run_xla(cfg, msgs, batched, M)
    interpret = jax.default_backend() != "tpu"
    kbook, (ka, kb), (recs, counts) = pallas_process_step(
        cfg, msgs, batched, prev, interpret, engine_keys=keys)
    assert_books_equal(xla_book, kbook)
    np.testing.assert_array_equal(np.asarray(xa), np.asarray(ka))
    np.testing.assert_array_equal(np.asarray(xb), np.asarray(kb))
    trades = jax.vmap(finalize_trade_log_from_records)(
        batched.trades, recs, msgs, counts)
    np.testing.assert_array_equal(np.asarray(xla_book.trades),
                                  np.asarray(trades))
    # the uniform pick must actually be live: different envs (different
    # keys) cancel different standing orders
    uniq = {tuple(row[:8]) for row in np.asarray(kbook.bids.quant)}
    assert len(uniq) > 1, "stage-3 pick did not vary across envs"


def test_random_cancel_agg_mode_matches_engine_summary():
    """Aggregate mode under CANCEL_UNIFORM: books and per-trader sums match
    summarizing the XLA engine's trade log."""
    cfg = EngineConfig(cancel_mode=2)
    batched, msgs = _random_cancel_case(cfg)
    E, M = msgs.shape[:2]
    # tag the resting 990-bid as an agent order so fills involve the agent
    tids = jnp.asarray(AGENT_TIDS, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(0), E)
    xla_book, xa, xb, prev = run_xla(cfg, msgs, batched, M)
    interpret = jax.default_backend() != "tpu"
    ab, (aa, abb), (per_agent, totals) = pallas_process_step_aggs(
        cfg, msgs, batched, tids, prev, TICK, interpret, engine_keys=keys)
    # run_xla derives its keys from PRNGKey(0) == `keys`, so xla_book is
    # the same-randomness reference
    assert_books_equal(xla_book, ab)
    got = summary_from_aggs(
        per_agent, jnp.broadcast_to(totals[:, None, :],
                                    (E, len(AGENT_TIDS), totals.shape[-1])))
    for k, tid in enumerate(AGENT_TIDS):
        want = jax.vmap(summarize_trades, in_axes=(0, None, None))(
            xla_book.trades, jnp.int32(tid), TICK)
        for name, w, g in zip(want._fields, want,
                              jax.tree.map(lambda v: v[:, k], got)):
            np.testing.assert_array_equal(
                np.asarray(w), np.asarray(g), err_msg=name)
    # non-vacuous: the crossing sell fills agent-owned bids, so per-agent
    # sums must be live for BOTH trader ids
    assert int(np.asarray(got.agent_quant_abs)[:, 0].sum()) > 0
    assert int(np.asarray(got.agent_quant_abs)[:, 1].sum()) > 0
    assert int(np.asarray(got.total_quant).sum()) > 0


def test_random_cancel_mode_requires_keys():
    cfg = EngineConfig(cancel_mode=2)
    batched, msgs = _random_cancel_case(cfg)
    with pytest.raises(ValueError, match="engine keys"):
        pallas_process_step(cfg, msgs, batched, None,
                            jax.default_backend() != "tpu")


@pytest.mark.slow
@pytest.mark.parametrize("mode,seed", [(2, 11), (3, 12)])
def test_random_cancel_fuzz_sweep(mode, seed):
    """Randomized mixed-stream differential for the random-cancel modes:
    build_case traffic (limits/aggressives/cancels/noops, deep sweeps)
    plus injected fallback-triggering cancels (bogus oid at live prices,
    alternating stage-3-sized and stage-4-sized quants)."""
    cfg = EngineConfig(n_orders=64, n_trades=4096, cancel_mode=mode)
    E, M = ENV_BLOCK, 48
    batched, msgs = build_case(cfg, E, M, seed=seed, percent_fill=0.5,
                               deep_every=11, agent_every=5)
    m = np.asarray(msgs).copy()
    bid_prices = np.asarray(batched.bids.price)
    for e in range(E):
        live = bid_prices[e][bid_prices[e] > 0]
        if len(live) == 0:
            continue
        for i in range(1, M, 4):
            p = int(live[(e + i) % len(live)])
            q = 2 if (i // 4) % 2 == 0 else 5_000_000
            m[e, i] = [2, 1, q, p, 9_000_000 + i, 55, 34201 + i, 0]
    msgs = jnp.asarray(m, jnp.int32)

    xla_book, xa, xb, prev = run_xla(cfg, msgs, batched, M)
    n_filled = (np.asarray(xla_book.trades)[:, :, 0] != -1).sum(axis=1)
    assert n_filled.max() < cfg.n_trades
    keys = jax.random.split(jax.random.PRNGKey(0), E)  # == run_xla's keys
    interpret = jax.default_backend() != "tpu"
    kbook, (ka, kb), (recs, counts) = pallas_process_step(
        cfg, msgs, batched, prev, interpret, 64, engine_keys=keys)
    assert_books_equal(xla_book, kbook)
    np.testing.assert_array_equal(np.asarray(xa), np.asarray(ka))
    np.testing.assert_array_equal(np.asarray(xb), np.asarray(kb))
    trades = jax.vmap(finalize_trade_log_from_records)(
        batched.trades, recs, msgs, counts)
    np.testing.assert_array_equal(np.asarray(xla_book.trades),
                                  np.asarray(trades))
