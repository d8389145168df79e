"""Differential fuzzer: vectorized engine vs the sequential numpy oracle.

Runs random message streams over random books under randomized engine
configs until a wall-clock budget expires, requiring bit-identical final
books and trade logs (the same contract as
``tests/test_engine.py::test_differential_random_streams``, scaled from
18 fixed seeds to thousands of randomized trials).  Optionally also runs
each stream through the fused Pallas book kernel in interpret mode
(``--kernel``) and requires book bit-equality there too.

Shapes are drawn from a small set so the jit cache amortizes compiles;
message *content* (mix weights, prices, quantities, cancel targets,
overflow pressure) is fully randomized per trial.  Every failure prints
a standalone repro line (seed + config) and the run exits nonzero.

Usage:
  python tools/fuzz_engine.py --minutes 10 [--kernel] [--seed0 0]

CPU-only by design (forces the cpu backend — this is a correctness tool,
not a benchmark).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

# shape pool: small enough that jit caches hit, wide enough to cover the
# overflow / tiny-book / deep-book regimes.  (n_orders, n_trades, n_msgs)
SHAPES = [
    (6, 5, 80),       # heavy overflow, trade-log overwrite
    (8, 16, 96),      # kernel-eligible tiny book (capacity % 8 == 0)
    (16, 16, 120),
    (24, 24, 120),    # the fixed-seed differential tests' shape
    (32, 64, 144),
    (64, 32, 112),    # bench-like book, short log
]


def one_trial(seed: int, use_kernel: bool) -> str | None:
    """Returns None on success, a failure description on mismatch."""
    import jax.numpy as jnp

    from test_engine import assert_equal_books, make_book, run_both
    from vit_marl_tpu.config import CancelMode, EngineConfig
    from vit_marl_tpu.utils.fixtures import (
        random_aggressive_message,
        random_book,
        random_cancel_for_book,
        random_message,
    )

    rng = np.random.default_rng(seed)
    n_orders, n_trades, n_msgs = SHAPES[int(rng.integers(len(SHAPES)))]
    cancel_mode = int(rng.choice([int(CancelMode.STRICT_BY_ID),
                                  int(CancelMode.INCLUDE_INITS)]))
    cfg = EngineConfig(n_orders=n_orders, n_trades=n_trades,
                       cancel_mode=cancel_mode)
    n_levels = int(rng.integers(2, 30))
    percent_fill = float(rng.uniform(0.1, 0.9))
    qhi = int(rng.choice([50, 300, 800, 3000]))
    asks, bids, trades = random_book(cfg, rng, n_levels=max(n_levels, 3),
                                     percent_fill=percent_fill,
                                     quant_range=(1, qhi))
    # random mix weights per trial (limit / aggressive / cancel / match /
    # noop) — normalized draws so every regime (cancel-storm, cross-heavy,
    # passive-only) appears across trials
    w = rng.dirichlet(np.ones(5) * 0.7)
    msgs = []
    t, oid = 34_201, -300
    for i in range(n_msgs):
        roll = rng.random()
        if roll < w[0]:
            m = random_message(rng, time_s=t, oid=oid, tid=oid, kind="limit",
                               n_levels=n_levels, quant_range=(1, qhi))
        elif roll < w[0] + w[1]:
            m = random_aggressive_message(rng, asks, bids, time_s=t, oid=oid,
                                          quant_range=(1, max(2 * qhi, 2)))
        elif roll < w[0] + w[1] + w[2]:
            side_arr = asks if rng.random() < 0.5 else bids
            m = random_cancel_for_book(
                rng, side_arr, -1 if side_arr is asks else 1, time_s=t,
                partial=bool(rng.random() < 0.7))
        elif roll < w[0] + w[1] + w[2] + w[3]:
            m = random_message(rng, time_s=t, oid=oid, tid=oid, kind="match",
                               n_levels=n_levels, quant_range=(1, qhi))
        else:
            m = random_message(rng, time_s=t, oid=oid, tid=oid, kind="noop")
        msgs.append(m)
        t += int(rng.integers(0, 3))
        oid -= 1

    try:
        vec, oracle = run_both(cfg, msgs, asks, bids, trades)
        assert_equal_books(vec, oracle)
    except AssertionError as e:
        return (f"ENGINE vs ORACLE mismatch: seed={seed} cfg=({n_orders},"
                f"{n_trades},cancel={cancel_mode}) msgs={n_msgs}: "
                f"{str(e)[:400]}")

    if use_kernel and n_orders % 8 == 0:
        from vit_marl_tpu.lob import book as bk
        from vit_marl_tpu.ops.book_kernel import ENV_BLOCK, pallas_process_step

        # the kernel tiles envs in ENV_BLOCK lanes; replicate the trial
        # across one block (the lanes are data-parallel, so an E-fold
        # copy is one interpret pass, not E)
        b0 = make_book(cfg, asks, bids, trades)
        E = ENV_BLOCK
        m_arr = jnp.broadcast_to(jnp.asarray(np.array(msgs), jnp.int32),
                                 (E,) + (len(msgs), 8))
        batched = jax.tree.map(
            lambda v: jnp.broadcast_to(v, (E,) + v.shape), b0)
        prev = jnp.full((E, 2), 12_345, jnp.int32)
        try:
            out = pallas_process_step(cfg, m_arr, batched, prev,
                                      interpret=True)
            k_book = out[0]
            for name in ("asks", "bids"):
                side0 = jax.tree.map(lambda v: v[0], getattr(k_book, name))
                got = bk.side_to_dense(bk.sort_side(
                    side0, is_bid=(name == "bids")))
                want = oracle.dense(getattr(oracle, name))
                np.testing.assert_array_equal(
                    np.asarray(got, dtype=np.int64), want)
        except AssertionError as e:
            return (f"KERNEL vs ORACLE mismatch: seed={seed} cfg="
                    f"({n_orders},{n_trades},cancel={cancel_mode}): "
                    f"{str(e)[:400]}")
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--minutes", type=float, default=10.0)
    p.add_argument("--seed0", type=int, default=0)
    p.add_argument("--kernel", action="store_true",
                   help="also differential-test the Pallas kernel "
                        "(interpret mode; ~10x slower per trial)")
    p.add_argument("--max-failures", type=int, default=5)
    args = p.parse_args()

    deadline = time.time() + args.minutes * 60
    trials, failures = 0, []
    seed = args.seed0
    t_last = time.time()
    while time.time() < deadline and len(failures) < args.max_failures:
        msg = one_trial(seed, args.kernel)
        trials += 1
        if msg:
            failures.append(msg)
            print(f"FAIL {msg}", flush=True)
        if time.time() - t_last > 60:
            print(f"... {trials} trials, {len(failures)} failures, "
                  f"{(deadline - time.time()) / 60:.1f} min left",
                  flush=True)
            t_last = time.time()
        seed += 1
    print(f"fuzz done: {trials} trials ({args.seed0}..{seed - 1}), "
          f"{len(failures)} failures"
          + (" [KERNEL checked]" if args.kernel else ""), flush=True)
    for f in failures:
        print(f, flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
