"""Profiling helpers (ref: ad-hoc jax.profiler usage, base_env.py:455-472,
ippo_rnn_JAXMARL.py:795-802)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a profiler trace around a block (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sync=None):
    """Wall-clock a block, optionally blocking on a result pytree first."""
    import jax

    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync)
    print(f"[{label}] {time.perf_counter() - t0:.4f}s")
