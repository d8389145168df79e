"""Nightly-depth differential fuzzing as a pytest long mode.

Promotes ``tools/fuzz_engine.py`` (vectorized engine vs sequential numpy
oracle, optional Pallas-kernel interpret pass) to a pytest-marked sweep:

    FUZZ_MINUTES=10 python -m pytest tests/test_fuzz.py -m fuzz -q

Gated on the ``FUZZ_MINUTES`` env var so the default suite stays fast; the
chip queue's idle slot sets it (tools/chip_queue_r5.sh). Every failure
message embeds a standalone repro (seed + engine config).
"""

import os
import sys
import time

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

MINUTES = os.environ.get("FUZZ_MINUTES")

pytestmark = [
    pytest.mark.fuzz,
    pytest.mark.skipif(
        MINUTES is None,
        reason="set FUZZ_MINUTES=<n> to run the fuzz sweep"),
]


@pytest.mark.parametrize("kernel", [False, True],
                         ids=["engine-vs-oracle", "kernel-vs-oracle"])
def test_fuzz_sweep(kernel):
    from fuzz_engine import one_trial

    budget = float(MINUTES) * 60 / 2  # half the budget per arm
    seed0 = int(os.environ.get("FUZZ_SEED0", 0)) + (1_000_000 if kernel
                                                    else 0)
    deadline = time.time() + budget
    trials, failures = 0, []
    seed = seed0
    while time.time() < deadline and len(failures) < 5:
        msg = one_trial(seed, kernel)
        trials += 1
        if msg:
            failures.append(msg)
        seed += 1
    print(f"fuzz[{'kernel' if kernel else 'engine'}]: {trials} trials "
          f"({seed0}..{seed - 1}), {len(failures)} failures")
    assert not failures, "\n".join(failures)
