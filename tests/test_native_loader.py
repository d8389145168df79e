"""Native C++ LOBSTER parser vs the numpy reference path.

The native parser (native/lobster_parser.cpp) fuses CSV parsing with the
LOBSTER preprocessing rules (ref: lobster_loader.py:618-681); it must be
bit-identical to np.loadtxt + _preprocess_day on well-formed files.
"""

import os

import numpy as np
import pytest

from vit_marl_tpu.data.lobster import _preprocess_day
from vit_marl_tpu.data.native import get_native_module, parse_day_native

DAY_START, DAY_END = 34_200, 57_600


def _write_day(tmp_path, n=500, seed=0, levels=10):
    rng = np.random.default_rng(seed)
    t = np.sort(DAY_START - 50 + rng.uniform(0, 24_000, n))  # some pre-open
    mtype = rng.choice([1, 2, 3, 4, 5, 6, 7], n,
                       p=[.45, .15, .15, .15, .04, .03, .03])
    oid = rng.integers(1, 1_000_000, n)
    qty = rng.integers(1, 500, n)
    price = rng.integers(90_000, 110_000, n) * 100
    side = rng.choice([-1, 1], n)
    mfile = os.path.join(tmp_path, "x_message_10.csv")
    bfile = os.path.join(tmp_path, "x_orderbook_10.csv")
    with open(mfile, "w") as f:
        for i in range(n):
            f.write(f"{t[i]:.9f},{mtype[i]},{oid[i]},{qty[i]},"
                    f"{price[i]},{side[i]}\n")
    book = rng.integers(0, 2_000_000, (n, 4 * levels))
    np.savetxt(bfile, book, fmt="%d", delimiter=",")
    return mfile, bfile


@pytest.mark.parametrize("seed", [0, 1])
def test_native_matches_numpy_reference(tmp_path, seed):
    if get_native_module() is None:
        pytest.skip("native toolchain unavailable")
    mfile, bfile = _write_day(str(tmp_path), seed=seed)
    got_msgs, got_book = parse_day_native(mfile, bfile, DAY_START, DAY_END)

    raw_msgs = np.loadtxt(mfile, delimiter=",", ndmin=2)
    raw_book = np.loadtxt(bfile, delimiter=",", ndmin=2)
    want_msgs, want_book = _preprocess_day(raw_msgs, raw_book,
                                           DAY_START, DAY_END)
    np.testing.assert_array_equal(got_msgs, want_msgs)
    np.testing.assert_array_equal(got_book, want_book.astype(np.int64))
    assert got_msgs.dtype == np.int32 and got_book.dtype == np.int64
    # preprocessing really fired: no types outside {1,2}, no pre-open rows
    assert set(np.unique(got_msgs[:, 0])) <= {1, 2}
    assert got_msgs[:, 6].min() >= DAY_START


def test_native_loader_end_to_end(tmp_path):
    """LobsterLoader with data_path set uses the native parser and produces
    a consistent window table."""
    if get_native_module() is None:
        pytest.skip("native toolchain unavailable")
    from vit_marl_tpu.config import WorldConfig
    from vit_marl_tpu.data.lobster import LobsterLoader

    base = tmp_path / "AMZN" / "2021-01-01_2021-01-31"
    base.mkdir(parents=True)
    _write_day(str(base), n=800, seed=2)
    cfg = WorldConfig(data_path=str(tmp_path), stock="AMZN",
                      time_period="2021-01-01_2021-01-31",
                      ep_type="fixed_steps", episode_time=10,
                      start_resolution=10, n_data_msg_per_step=10,
                      cache_dir="")
    data = LobsterLoader(cfg).run_loading()
    assert data.messages.dtype == np.int32
    assert data.n_windows >= 1
    assert (data.ends > data.starts).all()
    assert data.init_books.shape[0] == data.n_windows


def test_native_unreadable_file_rejected(tmp_path):
    if get_native_module() is None:
        pytest.skip("native toolchain unavailable")
    with pytest.raises(OSError):
        parse_day_native(str(tmp_path / "nope.csv"),
                         str(tmp_path / "nope2.csv"), DAY_START, DAY_END)


def test_native_tolerates_whitespace_blank_crlf(tmp_path):
    """Review-found edge cases: a whitespace-only trailing field must not
    make the parser run across the line boundary; blank lines are skipped
    independently per file (np.loadtxt semantics); CRLF line ends parse."""
    if get_native_module() is None:
        pytest.skip("native toolchain unavailable")
    mfile, bfile = str(tmp_path / "m.csv"), str(tmp_path / "b.csv")
    with open(mfile, "w") as f:
        f.write("34201.5,1,10,5,100,1,  \n")   # trailing comma + spaces
        f.write("\n")                           # blank message line
        f.write("34202.5,1,11,6,101,-1\r\n")   # CRLF
    with open(bfile, "w") as f:
        f.write("\n")                           # leading blank book line
        f.write("100,1,99,1\n100,1,99,1\n100,1,99,1\n")
    msgs, book = parse_day_native(mfile, bfile, DAY_START, DAY_END)
    assert msgs.shape == (2, 8)
    assert list(msgs[0]) == [1, 1, 5, 100, 10, 10, 34201, 500000000]
    assert list(msgs[1][:6]) == [1, -1, 6, 101, 11, 11]
    assert book.shape == (2, 4)
