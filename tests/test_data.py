"""Tests for the data layer: synthetic generation, preprocessing, windows."""

import numpy as np

from vit_marl_tpu.config import WorldConfig, MsgCol
from vit_marl_tpu.data import generate_day, load_data, write_day_csvs
from vit_marl_tpu.data.lobster import LobsterLoader, _preprocess_day


def small_cfg(**kw):
    defaults = dict(n_data_msg_per_step=50, ep_type="fixed_steps",
                    episode_time=10, start_resolution=5,
                    n_messages_per_synthetic_day=4_000, book_depth=10)
    defaults.update(kw)
    return WorldConfig(**defaults)


def test_generate_day_consistency():
    day = generate_day(seed=1, n_messages=3_000)
    msgs = day.messages
    assert msgs.shape == (3_000, 6)
    assert day.orderbook.shape == (3_000, 40)
    # times monotone non-decreasing
    assert (np.diff(msgs[:, 0]) >= 0).all()
    assert set(np.unique(msgs[:, 1].astype(int))) <= {1, 2, 3, 4}
    # book rows: ask prices above bid prices when both present
    ob = day.orderbook
    both = (ob[:, 0] > 0) & (ob[:, 2] > 0)
    assert (ob[both, 0] > ob[both, 2]).all()


def test_preprocess_rules():
    raw = np.array([
        [34_201.5, 1, 11, 5, 100_000, 1],    # limit bid
        [34_202.0, 4, 12, 3, 100_100, -1],   # exec vs ask -> bid limit
        [34_203.0, 3, 11, 5, 100_000, 1],    # delete -> cancel
        [34_204.0, 5, 13, 1, 100_000, 1],    # hidden: dropped
        [20_000.0, 1, 14, 1, 100_000, 1],    # out of hours: dropped
    ])
    book = np.arange(5 * 4).reshape(5, 4)
    msgs, kept_book = _preprocess_day(raw, book, 34_200, 57_600)
    assert msgs.shape == (3, 8)
    assert kept_book.shape == (3, 4)
    # exec flipped to opposite-side limit
    assert msgs[1, MsgCol.TYPE] == 1 and msgs[1, MsgCol.SIDE] == 1
    # delete became cancel
    assert msgs[2, MsgCol.TYPE] == 2
    # trader id copies order id
    assert (msgs[:, MsgCol.TID] == msgs[:, MsgCol.OID]).all()
    # nanosecond split
    assert msgs[0, MsgCol.TIME_S] == 34_201
    assert msgs[0, MsgCol.TIME_NS] == 500_000_000


def test_load_synthetic_fixed_steps():
    cfg = small_cfg()
    data = load_data(cfg)
    assert data.n_windows > 2
    span = cfg.episode_time * cfg.n_data_msg_per_step
    assert (data.max_msgs_per_window[:-1] == span).all()
    # every window fits in the padded message array
    assert (data.starts + data.max_msgs_per_window <= len(data.messages)).all()
    assert data.init_books.shape[1] == 4 * cfg.book_depth
    # padding rows are all-zero except time
    assert len(data.messages) % cfg.n_data_msg_per_step == 0


def test_load_synthetic_fixed_time():
    cfg = small_cfg(ep_type="fixed_time", episode_time=600,
                    start_resolution=300)
    data = load_data(cfg)
    assert data.n_windows > 2
    t = data.messages[:, MsgCol.TIME_S]
    for w in range(data.n_windows - 1):
        s, e = data.starts[w], data.ends[w]
        assert t[e] - t[s] <= 600


def test_csv_roundtrip(tmp_path):
    day = generate_day(seed=2, n_messages=1_500)
    d = str(tmp_path / "SYNTH" / "day1")
    write_day_csvs(day, d)
    cfg = small_cfg(data_path=str(tmp_path), stock="SYNTH", time_period="day1",
                    cache_dir=str(tmp_path / "cache"))
    data = LobsterLoader(cfg).run_loading()
    assert data.n_windows >= 1
    # cache hit returns identical arrays
    data2 = LobsterLoader(cfg).run_loading()
    np.testing.assert_array_equal(data.messages, data2.messages)
    np.testing.assert_array_equal(data.starts, data2.starts)


def test_multi_day_offsets():
    cfg = small_cfg(n_synthetic_days=2,
                    n_messages_per_synthetic_day=2_000)
    data = load_data(cfg)
    # windows from day 2 index past day 1's messages
    assert data.starts.max() > 2_000 // 2
    assert (np.diff(np.sort(data.starts)) > 0).all()
