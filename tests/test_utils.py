"""Tests for L6 utilities (ref behaviours: gymnax_exchange/utils/utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_marl_tpu.utils import (
    argsort_rev,
    clip_by_sum_int,
    hamilton_apportionment_permuted,
    index_tree,
    rank_rev,
    tree_stack,
    tree_unstack,
)

KEY = jax.random.PRNGKey(0)


def test_argsort_rank_rev():
    a = jnp.array([3, 1, 3, 2])
    # descending with left-to-right tie priority
    assert argsort_rev(a).tolist() == [0, 2, 3, 1]
    assert rank_rev(a).tolist() == [0, 3, 1, 2]


def test_clip_by_sum_int():
    # the reference's doc example (ref: utils.py:26)
    out = clip_by_sum_int(jnp.array([3, 2, 3, 1]), 8)
    assert out.tolist() == [3, 2, 2, 1]
    # no-op when already within budget
    out = clip_by_sum_int(jnp.array([1, 2]), 10)
    assert out.tolist() == [1, 2]
    # sum is preserved at the cap
    out = clip_by_sum_int(jnp.array([10, 10, 10]), 7)
    assert int(out.sum()) == 7


def test_hamilton_apportionment():
    votes = jnp.array([10.0, 20.0, 30.0, 40.0])
    seats = hamilton_apportionment_permuted(votes, 10, KEY)
    assert int(seats.sum()) == 10
    assert seats.tolist() == [1, 2, 3, 4]
    # remainder seats go somewhere valid
    seats = hamilton_apportionment_permuted(jnp.array([1.0, 1.0, 1.0]), 10, KEY)
    assert int(seats.sum()) == 10


def test_tree_stack_unstack_index():
    trees = [{"a": jnp.array([i, i + 1]), "b": jnp.array(i)} for i in range(3)]
    stacked = tree_stack(trees)
    assert stacked["a"].shape == (3, 2)
    back = tree_unstack(stacked)
    assert back[1]["b"] == 1
    picked = index_tree(stacked, 2)
    assert picked["a"].tolist() == [2, 3]


def test_tokenizer_roundtrip():
    from vit_marl_tpu.data.tokenizer import DEFAULT_TOKENIZER, split_and_offset

    x = jnp.array([0, 1, 65_535, 65_536, 2**31 - 1, -1])
    toks = split_and_offset(x, DEFAULT_TOKENIZER.PRICE_B_START)
    lo = toks[..., 0] - DEFAULT_TOKENIZER.PRICE_B_START
    hi = toks[..., 1] - DEFAULT_TOKENIZER.PRICE_B_START
    back = (hi.astype(jnp.int64) << 16) | lo.astype(jnp.int64)
    back = back.astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # every token stays inside its band
    assert int(lo.max()) < 1 << 16 and int(hi.max()) < 1 << 16
