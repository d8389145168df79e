"""Integer allocation utilities (ref: gymnax_exchange/utils/utils.py:11-114).

Used by execution agents to split a share quantity across orders without
rounding drift (Hamilton apportionment) and to cap action quantities at the
remaining task size (proportional integer clip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def argsort_rev(arr: Array) -> Array:
    """Descending argsort with left-to-right tie priority
    (ref: utils.py:11-13)."""
    return (arr.shape[0] - 1 - jnp.argsort(arr[::-1]))[::-1]


def rank_rev(arr: Array) -> Array:
    """Descending rank, ties resolved left-to-right (ref: utils.py:15-17)."""
    return jnp.argsort(argsort_rev(arr))


@jax.jit
def clip_by_sum_int(a: Array, max_sum: Array) -> Array:
    """Clip an int vector so its sum is <= max_sum, preserving proportions,
    ties resolved left-to-right (ref: utils.py:20-52)."""

    def clip(a, a_sum):
        q, remainders = jnp.divmod(a * max_sum, a_sum)
        rest = max_sum - jnp.sum(q)
        ranks = rank_rev(remainders)
        return jnp.where(ranks < rest, q + 1, q)

    a_sum = jnp.sum(a)
    return jax.lax.cond(a_sum > max_sum, lambda: clip(a, a_sum), lambda: a)


def hamilton_apportionment_permuted(votes: Array, seats: Array, key: Array) -> Array:
    """Randomized largest-remainder integer apportionment
    (ref: utils.py:79-114).

    Allocates ``seats`` integer units proportionally to ``votes``; leftover
    units go to randomly-chosen maximal remainders.
    """
    std_divisor = jnp.sum(votes) / seats
    init_seats, remainders = jnp.divmod(votes, std_divisor)
    remaining = (seats - init_seats.sum()).astype(jnp.int32)

    def alloc(carry, x):
        key, seats_acc, rem = carry
        key, sub = jax.random.split(key)
        is_max = rem == rem.max()
        dist = is_max / is_max.sum()
        chosen = jax.random.choice(sub, rem.size, p=dist)
        seats_acc = seats_acc.at[chosen].add(jnp.where(x < remaining, 1, 0))
        rem = rem.at[chosen].set(0)
        return (key, seats_acc, rem), x

    (_, init_seats, _), _ = jax.lax.scan(
        alloc, (key, init_seats, remainders), xs=jnp.arange(votes.shape[0]))
    return init_seats
