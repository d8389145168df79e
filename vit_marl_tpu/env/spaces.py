"""Minimal gymnax/JaxMARL-style spaces (standalone; no gymnax dependency).

API-compatible subset of the spaces the reference imports from gymnax
(ref: gymnax_exchange/jaxen/mm_env.py:2747-2793 uses Discrete/Box/Dict).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any

import jax
import jax.numpy as jnp


class Space:
    def sample(self, key):
        raise NotImplementedError

    def contains(self, x) -> bool:
        raise NotImplementedError


class Discrete(Space):
    def __init__(self, n: int, dtype=jnp.int32):
        self.n = n
        self.shape = ()
        self.dtype = dtype

    def sample(self, key):
        return jax.random.randint(key, (), 0, self.n, dtype=self.dtype)

    def contains(self, x) -> bool:
        return bool((x >= 0) & (x < self.n))

    def __repr__(self):
        return f"Discrete({self.n})"


class Box(Space):
    def __init__(self, low, high, shape=None, dtype=jnp.float32):
        self.low = jnp.asarray(low, dtype)
        self.high = jnp.asarray(high, dtype)
        self.shape = shape if shape is not None else self.low.shape
        self.dtype = dtype

    def sample(self, key):
        if jnp.issubdtype(self.dtype, jnp.integer):
            return jax.random.randint(key, self.shape, self.low, self.high,
                                      dtype=self.dtype)
        return jax.random.uniform(key, self.shape, self.dtype,
                                  minval=self.low, maxval=self.high)

    def contains(self, x) -> bool:
        return bool(jnp.all(x >= self.low) & jnp.all(x <= self.high))

    def __repr__(self):
        return f"Box(shape={self.shape})"


class Dict(Space):
    def __init__(self, spaces: "dict[str, Any]"):
        self.spaces = OrderedDict(spaces)
        self.shape = {k: s.shape for k, s in self.spaces.items()}

    def sample(self, key):
        keys = jax.random.split(key, len(self.spaces))
        return {k: s.sample(kk) for (k, s), kk in zip(self.spaces.items(), keys)}

    def contains(self, x) -> bool:
        return all(s.contains(x[k]) for k, s in self.spaces.items())

    def __repr__(self):
        return f"Dict({list(self.spaces)})"
