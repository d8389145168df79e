"""Action distributions (standalone; replaces the reference's distrax use).

``Categorical`` matches ``distrax.Categorical``'s sample/log_prob/entropy
semantics (ref: ippo_rnn_JAXMARL.py:106).  ``SquashedNormal`` supports the
continuous policy-blending Box action space of the vision fork (the
reference defines that action space but never trains it; we do).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


class Categorical:
    def __init__(self, logits: Array):
        self.logits = logits - jax.scipy.special.logsumexp(
            logits, axis=-1, keepdims=True)

    def sample(self, seed: Array) -> Array:
        return jax.random.categorical(seed, self.logits, axis=-1)

    def log_prob(self, value: Array) -> Array:
        value = value.astype(jnp.int32)
        return jnp.take_along_axis(self.logits, value[..., None], axis=-1
                                   ).squeeze(-1)

    def entropy(self) -> Array:
        p = jnp.exp(self.logits)
        return -jnp.sum(p * self.logits, axis=-1)

    def mode(self) -> Array:
        return jnp.argmax(self.logits, axis=-1)


class SquashedNormal:
    """Diagonal Gaussian squashed by tanh and affinely mapped into
    ``[low, high]`` with change-of-variables log-probs."""

    def __init__(self, mean: Array, log_std: Array, low: Array, high: Array):
        self.mean = mean
        self.log_std = log_std
        self.low = low
        self.high = high
        self._scale = (high - low) / 2.0
        self._mid = (high + low) / 2.0

    def _squash(self, u: Array) -> Array:
        return jnp.tanh(u) * self._scale + self._mid

    def sample(self, seed: Array) -> Array:
        u = self.mean + jnp.exp(self.log_std) * jax.random.normal(
            seed, self.mean.shape)
        return self._squash(u)

    def log_prob(self, value: Array) -> Array:
        # invert the affine+tanh map
        y = jnp.clip((value - self._mid) / self._scale, -1 + 1e-6, 1 - 1e-6)
        u = jnp.arctanh(y)
        std = jnp.exp(self.log_std)
        base = (-0.5 * ((u - self.mean) / std) ** 2
                - self.log_std - 0.5 * jnp.log(2 * jnp.pi))
        # |d value / d u| = scale * (1 - tanh(u)^2)
        log_det = jnp.log(self._scale) + jnp.log1p(-(y ** 2))
        return jnp.sum(base - log_det, axis=-1)

    def entropy(self) -> Array:
        # base Gaussian entropy (squash correction omitted, standard practice)
        return jnp.sum(self.log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e),
                       axis=-1)

    def mode(self) -> Array:
        return self._squash(self.mean)
