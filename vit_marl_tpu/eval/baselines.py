"""Baseline policies with the learned-policy call signature.

(ref: jaxrl/MARL/baseline_eval/baseline_JAXMARL.py:127-159): every policy is
``(params, hidden, (obs, dones)) -> (hidden, pi, value)`` so learned and
baseline agents are interchangeable in rollouts.  The canonical baselines
(per ref config/base_config.yaml:56-59) are the AvSt action space for the
market maker and the TWAP action space for the execution agent, driven by
these fixed/random action pickers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vit_marl_tpu.models.distributions import Categorical

Array = jax.Array


class _DeterministicBox:
    """Degenerate continuous 'distribution' returning a fixed action."""

    def __init__(self, value: Array):
        self.value = value

    def sample(self, seed):
        return self.value

    def log_prob(self, value):
        return jnp.zeros(value.shape[:-1])

    def entropy(self):
        return jnp.zeros(self.value.shape[:-1])

    def mode(self):
        return self.value


class FixedActionPolicy:
    """Always the same action (ref: baseline_JAXMARL.py:141-159)."""

    def __init__(self, action, n_actions: Optional[int] = None,
                 continuous: bool = False):
        self.action = action
        self.n_actions = n_actions
        self.continuous = continuous

    def apply(self, params, hidden, x):
        obs, dones = x
        leaves = jax.tree.leaves(obs)
        batch_shape = leaves[0].shape[:2]
        if self.continuous:
            a = jnp.broadcast_to(jnp.asarray(self.action, jnp.float32),
                                 batch_shape + jnp.asarray(self.action).shape)
            pi = _DeterministicBox(a)
        else:
            logits = jnp.full(batch_shape + (self.n_actions,), -1e9)
            logits = logits.at[..., self.action].set(0.0)
            pi = Categorical(logits)
        value = jnp.zeros(batch_shape)
        return hidden, pi, value


class RandomPolicy:
    """Uniform random discrete actions (ref: baseline_JAXMARL.py:127-139)."""

    def __init__(self, n_actions: int):
        self.n_actions = n_actions

    def apply(self, params, hidden, x):
        obs, dones = x
        leaves = jax.tree.leaves(obs)
        batch_shape = leaves[0].shape[:2]
        logits = jnp.zeros(batch_shape + (self.n_actions,))
        return hidden, Categorical(logits), jnp.zeros(batch_shape)


class LearnedPolicy:
    """Wraps a trained network + params into the shared signature."""

    def __init__(self, network, params):
        self.network = network
        self.params = params

    def apply(self, params, hidden, x):
        return self.network.apply(self.params, hidden, x)
