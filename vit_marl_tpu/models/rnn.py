"""Recurrent actor-critic (parity with the reference's trainer networks).

``ScannedGRU`` is a reset-aware GRU scanned over the time axis
(ref: ippo_rnn_JAXMARL.py:48-73); ``ActorCriticRNN`` is
Dense->relu->GRU-> {actor head, critic head}
(ref: ippo_rnn_JAXMARL.py:76-115) with orthogonal inits and the same gains.

Supports discrete (Categorical) and continuous (SquashedNormal over a Box)
action heads; the reference only wires the discrete head.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen.initializers import constant, orthogonal

from vit_marl_tpu.models.distributions import Categorical, SquashedNormal

Array = jax.Array


class ScannedGRU(nn.Module):
    # unroll: this runtime dispatches scan iterations slowly relative to
    # their (tiny) compute; unrolling 16 cells per scan step recovers most
    # of it (same setting as the trainer's GAE scan, rl/ppo.py)
    @functools.partial(
        nn.scan,
        variable_broadcast="params",
        in_axes=0,
        out_axes=0,
        split_rngs={"params": False},
        unroll=16,
    )
    @nn.compact
    def __call__(self, carry, x):
        ins, resets = x
        carry = jnp.where(resets[:, None],
                          self.initialize_carry(*carry.shape), carry)
        new_carry, y = nn.GRUCell(features=ins.shape[1])(carry, ins)
        return new_carry, y

    @staticmethod
    def initialize_carry(batch_size: int, hidden_size: int) -> Array:
        cell = nn.GRUCell(features=hidden_size)
        return cell.initialize_carry(jax.random.PRNGKey(0),
                                     (batch_size, hidden_size))


class ActorCriticRNN(nn.Module):
    """(time, batch, obs) + (time, batch) dones -> (hidden, pi, value)."""

    action_dim: int
    fc_dim: int = 64
    hidden_size: int = 64
    continuous: bool = False
    action_low: Optional[Array] = None
    action_high: Optional[Array] = None

    @nn.compact
    def __call__(self, hidden, x) -> Tuple[Array, object, Array]:
        obs, dones = x
        embedding = nn.Dense(self.fc_dim, kernel_init=orthogonal(jnp.sqrt(2)),
                             bias_init=constant(0.0))(obs)
        embedding = nn.relu(embedding)

        hidden, embedding = ScannedGRU()(hidden, (embedding, dones))

        actor = nn.Dense(self.hidden_size, kernel_init=orthogonal(2),
                         bias_init=constant(0.0))(embedding)
        actor = nn.relu(actor)
        actor_out = nn.Dense(self.action_dim, kernel_init=orthogonal(0.01),
                             bias_init=constant(0.0))(actor)
        if self.continuous:
            log_std = self.param("log_std", constant(0.0), (self.action_dim,))
            pi = SquashedNormal(actor_out, log_std,
                                jnp.asarray(self.action_low),
                                jnp.asarray(self.action_high))
        else:
            pi = Categorical(logits=actor_out)

        critic = nn.Dense(self.fc_dim, kernel_init=orthogonal(2),
                          bias_init=constant(0.0))(embedding)
        critic = nn.relu(critic)
        critic = nn.Dense(1, kernel_init=orthogonal(1.0),
                          bias_init=constant(0.0))(critic)
        return hidden, pi, jnp.squeeze(critic, axis=-1)
