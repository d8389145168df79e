"""CNN vision encoder: a working version of the reference's stub.

The reference defines ``VisionAgent`` (ref: networks/vision_agent.py:6-40)
with invalid flax kwargs (``nn.Conv(..., activation=...)`` is not a flax
argument) and never imports it anywhere.  This is the equivalent capability,
functional: 3 conv layers + 2 dense over the (levels, feats, channels) book
image, returning a feature embedding, plus ``CNNActorCriticRNN`` — the
trainable dict-obs policy around it (``network: "cnn_gru"``), structured
like the ViT one so the two vision backbones are drop-in swappable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen.initializers import constant, orthogonal

Array = jax.Array


class VisionAgentCNN(nn.Module):
    features: int = 64

    @nn.compact
    def __call__(self, image: Array) -> Array:
        lead = image.shape[:-3]
        x = image.reshape((-1,) + image.shape[-3:]).astype(jnp.float32)
        x = nn.Conv(16, kernel_size=(3, 2), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.Conv(32, kernel_size=(3, 2), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.Conv(32, kernel_size=(3, 2), padding="SAME")(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(128)(x)
        x = nn.relu(x)
        x = nn.Dense(self.features)(x)
        return x.reshape(lead + (self.features,))


class CNNActorCriticRNN(nn.Module):
    """Recurrent actor-critic consuming ``{"obs", "vision_obs"}`` dicts with
    a CNN vision backbone (``network: "cnn_gru"``).

    Twin of :class:`~vit_marl_tpu.models.vit.ViTActorCriticRNN` with
    ``VisionAgentCNN`` in place of the ViT encoder: vision_obs -> CNN
    embedding; obs -> Dense embedding; gated fusion -> GRU -> actor/critic
    heads (same head structure and inits for comparability — the trainable
    realisation of the reference's never-imported VisionAgent stub,
    ref: networks/vision_agent.py:6-40).
    """

    action_dim: int
    features: int = 64
    fc_dim: int = 64
    hidden_size: int = 64
    continuous: bool = False
    action_low: Optional[Array] = None
    action_high: Optional[Array] = None

    @nn.compact
    def __call__(self, hidden, x) -> Tuple[Array, object, Array]:
        from vit_marl_tpu.models.distributions import (
            Categorical,
            SquashedNormal,
        )
        from vit_marl_tpu.models.rnn import ScannedGRU
        from vit_marl_tpu.models.vit import GateFusion

        obs, dones = x
        flat, image = obs["obs"], obs["vision_obs"]

        vision_emb = VisionAgentCNN(self.features, name="cnn")(image)
        flat_emb = nn.Dense(self.fc_dim, kernel_init=orthogonal(jnp.sqrt(2)),
                            bias_init=constant(0.0), name="flat_embed")(flat)
        flat_emb = nn.relu(flat_emb)
        embedding = GateFusion(self.fc_dim, name="fusion")(vision_emb,
                                                           flat_emb)
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
