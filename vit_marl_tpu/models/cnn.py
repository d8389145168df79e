"""CNN vision encoder: a working version of the reference's stub.

The reference defines ``VisionAgent`` (ref: networks/vision_agent.py:6-40)
with invalid flax kwargs (``nn.Conv(..., activation=...)`` is not a flax
argument) and never imports it anywhere.  This is the equivalent capability,
functional: 3 conv layers + 2 dense over the (levels, feats, channels) book
image, returning a feature embedding (heads live in the actor-critic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

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
