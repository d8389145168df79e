"""L3: policy/value networks.

- :mod:`vit_marl_tpu.models.distributions` -- Categorical / squashed Normal
  (standalone replacement for the reference's distrax dependency)
- :mod:`vit_marl_tpu.models.rnn`  -- ScannedGRU + ActorCriticRNN (parity with
  ref: jaxrl/MARL/ippo_rnn_JAXMARL.py:48-115)
- :mod:`vit_marl_tpu.models.vit`  -- ViT encoder over the book image + fused
  actor-critic (closes the reference's "FIXME: APPLY VISION" gap)
- :mod:`vit_marl_tpu.models.cnn`  -- CNN VisionAgent (working version of the
  reference's broken stub, ref: networks/vision_agent.py)
"""

from vit_marl_tpu.models.distributions import Categorical, SquashedNormal  # noqa: F401
from vit_marl_tpu.models.rnn import ActorCriticRNN, ScannedGRU  # noqa: F401
from vit_marl_tpu.models.vit import ViTActorCriticRNN, ViTEncoder, VIT_PRESETS  # noqa: F401
from vit_marl_tpu.models.cnn import VisionAgentCNN  # noqa: F401
from vit_marl_tpu.models.convert import convert_vit_params  # noqa: F401
