"""L2: world + agent environments."""

from vit_marl_tpu.env.spaces import Box, Dict, Discrete  # noqa: F401
from vit_marl_tpu.env.structs import (  # noqa: F401
    ExecState,
    LoadedState,
    MMState,
    MultiAgentState,
    WorldState,
)
from vit_marl_tpu.env.world import WorldEnv, make_world_env  # noqa: F401
