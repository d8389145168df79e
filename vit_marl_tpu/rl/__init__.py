"""L4: reinforcement-learning training (IPPO with recurrent policies)."""

from vit_marl_tpu.rl.ppo import Transition, make_train  # noqa: F401
