"""L5: evaluation — baseline policies + Learned-vs-Baseline combinations."""

from vit_marl_tpu.eval.baselines import (  # noqa: F401
    FixedActionPolicy,
    RandomPolicy,
    LearnedPolicy,
)
from vit_marl_tpu.eval.combinations import evaluate_combinations, rollout  # noqa: F401
