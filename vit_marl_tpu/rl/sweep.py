"""Local grid-sweep runner (replaces the reference's wandb grid sweeps,
ref: gymnax_exchange/jaxrl/MARL/ippo_rnn_JAXMARL.py:952-993).

A sweep spec maps dotted config keys to lists of values; the runner trains
every combination and writes one JSONL row per run with final metrics.

Example::

    from vit_marl_tpu.rl.sweep import run_sweep
    run_sweep(base_raw_config, {
        "LR": [1e-4, 2.5e-4],
        "AGENT_CONFIGS.MarketMaking.REWARD_SPACE": ["buy_sell_pnl", "spooner"],
    }, out_path="sweep_results.jsonl")
"""

from __future__ import annotations

import copy
import itertools
import json
import time
from typing import Any, Dict, List, Optional

import jax

from vit_marl_tpu.config import make_config
from vit_marl_tpu.rl.ppo import make_train


def _set_dotted(raw: Dict[str, Any], key: str, value: Any) -> None:
    parts = key.split(".")
    node = raw
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def run_sweep(base_raw: Dict[str, Any], grid: Dict[str, List[Any]],
              out_path: Optional[str] = None, seed: int = 0) -> List[Dict]:
    keys = list(grid)
    results = []
    for combo in itertools.product(*(grid[k] for k in keys)):
        raw = copy.deepcopy(base_raw)
        overrides = dict(zip(keys, combo))
        for k, v in overrides.items():
            _set_dotted(raw, k, v)
        ma_config, train_config = make_config(raw)
        t0 = time.time()
        out = make_train(ma_config, train_config)(jax.random.PRNGKey(seed))
        row = {
            "overrides": overrides,
            "wall_seconds": round(time.time() - t0, 2),
            "final_metrics": {k: float(v)
                              for k, v in out["metrics"][-1].items()},
        }
        results.append(row)
        if out_path:
            with open(out_path, "a") as f:
                f.write(json.dumps(row) + "\n")
        print(f"sweep {overrides}: done in {row['wall_seconds']}s")
    return results
