"""Grid-sweep runner test."""

import json

from vit_marl_tpu.rl.sweep import run_sweep


def test_run_sweep(tmp_path):
    base = {
        "NUM_ENVS": 4, "NUM_STEPS": 4, "TOTAL_TIMESTEPS": 16,
        "NUM_MINIBATCHES": 2, "UPDATE_EPOCHS": 1, "LOG_BACKEND": "none",
        "WORLD": {"N_DATA_MSG_PER_STEP": 10, "EPISODE_TIME": 6,
                  "START_RESOLUTION": 5,
                  "N_MESSAGES_PER_SYNTHETIC_DAY": 2_000},
        "AGENT_CONFIGS": {
            "MarketMaking": {},
            "Execution": {"ACTION_SPACE": "simplest_case",
                          "OBSERVATION_SPACE": "simplest_case",
                          "REWARD_SPACE": "simplest_case"},
        },
    }
    out_path = tmp_path / "sweep.jsonl"
    results = run_sweep(base, {
        "LR": [1e-4, 2.5e-4],
        "AGENT_CONFIGS.MarketMaking.REWARD_SPACE": ["buy_sell_pnl"],
    }, out_path=str(out_path))
    assert len(results) == 2
    assert {r["overrides"]["LR"] for r in results} == {1e-4, 2.5e-4}
    rows = [json.loads(l) for l in open(out_path)]
    assert len(rows) == 2
    assert all("final_metrics" in r for r in rows)
