"""Grid-sweep runner test."""

import json

import pytest

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


def test_sweep_cli_file_driven(tmp_path, monkeypatch, capsys):
    """`python -m vit_marl_tpu.rl.sweep --config <yaml>` runs the SWEEP:
    grid from the file (the reference's fine-sweep workflow)."""
    import yaml

    from vit_marl_tpu.rl.sweep import main

    cfg = {
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
        "SWEEP": {"LR": [1e-4, 2.5e-4], "GAMMA": 0.99},  # scalar -> 1-list
    }
    path = tmp_path / "sweep.yaml"
    path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "results.jsonl"
    monkeypatch.setattr("sys.argv", ["sweep", "--config", str(path),
                                     "--out", str(out)])
    main()
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 2
    assert {r["overrides"]["LR"] for r in rows} == {1e-4, 2.5e-4}
    assert all(r["overrides"]["GAMMA"] == 0.99 for r in rows)


def test_sweep_cli_requires_sweep_section(tmp_path, monkeypatch):
    from vit_marl_tpu.rl.sweep import main

    path = tmp_path / "nosweep.yaml"
    path.write_text("NUM_ENVS: 4\n")
    monkeypatch.setattr("sys.argv", ["sweep", "--config", str(path)])
    with pytest.raises(SystemExit):
        main()


def test_shipped_sweep_config_keys_valid():
    """configs/sweep_fine.yaml's base + every grid assignment must survive
    the strict config merge (unknown keys raise)."""
    import copy
    import os

    import yaml

    from vit_marl_tpu.config import make_config
    from vit_marl_tpu.rl.sweep import _set_dotted

    path = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "sweep_fine.yaml")
    raw = yaml.safe_load(open(path))
    grid = raw.pop("SWEEP")
    base = copy.deepcopy(raw)
    for k, vals in grid.items():
        _set_dotted(base, k, vals[0])
    make_config(base)  # raises on any unknown key


def test_grid_to_wandb_sweep_shape():
    """Dotted grid -> nested wandb sweep config, the reference's shape
    (ref: ippo_rnn_JAXMARL.py:952-984)."""
    from vit_marl_tpu.rl.sweep import grid_to_wandb_sweep

    cfg = grid_to_wandb_sweep({
        "LR": [1e-4, 2.5e-4],
        "AGENT_CONFIGS.MarketMaking.REWARD_SPACE": ["spooner"],
        "AGENT_CONFIGS.Execution.TASK_SIZE": [600],
    })
    assert cfg["method"] == "grid"
    p = cfg["parameters"]
    assert p["LR"] == {"values": [1e-4, 2.5e-4]}
    mm = p["AGENT_CONFIGS"]["parameters"]["MarketMaking"]["parameters"]
    assert mm["REWARD_SPACE"] == {"values": ["spooner"]}
    ex = p["AGENT_CONFIGS"]["parameters"]["Execution"]["parameters"]
    assert ex["TASK_SIZE"] == {"values": [600]}


def test_run_wandb_sweep_with_stubbed_service(monkeypatch, tmp_path):
    """run_wandb_sweep registers the sweep and each agent trial applies the
    service-assigned (nested) overrides before training. wandb itself is
    stubbed — the orchestration seam is what's under test."""
    import sys
    import types

    from vit_marl_tpu.rl import sweep as sweep_mod

    calls = {}

    class FakeRun:
        config = {"LR": 1e-3,
                  "AGENT_CONFIGS": {"Execution": {"TASK_SIZE": 7}},
                  "_wandb": {"internal": True}}

        def finish(self):
            calls["finished"] = True

    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: FakeRun()
    fake.log = lambda d: calls.setdefault("logged", d)

    def fake_sweep(sweep, project, entity):
        calls["sweep_cfg"] = sweep
        return "sweep123"

    def fake_agent(sweep_id, function, count):
        calls["sweep_id"] = sweep_id
        function()          # one trial

    fake.sweep = fake_sweep
    fake.agent = fake_agent
    monkeypatch.setitem(sys.modules, "wandb", fake)

    seen = {}

    def fake_make_train(ma, tc):
        seen["lr"] = tc.lr
        seen["task_size"] = ma.agents[0].task_size
        return lambda key: {"metrics": [{"MM/mean_reward": 1.0}]}

    monkeypatch.setattr(sweep_mod, "make_train", fake_make_train)

    base = {"NUM_ENVS": 4, "NUM_STEPS": 4, "TOTAL_TIMESTEPS": 16}
    sid = sweep_mod.run_wandb_sweep(
        base, {"LR": [1e-3], "AGENT_CONFIGS.Execution.TASK_SIZE": [7]})
    assert sid == "sweep123"
    assert calls["sweep_cfg"]["parameters"]["LR"] == {"values": [1e-3]}
    assert seen["lr"] == 1e-3 and seen["task_size"] == 7
    assert calls["logged"] == {"MM/mean_reward": 1.0}
    assert calls["finished"]


def test_run_wandb_sweep_without_wandb_raises(monkeypatch):
    import builtins

    real_import = builtins.__import__

    def no_wandb(name, *a, **kw):
        if name == "wandb":
            raise ImportError("no wandb")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_wandb)
    from vit_marl_tpu.rl.sweep import run_wandb_sweep

    with pytest.raises(RuntimeError, match="run_sweep"):
        run_wandb_sweep({}, {"LR": [1e-4]})
