"""Config merge: case-insensitive two-tier overrides, strict unknown keys,
dotted --set CLI paths (ref: ippo_rnn_JAXMARL.py:144-163 lowercased-key
YAML merge — plus strictness the reference lacks: there a typo'd override
silently does nothing)."""

import glob

import pytest
import yaml

from vit_marl_tpu.config import make_config


def test_all_shipped_configs_load():
    for p in glob.glob("configs/*.yaml"):
        raw = yaml.safe_load(open(p))
        # SWEEP: is the sweep-runner's meta section (rl/sweep.py pops it
        # before building the base config) — not a TrainConfig field
        raw.pop("SWEEP", None)
        ma, tc = make_config(raw)
        assert ma.agents and tc.num_envs > 0
        # YAML 1.1 parses "1.0e9" (no sign) as a string — the merge must
        # coerce it, or num_updates crashes on str // int
        assert isinstance(tc.total_timesteps, (int, float)), p
        assert tc.num_updates >= 0


def test_case_insensitive_merge():
    ma, tc = make_config({
        "num_envs": 7,
        "WORLD": {"tick_size": 50},
        "AGENT_CONFIGS": {"Execution": {"task_SIZE": 42}},
    })
    assert tc.num_envs == 7
    assert ma.world.tick_size == 50
    assert ma.agents[0].task_size == 42


@pytest.mark.parametrize("raw,where", [
    ({"BLEND_AGGRESSIVE": True}, "top level"),
    ({"WORLD": {"NOT_A_FIELD": 1}}, "WORLD"),
    ({"AGENT_CONFIGS": {"Execution": {"TYPO_KEY": 1}}},
     "AGENT_CONFIGS.Execution"),
])
def test_unknown_keys_raise(raw, where):
    """Silently-ignored overrides are worse than errors: a top-level
    BLEND_AGGRESSIVE=true that does nothing would invalidate an entire
    A/B run (this exact bug was caught in round 4)."""
    with pytest.raises(ValueError, match=where.replace(".", r"\.")):
        make_config(raw)


def test_nested_agent_flag_reaches_config():
    ma, _ = make_config({
        "AGENT_CONFIGS": {"Execution": {"BLEND_AGGRESSIVE": True}}})
    assert ma.agents[0].blend_aggressive is True


def test_cli_dotted_set_merges_case_insensitively(tmp_path, monkeypatch):
    """--set AGENT_CONFIGS.EXECUTION.X merges into the YAML's existing
    'Execution' section (any case) rather than creating a second agent;
    unknown leaves raise via the strict merge."""
    import sys

    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        "NUM_ENVS: 4\nAGENT_CONFIGS:\n  Execution:\n    TASK_SIZE: 9\n")
    captured = {}

    import vit_marl_tpu.train as train_mod

    def fake_make_config(raw):
        captured.update(raw)
        raise SystemExit(0)  # stop before any training

    monkeypatch.setattr(train_mod, "make_config", fake_make_config,
                        raising=False)
    # train.py imports make_config inside main(); patch the source module
    import vit_marl_tpu.config as config_mod
    monkeypatch.setattr(config_mod, "make_config", fake_make_config)

    monkeypatch.setattr(sys, "argv", [
        "train", "--config", str(cfg),
        "--set", "AGENT_CONFIGS.EXECUTION.BLEND_AGGRESSIVE=true",
        "--set", "LR=1e-3"])
    with pytest.raises(SystemExit):
        train_mod.main()
    ex = captured["AGENT_CONFIGS"]["Execution"]
    assert ex["TASK_SIZE"] == 9                  # original key kept
    assert ex["BLEND_AGGRESSIVE"] is True        # merged into same section
    assert captured["LR"] == 1e-3
