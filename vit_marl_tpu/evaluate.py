"""Evaluation CLI: checkpoint restore + Learned-vs-Baseline combinations.

Rebuild of the reference's evaluation entry point
(ref: gymnax_exchange/jaxrl/MARL/baseline_eval/baseline_JAXMARL.py): restores
trained policies from an orbax checkpoint, pairs them with the canonical
baselines (AvSt market maker / TWAP execution driven by fixed-action
pickers, ref: baseline_eval/config/base_config.yaml:56-59), rolls out every
Learned/Baseline combination, and writes a JSON summary plus heatmap /
trajectory plots.

Usage:
  python -m vit_marl_tpu.evaluate --config configs/ippo_2player.yaml \
      --checkpoint-dir checkpoints/run1 --num-envs 64 --num-steps 50 \
      --out-dir eval_out
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--set", action="append", default=[], dest="sets",
                   metavar="KEY=VALUE",
                   help="override a config key (must match the training "
                        "run's overrides, or the checkpoint won't restore)")
    p.add_argument("--checkpoint-dir", default=None,
                   help="orbax checkpoint dir; omit for random 'learned' "
                        "policies (harness smoke test)")
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--num-steps", type=int, default=50)
    p.add_argument("--out-dir", default="eval_out")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--episode-plot-envs", type=int, default=2,
                   help="number of envs to draw per-episode analysis "
                        "figures for (per L/B combo)")
    p.add_argument("--greedy", action="store_true",
                   help="take distribution modes instead of sampling "
                        "(default samples, matching the reference eval — "
                        "ref: baseline_JAXMARL.py samples from pi)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (env vars don't override the "
                        "preset axon platform; jax.config does)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import yaml

    from vit_marl_tpu.config import make_config
    from vit_marl_tpu.env.spaces import Box
    from vit_marl_tpu.env.world import WorldEnv
    from vit_marl_tpu.eval.baselines import (
        FixedActionPolicy,
        LearnedPolicy,
        RandomPolicy,
    )
    from vit_marl_tpu.eval.combinations import evaluate_combinations
    from vit_marl_tpu.eval.plotting import (
        combination_heatmap,
        episode_report,
        triangular_plot,
    )
    from vit_marl_tpu.models.rnn import ScannedGRU
    from vit_marl_tpu.rl.ppo import make_network
    from vit_marl_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    raw = {}
    if args.config:
        with open(args.config) as f:
            raw = yaml.safe_load(f) or {}
    from vit_marl_tpu.utils.cli import apply_set_overrides
    apply_set_overrides(raw, args.sets)
    ma_config, train_config = make_config(raw)
    env = WorldEnv(ma_config)
    params = env.default_params
    n_types = len(env.agent_types)

    # learned policies (checkpoint restore, ref: baseline_JAXMARL.py:223-306)
    learned = []
    if args.checkpoint_dir:
        from vit_marl_tpu.rl.checkpoint import CheckpointManager

        networks = []
        for i in range(n_types):
            networks.append(make_network(train_config, i,
                                         env.action_spaces[i],
                                         env.observation_spaces[i]))
        mgr = CheckpointManager(args.checkpoint_dir)
        restored = mgr.restore()
        for i in range(n_types):
            learned.append(LearnedPolicy(networks[i], restored["params"][i]))
        print(f"restored checkpoint step {mgr.latest_step()}")
    else:
        for i in range(n_types):
            sp = env.action_spaces[i]
            learned.append(RandomPolicy(sp.n) if not isinstance(sp, Box)
                           else FixedActionPolicy(
                               np.asarray((sp.low + sp.high) / 2),
                               continuous=True))
        print("no checkpoint given: using random policies as 'learned'")

    # baselines: fixed actions on whatever action space each type runs
    baseline = []
    for i in range(n_types):
        sp = env.action_spaces[i]
        if isinstance(sp, Box):
            baseline.append(FixedActionPolicy(np.asarray(sp.low),
                                              continuous=True))
        else:
            baseline.append(FixedActionPolicy(0, n_actions=int(sp.n)))

    results = evaluate_combinations(env, params, learned, baseline,
                                    args.num_envs, args.num_steps,
                                    jax.random.PRNGKey(args.seed),
                                    mode="greedy" if args.greedy else "sample")

    os.makedirs(args.out_dir, exist_ok=True)
    summary = {combo: {"mean_rewards": r["mean_rewards"],
                       "episode_done_frac": r["episode_done_frac"]}
               for combo, r in results.items()}
    with open(os.path.join(args.out_dir, "combinations.json"), "w") as f:
        json.dump(summary, f, indent=2)
    names = [a.cfg.short_name for a in env.agent_types]
    for i in range(n_types):
        combination_heatmap(
            results, i, names,
            save_path=os.path.join(args.out_dir, f"heatmap_{names[i]}.png"))
        triangular_plot(
            results, i,
            save_path=os.path.join(args.out_dir, f"triangular_{names[i]}.png"))
    # per-episode analysis figures for every L/B combination
    # (ref: plotting_episodes.py per-combo trajectory suite)
    n_ep_envs = min(args.num_envs, args.episode_plot_envs)
    for combo, r in results.items():
        files = episode_report(
            r["traj"], os.path.join(args.out_dir, f"episodes_{combo}"),
            env_indices=range(n_ep_envs), agent_names=names)
        print(f"episode figures [{combo}]: {len(files)} written")
    print(json.dumps(summary, indent=2))
    print(f"wrote {args.out_dir}/combinations.json + plots")
    return results


if __name__ == "__main__":
    main()
