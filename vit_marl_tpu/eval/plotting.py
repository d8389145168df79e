"""Evaluation plots: combination heatmaps + per-episode trajectories.

Rebuild of the reference's analysis scripts
(ref: jaxrl/MARL/baseline_eval/plotting_combinations.py,
plotting_episodes.py, simple_triangular_plot.py) on top of the in-memory
results of :func:`vit_marl_tpu.eval.combinations.evaluate_combinations`.
Matplotlib only; every function returns the figure so callers can save or
display.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def combination_heatmap(results: Dict[str, dict], agent_index: int = 0,
                        agent_names: Sequence[str] = ("MM", "EXE"),
                        save_path: Optional[str] = None):
    """n x n Learned-vs-Baseline mean-reward heatmap for one agent type
    (ref: plotting_combinations.py)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if len(next(iter(results))) < 2:
        # single agent type: a 2x2 grid is meaningless; use the bar plot
        return triangular_plot(results, agent_index, save_path)

    labels = ["L", "B"]
    grid = np.full((2, 2), np.nan)
    for combo, summary in results.items():
        i = labels.index(combo[0])
        j = labels.index(combo[1])
        grid[i, j] = summary["mean_rewards"][agent_index]
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(grid, cmap="RdYlGn")
    ax.set_xticks([0, 1], [f"{agent_names[1]}: L", f"{agent_names[1]}: B"])
    ax.set_yticks([0, 1], [f"{agent_names[0]}: L", f"{agent_names[0]}: B"])
    for i in range(2):
        for j in range(2):
            if np.isfinite(grid[i, j]):
                ax.text(j, i, f"{grid[i, j]:.2f}", ha="center", va="center")
    ax.set_title(f"mean reward: {agent_names[agent_index]}")
    fig.colorbar(im)
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    return fig


def triangular_plot(results: Dict[str, dict], agent_index: int = 0,
                    save_path: Optional[str] = None):
    """Triangular BB/BL/LB/LL comparison (ref: simple_triangular_plot.py)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    combos = sorted(results)
    vals = [results[c]["mean_rewards"][agent_index] for c in combos]
    fig, ax = plt.subplots(figsize=(5, 3))
    ax.bar(combos, vals)
    ax.set_ylabel("mean reward")
    ax.set_title(f"agent type {agent_index} across combinations")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    return fig


def episode_feature_plot(traj: dict, agent_index: int, feature: str,
                         env_index: int = 0, save_path: Optional[str] = None):
    """Per-step plot of one agent info feature over an episode
    (ref: plotting_episodes.py)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    series = np.asarray(traj["agent_infos"][agent_index][feature])
    series = series.reshape(series.shape[0], -1)[:, env_index]
    fig, ax = plt.subplots(figsize=(6, 3))
    ax.plot(series)
    ax.set_xlabel("step")
    ax.set_ylabel(feature)
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    return fig


def learning_curves(metrics_jsonl: str, save_path: Optional[str] = None,
                    smooth: int = 5):
    """Per-agent-type mean-reward training curves (plus held-out eval
    points when present) from a jsonl metrics log written by the trainer's
    jsonl backend (rl/logger.py)."""
    import json

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = [json.loads(line) for line in open(metrics_jsonl)]
    # resume appends: a run killed between checkpoints re-runs (and
    # re-logs) the updates since the last save — keep the LAST row per
    # update_step so curves stay monotonic and single-valued
    if rows and "update_step" in rows[0]:
        dedup = {}
        for r in rows:
            dedup[r.get("update_step")] = r
        rows = [dedup[k] for k in sorted(dedup)]
    names = sorted({k.split("/")[0] for k in rows[0] if "/" in k})
    fig, axes = plt.subplots(1, len(names), figsize=(5 * len(names), 3.2),
                             squeeze=False)
    for ax, name in zip(axes[0], names):
        steps = [r["update_step"] for r in rows if f"{name}/mean_reward" in r]
        vals = np.array([r[f"{name}/mean_reward"] for r in rows
                         if f"{name}/mean_reward" in r])
        if smooth > 1 and len(vals) > smooth:
            kern = np.ones(smooth) / smooth
            sm = np.convolve(vals, kern, mode="valid")
            ax.plot(steps, vals, alpha=0.25, color="C0")
            ax.plot(steps[smooth - 1:], sm, color="C0", label="train")
        else:
            ax.plot(steps, vals, color="C0", label="train")
        ev = [(r["update_step"], r[f"{name}/eval_mean_reward"])
              for r in rows if f"{name}/eval_mean_reward" in r]
        if ev:
            ax.plot(*zip(*ev), "o--", color="C1", label="held-out eval")
        ax.set_title(f"{name} mean reward")
        ax.set_xlabel("update")
        ax.legend(frameon=False, fontsize=8)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
    return fig
