"""Logger backends, plotting entry points, and profiling helpers.

These are the observability seams the training/eval scripts depend on
(ref: wandb io_callback logging ippo_rnn_JAXMARL.py:680-763; analysis
scripts jaxrl/MARL/baseline_eval/plotting_*.py).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from vit_marl_tpu.rl.logger import Logger


class TestLogger:
    def test_jsonl_backend_writes_parseable_lines(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        lg = Logger("jsonl", path)
        lg.log({"update_step": 0, "MM/mean_reward": jnp.float32(1.5)})
        lg.log({"update_step": 1, "MM/mean_reward": np.float64(-2.0),
                "vec": jnp.arange(3)})
        rows = [json.loads(line) for line in open(path)]
        assert rows[0]["MM/mean_reward"] == 1.5
        assert rows[1]["vec"] == [0, 1, 2]

    def test_print_backend_formats(self, capsys):
        Logger("print").log({"update_step": 3, "a/loss": 0.25,
                             "b/reward": jnp.float32(2.0)})
        out = capsys.readouterr().out
        assert "[update 3]" in out and "a/loss=0.25" in out

    def test_none_backend_is_noop(self, tmp_path, capsys):
        Logger("none", str(tmp_path / "x.jsonl")).log({"update_step": 0})
        assert capsys.readouterr().out == ""
        assert not os.path.exists(tmp_path / "x.jsonl")

    def test_io_callback_logs_from_inside_jit(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        lg = Logger("jsonl", path)

        @jax.jit
        def step(x):
            lg.io_callback({"update_step": 0, "val": x.sum()})
            return x + 1

        jax.block_until_ready(step(jnp.ones(4)))
        rows = [json.loads(line) for line in open(path)]
        assert rows and rows[0]["val"] == 4.0

    def test_wandb_backend_falls_back_without_wandb(self, monkeypatch):
        import builtins
        real_import = builtins.__import__

        def no_wandb(name, *a, **k):
            if name == "wandb":
                raise ImportError(name)
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", no_wandb)
        assert Logger("wandb").backend == "jsonl"


class TestPlotting:
    def _metrics_jsonl(self, tmp_path, resume_tail=False):
        path = str(tmp_path / "metrics.jsonl")
        with open(path, "w") as f:
            for i in range(12):
                f.write(json.dumps({"update_step": i,
                                    "MM/mean_reward": float(i),
                                    "EXE/mean_reward": float(-i),
                                    "EXE/eval_mean_reward": float(i) / 2})
                        + "\n")
            if resume_tail:  # resume re-logs updates since the last ckpt
                for i in range(8, 12):
                    f.write(json.dumps({"update_step": i,
                                        "MM/mean_reward": 100.0,
                                        "EXE/mean_reward": 100.0}) + "\n")
        return path

    def test_learning_curves_writes_png(self, tmp_path):
        from vit_marl_tpu.eval.plotting import learning_curves
        out = str(tmp_path / "curves.png")
        learning_curves(self._metrics_jsonl(tmp_path), save_path=out)
        assert os.path.getsize(out) > 0

    def test_learning_curves_dedupes_resume_relogs(self, tmp_path):
        from vit_marl_tpu.eval.plotting import learning_curves
        out = str(tmp_path / "curves.png")
        fig = learning_curves(self._metrics_jsonl(tmp_path, resume_tail=True),
                              save_path=out)
        # after dedupe, the LAST row per update_step wins (the re-logged
        # 100.0 tail), and each step appears once
        ax = fig.axes[1]  # MM panel order is sorted: EXE, MM
        xs, ys = ax.lines[0].get_data()
        assert len(xs) == 12 and ys[-1] == 100.0

    def test_combination_heatmap_and_triangular(self, tmp_path):
        from vit_marl_tpu.eval.plotting import (combination_heatmap,
                                                triangular_plot)
        results = {c: {"mean_rewards": [float(i), float(-i)]}
                   for i, c in enumerate(["BB", "BL", "LB", "LL"])}
        p1 = str(tmp_path / "h.png")
        p2 = str(tmp_path / "t.png")
        combination_heatmap(results, 0, save_path=p1)
        triangular_plot(results, 1, save_path=p2)
        assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0

    def test_episode_feature_plot(self, tmp_path):
        from vit_marl_tpu.eval.plotting import episode_feature_plot
        traj = {"agent_infos": [{"inventory": np.arange(20).reshape(10, 2)}]}
        out = str(tmp_path / "ep.png")
        episode_feature_plot(traj, 0, "inventory", save_path=out)
        assert os.path.getsize(out) > 0


class TestProfiling:
    def test_timed_prints_label(self, capsys):
        from vit_marl_tpu.utils.profiling import timed
        x = jnp.ones(8)
        with timed("probe", sync=x):
            x = x * 2
        assert "[probe]" in capsys.readouterr().out

    def test_trace_writes_profile_dir(self, tmp_path):
        from vit_marl_tpu.utils.profiling import trace
        d = str(tmp_path / "trace")
        with trace(d):
            jax.block_until_ready(jnp.ones(16) @ jnp.ones((16, 4)))
        # the profiler lays out plugins/profile/<ts>/ under the log dir
        assert any(os.scandir(d)), "no trace output written"
