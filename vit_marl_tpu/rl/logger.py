"""Metric logging behind a thin interface.

The reference logs to wandb from inside the jitted update via
``jax.experimental.io_callback`` (ref: ippo_rnn_JAXMARL.py:680-763).  Here
the callback dispatches to a pluggable backend: "print", "jsonl", "wandb"
(if installed), or "none".
"""

from __future__ import annotations

import json
from typing import Any, Dict

import jax
import numpy as np


class Logger:
    def __init__(self, backend: str = "print", path: str = "metrics.jsonl"):
        self.backend = backend
        self.path = path
        self._wandb = None
        if backend == "wandb":
            try:
                import wandb
                self._wandb = wandb
            except ImportError:
                self.backend = "jsonl"

    def log(self, metrics: Dict[str, Any]) -> None:
        metrics = {k: (np.asarray(v).item()
                       if np.asarray(v).size == 1 else np.asarray(v).tolist())
                   for k, v in metrics.items()}
        if self.backend == "print":
            step = metrics.get("update_step", "?")
            keys = [k for k in sorted(metrics) if k != "update_step"][:8]
            line = " ".join(f"{k}={metrics[k]:.4g}" for k in keys
                            if isinstance(metrics[k], float))
            print(f"[update {step}] {line}")
        elif self.backend == "jsonl":
            with open(self.path, "a") as f:
                f.write(json.dumps(metrics) + "\n")
        elif self.backend == "wandb" and self._wandb is not None:
            self._wandb.log(metrics)

    def io_callback(self, metrics) -> None:
        """Host callback usable inside jit (ref: ippo_rnn_JAXMARL.py:763)."""
        jax.experimental.io_callback(self.log, None, metrics)
