"""Orbax checkpointing wrappers (ref: ippo_rnn_JAXMARL.py:781-828).

Saves per-type network params (+ metrics) every update, keeping the last
``max_to_keep``; restore by step or latest.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax  # orbax imports jax transitively; keep the dependency explicit
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 2,
                 keep_period: Optional[int] = None):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, keep_period=keep_period, create=True)
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, params_list, metrics: Optional[Dict] = None,
             opt_states=None, train_steps=None):
        """Save per-type params (+ optionally optimizer state and step
        counters, enabling mid-training resume — a capability the
        reference lacks: its killed runs restart at update 0).

        ``opt_states`` are stored as flat leaf lists (``jax.tree.leaves``)
        because optax chain states contain empty namedtuple nodes
        (``EmptyState``) that pytree checkpointing rejects; the caller
        re-unflattens against its live treedef on restore.
        """

        payload = {"params": params_list}
        if metrics is not None:
            payload["metrics"] = {k: float(v) for k, v in metrics.items()}
        if opt_states is not None:
            payload["opt_leaves"] = [jax.tree.leaves(s) for s in opt_states]
        if train_steps is not None:
            payload["step"] = list(train_steps)
        self._mgr.save(step, args=ocp.args.StandardSave(payload))

    def restore(self, step: Optional[int] = None,
                template: Any = None) -> Dict:
        step = self.latest_step() if step is None else step
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        # No template: restore every array as HOST numpy via the pytree
        # handler, ignoring the sharding recorded at save time.  The default
        # restore pins arrays to the devices present when the checkpoint was
        # written, so a TPU-trained checkpoint refuses to restore on CPU (or
        # any different topology) with "Device TPU v5 lite0 was not found in
        # jax.local_devices()".  Numpy leaves transfer on first use.
        import numpy as np

        path = os.path.join(self.directory, str(step), "default")
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path).item_metadata
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
        return ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
