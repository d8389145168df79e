"""Mesh construction and batch sharding for data-parallel training.

TPU-native replacement for the reference's pmap data parallelism
(ref: gymnax_exchange/jaxrl/MARL/ippo_rnn_JAXMARL_pmap.py:279-322, 786-788):
instead of ``flax.jax_utils.replicate`` + ``jax.pmap(axis_name=...)`` +
explicit ``lax.pmean`` of gradients, we lay out a ``jax.sharding.Mesh`` and
shard the *environment batch* across its ``data`` axis with
``NamedSharding``; the GSPMD partitioner then derives all collectives
(gradient all-reduce over ICI, all-to-alls for cross-env minibatch
shuffles) from the sharding constraints — no hand-written collectives.

Parallelism scope (per SURVEY.md section 2.8): data parallelism over envs
is the only distributed axis the workload needs — models are tiny (<= ViT
Base), sequences are short (book levels), so TP/PP/SP/EP are explicit
non-goals; the design leaves the mesh axes tuple open so a ``model`` axis
can be added for larger encoders.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axes: Sequence[str] = ("data",)) -> Mesh:
    """Build a device mesh; default = all devices on one ``data`` axis."""
    devices = jax.devices()
    if not shape:
        shape = (len(devices),)
    n = int(np.prod(shape))
    return Mesh(np.asarray(devices[:n]).reshape(shape), axis_names=tuple(axes))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place every leaf with its leading (batch) axis split over ``axis``.

    Scalars (0-d leaves) are replicated; any array leaf whose leading axis
    is not divisible by the mesh axis is an error — silent replication there
    would mask a sharding regression.
    """
    n = mesh.shape[axis]

    def put(x):
        if getattr(x, "ndim", 0) == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        if x.shape[0] % n != 0:
            raise ValueError(
                f"shard_batch: leading axis {x.shape[0]} of leaf with shape "
                f"{x.shape} is not divisible by mesh axis {axis!r}={n}")
        s = NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        return jax.device_put(x, s)

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh (params, opt state)."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
