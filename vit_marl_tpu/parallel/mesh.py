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
is the primary distributed axis the workload needs — models are small
(<= ViT Base) and sequences short (book levels), so PP/SP/EP are explicit
non-goals.  A ``model`` mesh axis IS supported for tensor parallelism over
encoder weights (:func:`shard_params`, Megatron-style column/row placement;
numeric-equality tested on a 2x4 data-by-model CPU mesh) for when a larger
encoder outgrows one chip's HBM or the single-chip FLOP roofline
(BASELINE.md: ViT-Small caps at ~422k env-steps/s/chip).
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


def data_axis_names(mesh: Mesh) -> Tuple[str, ...]:
    """The env-batch mesh axes: ``data`` and every ``*_data`` axis (the
    hybrid DCN+ICI layout of ``make_hybrid_mesh``). May be EMPTY on a pure
    tensor-parallel mesh — the one shared definition every shard_map
    wrapper (shard_batch, shard_step, attention) resolves against, so they
    can never disagree about which axes carry envs."""
    return tuple(a for a in mesh.axis_names
                 if a == "data" or str(a).endswith("_data"))


def shard_batch(tree, mesh: Mesh, axis=None):
    """Place every leaf with its leading (batch) axis split over ``axis``.

    ``axis`` may be one mesh axis name or a tuple of them (the leading
    array axis is split over their product — the hybrid DCN+ICI layout of
    :func:`vit_marl_tpu.parallel.distributed.make_hybrid_mesh`).  Default:
    every mesh axis whose name is ``data`` or ends with ``_data``.

    Scalars (0-d leaves) are replicated; any array leaf whose leading axis
    is not divisible by the mesh axis is an error — silent replication there
    would mask a sharding regression.
    """
    if axis is None:
        # no data axis at all -> fall through to the literal "data" name so
        # the error below names the missing axis instead of silently
        # replicating the batch
        axis = data_axis_names(mesh) or "data"
    if isinstance(axis, (tuple, list)):
        axis = tuple(axis)
        if len(axis) == 1:
            axis = axis[0]
    n = (int(np.prod([mesh.shape[a] for a in axis]))
         if isinstance(axis, tuple) else mesh.shape[axis])

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


def shard_params(tree, mesh: Mesh, axis: str = "model"):
    """Tensor-parallel parameter placement over a ``model`` mesh axis.

    Megatron-style heuristic applied shape-wise (flax param trees carry no
    reliable layer names at this level): 2-D kernels shard their output
    dim if divisible by the axis size (column-parallel; covers qkv/mlp1),
    else their input dim (row-parallel; covers proj/mlp2); 1-D params
    (biases, LN scales) and anything indivisible replicate.  GSPMD inserts
    the matching all-reduces/all-gathers from these placements alone — no
    hand-written collectives (scaling-book recipe: pick a mesh, annotate
    shardings, let XLA place collectives).

    Falls back to full replication when the mesh has no ``axis`` or it has
    size 1, so callers can use this unconditionally.
    """
    if axis not in mesh.shape or mesh.shape[axis] == 1:
        return replicate(tree, mesh)
    n = mesh.shape[axis]

    def place(x):
        if getattr(x, "ndim", 0) == 2 and x.shape[1] % n == 0:
            spec = P(None, axis)
        elif getattr(x, "ndim", 0) == 2 and x.shape[0] % n == 0:
            spec = P(axis, None)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)
