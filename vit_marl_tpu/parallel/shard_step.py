"""Shard the batched env step over a mesh with ``shard_map``.

Why this exists: GSPMD cannot partition a ``pallas_call`` — under pjit
auto-sharding it *replicates* the op (all-gather the input, run the full
batch on every chip).  ``make_train`` therefore routes mesh training
through the XLA engine (rl/ppo.py mesh guard).  This module provides the
TPU-native alternative: an explicitly sharded step in which every device
runs the fused Pallas book kernel on its LOCAL env shard — the
scaling-book recipe of "batch-parallel kernel inside shard_map, XLA
collectives outside".

Design:

- Per-env PRNG keys are pre-split OUTSIDE the shard_map and ride with
  their envs (``WorldEnv.step_vec_presplit``), so each shard computes
  exactly the rows the unsharded call would — results are bit-equal to
  ``step_vec`` regardless of the mesh shape (tested on the 8-device CPU
  mesh, tests/test_parallel.py::test_sharded_step_matches_unsharded).
- Kernel eligibility is evaluated per shard: each device's local batch
  must be an ENV_BLOCK (128) multiple for the kernel path, i.e. global
  envs % (128 * n_devices) == 0.  Off-TPU the engine falls back to the
  vmapped XLA scan per shard, which keeps the test semantics identical.
- Params are replicated (``P()``); every array in states/keys/actions and
  every output leaf is sharded on its leading env axis.

Reference parity note: the reference's pmap rollout
(/root/reference/gymnax_exchange/jaxrl/MARL/ippo_rnn_JAXMARL_pmap.py)
achieves multi-device stepping by replicating the env code per device;
this is the jax.sharding-era equivalent with explicit placement.
"""

from __future__ import annotations

from typing import Any, List

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

Array = jax.Array


def make_sharded_step(env, mesh: Mesh, axis=None):
    """Return ``step(key, states, actions, params)`` sharded over ``axis``.

    ``axis`` may be one mesh axis name or a tuple of them (the leading env
    axis splits over their product — matching ``parallel.mesh.shard_batch``'s
    default of every ``data``/``*_data`` axis).  Same signature and
    (bit-equal) results as ``env.step_vec``; the env batch, per-env keys
    and all outputs are sharded over the data axes, params replicated.
    The Pallas engine (when eligible per shard) runs per shard.
    """
    if axis is None:
        from vit_marl_tpu.parallel.mesh import data_axis_names
        axis = data_axis_names(mesh)
        if not axis:
            raise ValueError(
                "make_sharded_step: mesh has no 'data'/'*_data' axis to "
                f"shard envs over (axes: {mesh.axis_names}); pass axis= "
                "explicitly or add a data axis to the mesh")
    if isinstance(axis, (tuple, list)) and len(axis) == 1:
        axis = axis[0]
    env_spec = P(axis)

    def spec_like(tree):
        # every array leaf carries a leading env axis
        return jax.tree.map(lambda _: env_spec, tree)

    def body(step_keys, reset_keys, states, actions, params):
        return env.step_vec_presplit(step_keys, reset_keys, states,
                                     actions, params)

    @jax.jit
    def step(key: Array, states, actions: List[Any], params):
        E = states.world.step_counter.shape[0]
        key, key_step, key_reset = jax.random.split(key, 3)
        step_keys = jax.random.split(key_step, E)
        reset_keys = jax.random.split(key_reset, E)
        sharded = shard_map(
            body, mesh=mesh,
            in_specs=(env_spec, env_spec, spec_like(states),
                      spec_like(actions),
                      jax.tree.map(lambda _: P(), params)),
            # every output leaf (obs, next states, rewards, dones, infos)
            # is per-env; a single spec acts as a pytree prefix
            out_specs=env_spec,
            check_rep=False,
        )
        return sharded(step_keys, reset_keys, states, actions, params)

    return step
