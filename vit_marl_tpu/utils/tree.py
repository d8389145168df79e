"""Pytree helpers (ref: gymnax_exchange/utils/utils.py:62-77)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_stack(trees):
    """Stack a list of identically-shaped pytrees along a new leading axis."""
    return jax.tree.map(lambda *v: jnp.stack(v), *trees)


def tree_unstack(tree):
    """Inverse of :func:`tree_stack`."""
    leaves, treedef = jax.tree.flatten(tree)
    return [treedef.unflatten(leaf) for leaf in zip(*leaves)]


@jax.jit
def index_tree(tree, index):
    """Gather ``leaf[index]`` from every leaf — the cheap in-graph reset
    gather (ref: utils.py:72-77, used by base_env.reset)."""
    return jax.tree.map(lambda leaf: leaf[index], tree)
