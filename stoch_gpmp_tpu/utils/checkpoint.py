"""Planner checkpoint/resume.

The reference has no persistence (SURVEY.md §5); its full resume state is the
particle means (plus RNG). Here planner state (a pytree of arrays + PRNG key)
serializes to a single ``.npz`` — sufficient for exact resume, verified by
tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def save_planner_state(path: str, state) -> None:
    """Save a pytree planner state (e.g. ``StochGPMPState``) to ``.npz``."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {}
    for i, leaf in enumerate(leaves):
        arr = np.asarray(
            jax.random.key_data(leaf) if jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key) else leaf
        )
        is_key = jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key)
        arrays[f"leaf_{i}"] = arr
        arrays[f"leaf_{i}_is_key"] = np.asarray(is_key)
        if is_key:
            arrays[f"leaf_{i}_impl"] = np.asarray(
                str(jax.random.key_impl(leaf))
            )
    np.savez(path, **arrays)


def load_planner_state(path: str, like):
    """Load a state saved by ``save_planner_state``; ``like`` provides the
    pytree structure (e.g. the current planner state)."""
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    out = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if bool(data[f"leaf_{i}_is_key"]):
            impl = str(data[f"leaf_{i}_impl"])
            out.append(jax.random.wrap_key_data(jnp.asarray(arr), impl=impl))
        else:
            out.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, out)
