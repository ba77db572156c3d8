"""Checkpoint / resume: serialize any pytree state to a single .npz.

The reference has no checkpointing at all (iSAM graph in RAM,
trajectory dumped at the end — SURVEY.md §5); here the whole solver
state (keyframe window, landmark store, factor buffers) is one pytree
of arrays, so snapshot/restore is a flatten + np.savez.  Used for
mid-sequence resume and by the eval harness.
"""

from __future__ import annotations

import json

import jax
import numpy as np


def save_state(path: str, state, meta: dict | None = None) -> None:
    """Snapshot a pytree to ``path`` (.npz).  ``meta`` is any JSON-able
    dict stored alongside (e.g. frame index, config name)."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_state(path: str, like):
    """Restore a pytree snapshot.  ``like`` provides the tree structure
    (e.g. a freshly-initialized state of the same config).

    Returns (state, meta).
    """
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
    leaves, treedef = jax.tree.flatten(like)
    n = len(leaves)
    new_leaves = [data[f"leaf_{i}"] for i in range(n)]
    import jax.numpy as jnp

    new_leaves = [
        jnp.asarray(x).astype(l.dtype) if hasattr(l, "dtype") else x
        for x, l in zip(new_leaves, leaves)
    ]
    return jax.tree.unflatten(treedef, new_leaves), meta
