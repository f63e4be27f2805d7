"""Checkpoint / resume for long-running optimizations.

The reference has no checkpointing (SURVEY.md §6: clients persist their
own state; the library's only serialization is newick export).  Here the
natural unit of persisted state is a pytree — fit.FitParams, optimizer
state, branch-length vectors — saved with Orbax (the standard JAX
checkpointer, multi-host-safe) when available, with a plain .npz fallback
so checkpointing never depends on optional machinery.
"""
from __future__ import annotations

import json
import os
from pathlib import Path

import jax
import numpy as np


def save(path, pytree) -> None:
    """Persist a pytree of arrays to `path` (directory)."""
    path = Path(path)
    try:
        import orbax.checkpoint as ocp
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(path.resolve() / "state", pytree, force=True)
        return
    except Exception:
        pass
    # fallback: flatten to npz + treedef json
    path.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(pytree)
    np.savez(path / "state.npz",
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
    (path / "treedef.json").write_text(json.dumps(str(treedef)))


def restore(path, like):
    """Restore a pytree saved by save(); `like` provides the structure
    (and dtypes for the npz fallback)."""
    path = Path(path)
    if (path / "state.npz").exists():
        data = np.load(path / "state.npz")
        leaves_like, treedef = jax.tree_util.tree_flatten(like)
        leaves = [np.asarray(data[f"leaf_{i}"], np.asarray(l).dtype)
                  for i, l in enumerate(leaves_like)]
        return jax.tree_util.tree_unflatten(treedef, leaves)
    import orbax.checkpoint as ocp
    ckpt = ocp.PyTreeCheckpointer()
    return ckpt.restore((path.resolve() / "state"), item=like)
