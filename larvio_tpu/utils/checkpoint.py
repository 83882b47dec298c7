"""Filter-state checkpoint / resume.

The reference keeps all estimator state in RAM and persists only the output
trajectory (SURVEY.md §5 "Checkpoint / resume": none). Here the whole
estimator is one pytree, so save/restore is a for-free win: long sequences
and fleet runs can resume mid-flight.

Orbax is used when available (async, multi-host-aware); the .npz fallback is
dependency-free and portable.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_state(path: str, state: Any) -> None:
    """Save any pytree (PipelineState / VioState / FilterState)."""
    if path.endswith(".npz"):
        flat, _ = _flatten_with_paths(state)
        np.savez_compressed(path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})
        return
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        ckptr.wait_until_finished()
    except Exception:
        flat, _ = _flatten_with_paths(state)
        np.savez_compressed(
            path + ".npz", **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
        )


def restore_state(path: str, template: Any) -> Any:
    """Restore into the structure of ``template`` (same config/shapes)."""
    npz = path if path.endswith(".npz") else path + ".npz"
    if os.path.exists(npz):
        data = np.load(npz)
        flat, treedef = _flatten_with_paths(template)
        leaves = [data[f"leaf_{i}"] for i in range(len(flat))]
        import jax.numpy as jnp

        return jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(v) for v in leaves]
        )
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
