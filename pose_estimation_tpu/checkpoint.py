"""Checkpoint / resume for the VIO state.

The reference has no state serialization at all (SURVEY.md section 5 —
only the terminal `states.csv`). Here the whole persistent state is one
pytree (`VIOState`), so checkpointing is a flat array dump and resume is a
load + continue.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.models import vio as vio_mod


def save_checkpoint(path: str, state: vio_mod.VIOState, meta: dict | None = None):
    """Serialize a VIOState (+ optional metadata) to an .npz file."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["_meta"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_checkpoint(path: str, static: vio_mod.VIOStatic):
    """Returns (VIOState, meta). Shapes must match the static config."""
    data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    template = vio_mod.init_vio_state(static)
    leaves, treedef = jax.tree.flatten(template)
    new_leaves = []
    for i, tmpl in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != tmpl.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected {tmpl.shape}"
                " (config capacities changed?)"
            )
        new_leaves.append(jnp.asarray(arr, tmpl.dtype))
    meta = json.loads(bytes(data["_meta"]).decode()) if "_meta" in data else {}
    return jax.tree.unflatten(treedef, new_leaves), meta
