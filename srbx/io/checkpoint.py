"""Checkpoint / resume for closed-loop and campaign state.

The reference's only 'resume' machinery is restoring backed-up `sharedData`
between batch scenarios (`src/A1_Sim_Series.cpp:527-537`, `backupData` at
`include/shared_structs.hpp:320-343`) plus a -1/-2/0 `resetRun` handshake
(`:73-79`). In the TPU engine every loop is a `lax.scan` whose carry is a
pytree, so a checkpoint is just that pytree serialized — these helpers write
it as a flat .npz (no pickle; the tree structure comes from a template at
restore time, which also guards against shape/key drift).
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def save(path, tree) -> None:
    """Serialize a pytree of arrays/scalars to `path` (.npz, atomic)."""
    leaves = jax.tree_util.tree_leaves(tree)
    arrays = {f"leaf_{i:04d}": np.asarray(l) for i, l in enumerate(leaves)}
    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    tmp.replace(path)


def restore(path, template):
    """Load a checkpoint written by `save` into the structure of `template`.

    Leaf count, shapes, and dtypes must match the template (dtype of the
    template wins, so an f32 TPU carry can restore an f64 CPU checkpoint).
    """
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(Path(path)) as data:
        keys = sorted(data.files)
        if len(keys) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(keys)} leaves, template {len(leaves)}"
            )
        out = []
        for key, leaf in zip(keys, leaves):
            arr = data[key]
            want = np.shape(leaf)
            if tuple(arr.shape) != tuple(want):
                raise ValueError(
                    f"{key}: checkpoint shape {arr.shape} != template {want}"
                )
            out.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, out)
