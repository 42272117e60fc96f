"""Filter-state checkpoint / resume.

The reference has no state checkpointing (SURVEY.md §5.4 — streaming-only);
the TPU build gets it structurally: the entire filter (VioState + feature
table + tracker state) is one pytree of arrays, so a checkpoint is a flat
npz.  Restoring mid-sequence resumes the estimator exactly (same jit
programs, same shapes).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree, prefix, out):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for i, leaf in enumerate(leaves):
        out[f"{prefix}.{i}"] = np.asarray(leaf)
    return treedef


def save(path, state, table=None, extra=None):
    """Write a checkpoint npz.  `extra` is an optional dict of arrays."""
    out = {}
    defs = {}
    defs["state"] = _flatten(state, "state", out)
    if table is not None:
        defs["table"] = _flatten(table, "table", out)
    if extra:
        for k, v in extra.items():
            out[f"extra.{k}"] = np.asarray(v)
    np.savez(path, **out)
    return defs


def load(path, state_template, table_template=None):
    """Restore (state, table, extra) shaped like the given templates."""
    data = np.load(path)

    def restore(template, prefix):
        leaves, treedef = jax.tree_util.tree_flatten(template)
        new = [jnp.asarray(data[f"{prefix}.{i}"]) for i in range(len(leaves))]
        return jax.tree_util.tree_unflatten(treedef, new)

    state = restore(state_template, "state")
    table = (restore(table_template, "table")
             if table_template is not None else None)
    extra = {k[len("extra."):]: data[k] for k in data.files
             if k.startswith("extra.")}
    return state, table, extra
