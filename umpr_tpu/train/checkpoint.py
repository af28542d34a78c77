"""Checkpointing (Orbax): params + optimizer state + progress metadata.

The reference pickles whole torch modules on every new best validation MSE
and never saves optimizer state (main.py:47-52), so an interrupted run
restarts from scratch.  This keeps the same save-on-best policy and adds
what the reference lacks: optimizer state and progress counters, so
``--resume_path`` continues a run exactly where it stopped.

Layout under a checkpoint root:
    best/      -- params at the best validation MSE (what test() loads)
    last/      -- params + opt_state + meta for resume
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, str(treedef)


def save_pytree(path, tree):
    """Save a pytree of arrays as npz (order-based; structure fingerprint
    stored to catch mismatches on restore)."""
    os.makedirs(path, exist_ok=True)
    leaves, fingerprint = _flatten(tree)
    arrays = {f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(os.path.join(path, "arrays.npz"), **arrays)
    with open(os.path.join(path, "structure.json"), "w") as f:
        json.dump({"fingerprint": fingerprint, "n": len(leaves)}, f)


def restore_pytree(path, like):
    """Restore into the structure of `like` (constructed by init code)."""
    leaves, treedef = jax.tree_util.tree_flatten(like)
    with open(os.path.join(path, "structure.json")) as f:
        meta = json.load(f)
    if meta["n"] != len(leaves):
        raise ValueError(
            f"checkpoint at {path} has {meta['n']} leaves; expected {len(leaves)} "
            "(model/optimizer structure changed?)")
    with np.load(os.path.join(path, "arrays.npz")) as z:
        new_leaves = [z[f"leaf_{i:05d}"] for i in range(len(leaves))]
    for i, (old, new) in enumerate(zip(leaves, new_leaves)):
        if tuple(np.shape(old)) != tuple(new.shape):
            raise ValueError(
                f"checkpoint at {path}: leaf {i} has shape {new.shape}, "
                f"expected {np.shape(old)} (model size mismatch?)")
    new_leaves = [jax.numpy.asarray(nl) for nl in new_leaves]
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(like), new_leaves)


def save_meta(path, **meta):
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_meta(path):
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)


def save_best(root, params):
    save_pytree(os.path.join(root, "best"), params)


def restore_best(root, like_params):
    return restore_pytree(os.path.join(root, "best"), like_params)


def save_last(root, trainable, opt_state, **meta):
    path = os.path.join(root, "last")
    save_pytree(path, {"trainable": trainable, "opt_state": opt_state})
    save_meta(path, **meta)


def restore_last(root, like_trainable, like_opt_state):
    path = os.path.join(root, "last")
    tree = restore_pytree(path, {"trainable": like_trainable, "opt_state": like_opt_state})
    return tree["trainable"], tree["opt_state"], load_meta(path)
