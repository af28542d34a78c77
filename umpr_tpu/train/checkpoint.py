"""Checkpointing: params + optimizer state + progress metadata.

The reference pickles whole torch modules on every new best validation MSE
and never saves optimizer state (main.py:47-52), so an interrupted run
restarts from scratch.  This keeps the same save-on-best policy and adds
what the reference lacks: optimizer state and progress counters, so
``--resume_path`` continues a run exactly where it stopped.

Formats (selected by ``--checkpoint_backend``, auto-detected on restore):

- ``npz`` (default): leaves **keyed by pytree path** plus a versioned
  ``structure.json`` (treedef fingerprint + key list).  Restore resolves
  leaves by path, so a renamed or reordered params dict fails loudly
  instead of silently loading weights into the wrong parameters; legacy
  order-based (v0) checkpoints are still readable but only when their
  structure fingerprint matches exactly.
- ``orbax``: the standard JAX checkpoint library (per-leaf OCDBT store,
  same path-keyed safety, plus ecosystem interop -- other JAX tools can
  read the run's checkpoints directly).

Layout under a checkpoint root:
    best/      -- params at the best validation MSE (what test() loads)
    last/      -- params + opt_state + meta for resume
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

FORMAT_VERSION = 1


def _flatten_with_keys(tree):
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(tree)
    keys = [jax.tree_util.keystr(p) for p, _ in leaves_with_path]
    leaves = [x for _, x in leaves_with_path]
    return keys, leaves, str(treedef)


def _orbax_dir(path):
    return os.path.join(os.path.abspath(path), "orbax")


def _save_orbax(path, tree):
    """Atomic overwrite: write next to the live copy, then swap via an
    .old hold -- at every instant either the live dir or the .old dir holds
    a complete checkpoint, so a crash at any point loses nothing (the
    restore side falls back to .old when the live dir is missing)."""
    import shutil
    import orbax.checkpoint as ocp
    target = _orbax_dir(path)
    tmp, old = target + ".tmp", target + ".old"
    for stale in (tmp,):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    host_tree = jax.tree.map(np.asarray, tree)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp, host_tree)
    # .old is dropped only while a complete live dir exists: after a crashed
    # swap (target missing, .old = the only good copy) the next save must
    # keep .old until tmp is promoted, or a second crash loses everything.
    if os.path.exists(target):
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(target, old)
    os.rename(tmp, target)
    if os.path.exists(old):
        shutil.rmtree(old)


def _orbax_restore_dir(path):
    """The live orbax dir, or the .old hold if a crash interrupted the
    swap between the two renames."""
    target = _orbax_dir(path)
    if os.path.exists(target):
        return target
    if os.path.exists(target + ".old"):
        return target + ".old"
    return None


def _restore_orbax(path, like):
    import orbax.checkpoint as ocp
    host_like = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), like)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(_orbax_restore_dir(path), host_like)
    return jax.tree.map(jax.numpy.asarray, restored)


def _clear_other_format(path, keep):
    """Saving must leave exactly one on-disk format: a stale copy of the
    other backend would win (or confuse) the restore auto-detection.
    Called AFTER the new format is fully written, so a crashed save never
    deletes the only good checkpoint."""
    if keep != "orbax":
        import shutil
        for d in (_orbax_dir(path), _orbax_dir(path) + ".old",
                  _orbax_dir(path) + ".tmp"):
            if os.path.exists(d):
                shutil.rmtree(d)
    if keep != "npz":
        for name in ("structure.json", "arrays.npz"):
            p = os.path.join(path, name)
            if os.path.exists(p):
                os.remove(p)


def save_pytree(path, tree, backend="npz"):
    """Save a pytree of arrays, path-keyed (npz or orbax backend)."""
    os.makedirs(path, exist_ok=True)
    if backend == "orbax":
        _save_orbax(path, tree)
        _clear_other_format(path, keep="orbax")
        return
    keys, leaves, fingerprint = _flatten_with_keys(tree)
    if len(set(keys)) != len(keys):
        raise ValueError("pytree has duplicate path keys; cannot checkpoint")

    def savable(x):
        # numpy serializes non-native dtypes (bfloat16 Adam moments) as raw
        # void bytes, losing the dtype on load; store them widened to f32
        # (lossless) -- restore casts back to the model's dtype.
        a = np.asarray(x)
        if a.dtype.kind == "V" or a.dtype.name == "bfloat16":
            a = a.astype(np.float32)
        return a

    arrays = {f"leaf_{i:05d}": savable(x) for i, x in enumerate(leaves)}
    # Logical (pre-widening) dtypes: restore uses these to tell "bf16 leaf
    # widened to f32 on disk" (cast back) from a REAL dtype mismatch like
    # resuming f32 Adam moments into a bf16-moment optimizer (raise).
    dtypes = [str(getattr(x, "dtype", None) or np.asarray(x).dtype)
              for x in leaves]
    # atomic overwrite: a crash mid-save must never leave a truncated
    # arrays.npz as the only copy of the run's best model
    np.savez(os.path.join(path, "arrays.tmp.npz"), **arrays)
    os.replace(os.path.join(path, "arrays.tmp.npz"),
               os.path.join(path, "arrays.npz"))
    with open(os.path.join(path, "structure.json.tmp"), "w") as f:
        json.dump({"version": FORMAT_VERSION, "keys": keys, "dtypes": dtypes,
                   "fingerprint": fingerprint, "n": len(leaves)}, f)
    os.replace(os.path.join(path, "structure.json.tmp"),
               os.path.join(path, "structure.json"))
    _clear_other_format(path, keep="npz")


def _restore_v0(path, meta, keys, leaves, like_fingerprint):
    """Legacy order-based format: safe only when the treedef matches."""
    if meta["n"] != len(leaves):
        raise ValueError(
            f"checkpoint at {path} has {meta['n']} leaves; expected "
            f"{len(leaves)} (model/optimizer structure changed?)")
    if meta.get("fingerprint") != like_fingerprint:
        raise ValueError(
            f"legacy (v0) checkpoint at {path} was written for a different "
            "pytree structure; order-based leaves cannot be safely mapped. "
            "Re-save with the current code to upgrade to the path-keyed "
            "format.")
    with np.load(os.path.join(path, "arrays.npz")) as z:
        return [z[f"leaf_{i:05d}"] for i in range(len(leaves))]


def restore_pytree(path, like):
    """Restore into the structure of `like` (constructed by init code).

    Leaves are matched by pytree path; missing or extra keys raise with the
    offending paths named.  The on-disk backend (npz vs orbax) is
    auto-detected, so any consumer can read any producer's checkpoints.
    """
    npz_meta = os.path.join(path, "structure.json")
    orbax_dir = _orbax_restore_dir(path)
    if orbax_dir is not None:
        if not os.path.exists(npz_meta):
            return _restore_orbax(path, like)
        # Both formats present: a crash after writing the new format but
        # before _clear_other_format removed the other one.  Prefer the
        # newer checkpoint instead of silently resurrecting the stale
        # format (e.g. first orbax save over an old npz run).
        if os.path.getmtime(orbax_dir) > os.path.getmtime(npz_meta):
            return _restore_orbax(path, like)
    keys, leaves, like_fingerprint = _flatten_with_keys(like)
    with open(os.path.join(path, "structure.json")) as f:
        meta = json.load(f)

    if meta.get("version", 0) == 0:
        new_leaves = _restore_v0(path, meta, keys, leaves, like_fingerprint)
    else:
        index = {k: i for i, k in enumerate(meta["keys"])}
        missing = [k for k in keys if k not in index]
        extra = [k for k in meta["keys"] if k not in set(keys)]
        if missing or extra:
            raise ValueError(
                f"checkpoint at {path} does not match the model structure: "
                f"missing keys {missing[:5]}{'...' if len(missing) > 5 else ''}, "
                f"unexpected keys {extra[:5]}{'...' if len(extra) > 5 else ''}")
        with np.load(os.path.join(path, "arrays.npz")) as z:
            new_leaves = [z[f"leaf_{index[k]:05d}"] for k in keys]
        if meta.get("dtypes") is not None:
            # re-align the dtype record from checkpoint key order to the
            # model's key order (new_leaves order)
            meta = {**meta, "dtypes": [meta["dtypes"][index[k]] for k in keys]}

    saved_dtypes = meta.get("dtypes")  # absent in older checkpoints
    for i, (key, old, new) in enumerate(zip(keys, leaves, new_leaves)):
        if tuple(np.shape(old)) != tuple(new.shape):
            raise ValueError(
                f"checkpoint at {path}: leaf {key} has shape {new.shape}, "
                f"expected {np.shape(old)} (model size mismatch?)")
        like_dt = str(getattr(old, "dtype", None) or np.asarray(old).dtype)
        if saved_dtypes is not None and saved_dtypes[i] != like_dt:
            raise ValueError(
                f"checkpoint at {path}: leaf {key} was saved as "
                f"{saved_dtypes[i]} but the model expects {like_dt} "
                "(resuming across --adam_moment_dtype / --compute_dtype "
                "settings?). Restore with a matching configuration.")
    # Restore in the model's dtypes: undoes the lossless f32 widening of
    # bf16 leaves on disk.  With a dtype record this only ever narrows
    # widened bf16 back; for legacy checkpoints without one it remains a
    # silent best-effort cast.
    new_leaves = [jax.numpy.asarray(nl).astype(
                      getattr(old, "dtype", None) or np.asarray(old).dtype)
                  for old, nl in zip(leaves, new_leaves)]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), new_leaves)


def save_meta(path, **meta):
    # atomic like the array files: a crash mid-write must never leave a
    # truncated meta.json (it would make --resume_path unusable despite
    # intact arrays)
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, "meta.json"))


def load_meta(path):
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)


def has_pytree(path):
    """True when a restorable checkpoint (either backend) exists at path."""
    return (os.path.exists(os.path.join(path, "structure.json"))
            or _orbax_restore_dir(path) is not None)


def has_best(root):
    return has_pytree(os.path.join(root, "best"))


def save_best(root, params, backend="npz"):
    save_pytree(os.path.join(root, "best"), params, backend)


def restore_best(root, like_params):
    return restore_pytree(os.path.join(root, "best"), like_params)


def save_last(root, trainable, opt_state, backend="npz", **meta):
    """Arrays are swapped first, meta second (each atomically): a crash in
    between pairs the new arrays with the previous epoch's counters, so a
    resume re-trains that epoch -- conservative (training is never skipped,
    and save-best still guards the model quality)."""
    path = os.path.join(root, "last")
    save_pytree(path, {"trainable": trainable, "opt_state": opt_state}, backend)
    save_meta(path, **meta)


def restore_last(root, like_trainable, like_opt_state):
    path = os.path.join(root, "last")
    tree = restore_pytree(path, {"trainable": like_trainable, "opt_state": like_opt_state})
    return tree["trainable"], tree["opt_state"], load_meta(path)


class AsyncSaver:
    """Overlap checkpoint DISK WRITES with training (single-host).

    A save's wall cost is (device->host transfer) + (serialize/write).
    The trainer pays the transfer inline on the main thread -- safe by
    ordering, since the next train step's donation of the live buffers
    has not been dispatched yet -- and hands only the host-side
    serialization + write to this worker thread.  (A first design
    snapshotted with a jitted on-device copy and moved the transfer to
    the thread too; on this machine's remote-compile relay the trivial
    copy jit compiled for MINUTES and concurrent background transfers
    stalled the step loop -- measured 74 s at one save epoch.  Host
    numpy work races nothing and needs no compile.)

    One save in flight at a time: submit() joins the previous save first,
    so writes keep their order.  Failures surface on the join (next
    submit() or wait()); callers that READ checkpoints (test(), fit-end
    has_best, resume) must wait() first.
    """

    def __init__(self):
        self._pending = None
        self._executor = None

    def submit(self, fn, *args, **kwargs):
        from concurrent.futures import ThreadPoolExecutor
        self.wait()
        if self._executor is None:
            self._executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-save")
        self._pending = self._executor.submit(fn, *args, **kwargs)

    def wait(self):
        if self._pending is not None:
            p, self._pending = self._pending, None
            p.result()  # re-raises a failed save
