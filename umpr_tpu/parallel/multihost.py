"""Multi-host (DCN) training support.

The reference is strictly single-node: its only distribution mechanism is
single-process DataParallel (reference main.py:81-84).  This module is the
TPU-pod extension: each host process owns its local chips,
``jax.distributed.initialize`` wires the processes into one global runtime
(coordinator + heartbeats over DCN), and the existing Mesh/jit machinery
then spans *all* hosts' devices -- ``jax.devices()`` is global after
initialization, so the jitted train step becomes a single SPMD program
whose gradient reductions ride ICI within a slice and DCN across slices,
with XLA choosing the collective implementation.

Host data pipeline: every process builds the same deterministic loader
(same corpus, seed, and shuffle order) and feeds only its own row-slice of
each global batch; ``put_global`` assembles the global ``jax.Array`` from
the per-process local rows without any cross-host data movement.  Dead-
sample padding keeps the per-process row counts equal, so the slice is
static.

Single-process runs are the common case and every entry point degrades to
a no-op / plain ``device_put`` there -- the trainer calls these
unconditionally.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               logger=None):
    """Join (or create) a multi-process JAX runtime.

    No-op unless multi-process operation is requested, either explicitly
    via arguments / ``--coordinator_address`` or implicitly by a TPU-pod
    environment (JAX_COORDINATOR_ADDRESS set by the launcher).  On Cloud
    TPU pods ``jax.distributed.initialize()`` auto-detects everything; on
    CPU/GPU clusters the coordinator/process arguments are required.
    """
    # Must not touch the backend before jax.distributed.initialize (even
    # jax.process_count() would initialise XLA), so consult the distributed
    # runtime state directly for the already-initialized check.
    try:
        from jax._src import distributed as _dist
        if _dist.global_state.client is not None:
            return True  # already initialized
    except Exception:
        pass
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if not coordinator_address and num_processes in (None, 0, 1):
        return False
    # Cross-process CPU collectives need an explicit implementation.  Set
    # unconditionally: it only affects CPU-client creation, and probing the
    # backend here (jax.default_backend()) would initialise XLA too early.
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    kw = {}
    if coordinator_address:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = int(num_processes)
    if process_id is not None:
        kw["process_id"] = int(process_id)
    jax.distributed.initialize(**kw)
    if logger is not None:
        logger.info(
            f"Multi-host runtime up: process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.local_device_count()} local / "
            f"{jax.device_count()} global devices.")
    return True


def is_primary():
    """True on the process that should write checkpoints / logs."""
    return jax.process_index() == 0


def local_rows(global_batch_size):
    """This process's row slice of a global batch (contiguous block
    partition: process i owns rows [i*B/p, (i+1)*B/p))."""
    p = jax.process_count()
    assert global_batch_size % p == 0, (
        f"global batch {global_batch_size} must divide over {p} processes")
    per = global_batch_size // p
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def barrier(name):
    """Block until every process reaches this point (no-op single-process).
    Deadlock rule: every process must call it the same number of times with
    the same names, in the same order."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def broadcast_str(s, max_len=512):
    """Process 0's string, visible to every process (no-op single-process).
    Used to agree on run-derived names (e.g. timestamped checkpoint dirs)
    that would otherwise diverge across hosts' clocks."""
    if jax.process_count() == 1:
        return s
    from jax.experimental import multihost_utils
    buf = np.zeros(max_len, np.uint8)
    b = s.encode("utf-8")[:max_len]
    buf[: len(b)] = np.frombuffer(b, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return out.tobytes().rstrip(b"\x00").decode("utf-8")


def broadcast_pytree(tree):
    """Process 0's pytree of arrays, on every process (no-op
    single-process).  Non-primary processes pass a like-structured tree
    whose values are ignored.  Used to ship checkpoint restores from the
    primary (the only reader) to hosts that may not share its filesystem."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    host = jax.tree.map(np.asarray, tree)
    return multihost_utils.broadcast_one_to_all(host)


def put_replicated(tree, sharding):
    """numpy pytree -> globally-REPLICATED device arrays under `sharding`
    (which must be a fully-replicated spec).  Single-process: plain
    ``device_put``.  Multi-process: every process passes identical
    content (deterministic builds guarantee it for packed dataset
    arrays; anything host-dependent -- e.g. a decoded photo bank --
    must be broadcast from the primary first) and each provides the
    full array as its local data."""
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def put(v):
        # make_array_from_process_local_data rejects fully-replicated
        # shardings (empty host-local shard map); assemble explicitly
        # from one full copy per addressable device instead
        v = np.ascontiguousarray(v)
        bufs = [jax.device_put(v, d) for d in sharding.addressable_devices]
        return jax.make_array_from_single_device_arrays(
            v.shape, sharding, bufs)

    return jax.tree.map(put, tree)


def put_global(batch, sharding, batch_axis=0):
    """Host numpy batch dict -> global device arrays under `sharding`.

    Single-process: plain ``device_put``.  Multi-process: each process
    passes only its local row block along ``batch_axis`` and the global
    array is assembled from the per-process shards
    (``make_array_from_process_local_data``), so no host ships rows it does
    not own.  Callers must pass the SAME global batch content on every
    process (deterministic loaders guarantee it); only the local slice of
    each array is read, so non-local rows may hold anything (e.g. undecoded
    zero photos).
    """
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    rows = local_rows(next(iter(batch.values())).shape[batch_axis])
    sel = (slice(None),) * batch_axis + (rows,)
    return {
        k: jax.make_array_from_process_local_data(sharding, np.ascontiguousarray(v[sel]))
        for k, v in batch.items()
    }
