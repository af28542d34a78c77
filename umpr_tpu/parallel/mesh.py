"""Device mesh + sharding layout.

Replaces the reference's single-process DataParallel (main.py:81-84) with
SPMD over a jax.sharding.Mesh:

- parameters are replicated across the 'dp' axis;
- every batch array is sharded along its leading (batch) dimension;
- under jit, XLA inserts the gradient/loss reductions as ICI collectives
  (psum) automatically -- the hand-rolled scatter/gather and its per-shard
  length pitfalls (reference readme.md:154-160) do not exist by
  construction, because shapes are globally static and masks are data.

The mesh is 1-D ('dp') by default; `make_mesh` accepts an explicit shape so
larger topologies (dp x mp) can be laid out later without touching callers.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DEFAULT_AXES = ("dp", "mp", "pp")  # leading axis is always data-parallel


def make_mesh(devices=None, shape=None, axis_names=None):
    """Build a Mesh.  Default: every visible device on one 'dp' axis; an
    explicit shape names its axes ('dp', 'mp', 'pp', ...) leading-first so
    batch sharding always targets 'dp'."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape:
        devices = devices[: int(np.prod(shape))].reshape(tuple(shape))
        axis_names = axis_names or DEFAULT_AXES[: devices.ndim]
    else:
        devices = devices.reshape(-1)
        axis_names = axis_names or ("dp",)
    return Mesh(devices, axis_names)


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_sharded(mesh, axis="dp"):
    """Shard the leading (batch) dimension; replicate everything else."""
    return NamedSharding(mesh, P(axis))


def setup_runtime(config):
    """Shared Trainer/Predictor bring-up from a Config: device selection
    (with unavailable-platform fallback), --multi_gpu truncation, mesh,
    batch divisibility check, and ModelDims carrying the mesh's dp extent
    (the VGG fold gate reasons in per-device rows).  One implementation so
    serving can never compile a model whose fold gate disagrees with
    training.  Returns (mesh, replicated, batch_sharded, dims, n_dev)."""
    from umpr_tpu.models.umpr import ModelDims

    try:
        devices = jax.devices(config.device) if config.device else jax.devices()
    except RuntimeError:  # requested platform unavailable -> default
        devices = jax.devices()
    if not config.multi_gpu:
        devices = devices[:1]
    mesh = make_mesh(devices, shape=config.mesh_shape or None)
    n_dev = int(np.prod(mesh.devices.shape))
    assert config.batch_size % n_dev == 0, (
        f"batch_size {config.batch_size} must divide over {n_dev} devices")
    dims = ModelDims.from_config(
        config, n_data_devices=int(mesh.shape.get("dp", 1)))
    return mesh, replicated(mesh), batch_sharded(mesh), dims, n_dev
