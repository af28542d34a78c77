from umpr_tpu.parallel.mesh import make_mesh, replicated, batch_sharded  # noqa: F401
