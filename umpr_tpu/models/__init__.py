from umpr_tpu.models.umpr import ModelDims, init_umpr, umpr_forward  # noqa: F401
