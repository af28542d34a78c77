from umpr_tpu.utils.logging import get_logger, date  # noqa: F401
