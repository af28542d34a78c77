from umpr_tpu.ops.gru import init_bigru, bigru  # noqa: F401
from umpr_tpu.ops import masking  # noqa: F401
