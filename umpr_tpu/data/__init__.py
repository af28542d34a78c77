from umpr_tpu.data.dataset import UMPRDataset, build_dataset  # noqa: F401
from umpr_tpu.data.loader import BatchLoader  # noqa: F401
