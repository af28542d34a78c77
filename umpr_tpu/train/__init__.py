from umpr_tpu.train.optim import make_optimizer, split_frozen  # noqa: F401
from umpr_tpu.train.step import make_train_step, make_eval_step  # noqa: F401
