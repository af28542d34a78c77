"""--save_last_every_epochs: epoch-boundary durability cadence.

The per-epoch last/-checkpoint write (full params + opt state) is a
fixed ~0.7 s host cost that dominates short-epoch walls (BENCH_DETAILS
"Through-trainer"); N > 1 thins it while the final epoch always saves so
a finished fit() is resumable from its end state."""

import json
import os

import numpy as np

from umpr_tpu.config import Config
from umpr_tpu.train.trainer import Trainer
from umpr_tpu.utils.logging import get_logger
from tests.test_device_dataset import packed_dataset, _W2v


def _fit(tmp_path, every, epochs=5, tag=""):
    calls = []
    from umpr_tpu.train import checkpoint as ckpt
    orig = ckpt.save_last

    def spy(*a, **kw):
        calls.append(kw.get("epoch"))
        return orig(*a, **kw)

    ckpt.save_last = spy
    try:
        cfg = Config(argv=[
            "--device", "cpu", "--multi_gpu", "False",
            "--review_net_only", "True", "--batch_size", "8",
            "--train_epochs", str(epochs), "--eval_every", "1000",
            "--min_sent_count", "1", "--seed", "2",
            "--save_last_every_epochs", str(every)])
        t = Trainer(cfg, get_logger(logger_name=f"sc{every}{tag}"), _W2v())
        t.fit(packed_dataset(24), packed_dataset(8),
              str(tmp_path / f"m{every}{tag}"))
    finally:
        ckpt.save_last = orig
    return calls, str(tmp_path / f"m{every}{tag}")


def test_save_cadence_thins_epoch_saves(tmp_path):
    calls1, _ = _fit(tmp_path, 1)
    assert calls1 == [1, 2, 3, 4, 5]  # prior behavior unchanged

    calls2, path2 = _fit(tmp_path, 2)
    # epochs 2 and 4 on cadence, final epoch 5 always
    assert calls2 == [2, 4, 5]
    # the final state is resumable
    assert os.path.exists(os.path.join(path2, "last", "meta.json"))
    meta = json.load(open(os.path.join(path2, "last", "meta.json")))
    assert meta["epoch"] == 5

    calls9, path9 = _fit(tmp_path, 9)
    assert calls9 == [5]  # only the always-save final epoch
