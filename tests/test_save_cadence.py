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


def test_async_checkpoint_equals_sync(tmp_path):
    """--async_checkpoint overlaps the device->host transfer + write with
    the step loop via an on-device snapshot; the files it leaves must be
    IDENTICAL to the synchronous writer's (same values at the same save
    points -- the snapshot is taken before the next step donates the live
    buffers)."""
    import jax
    from umpr_tpu.train import checkpoint as ckpt

    outs = {}
    for mode in ("True", "False"):
        cfg = Config(argv=[
            "--device", "cpu", "--multi_gpu", "False",
            "--review_net_only", "True", "--batch_size", "8",
            "--train_epochs", "3", "--eval_every", "2",
            "--learning_rate", "0.01",
            "--min_sent_count", "1", "--seed", "2",
            "--async_checkpoint", mode])
        t = Trainer(cfg, get_logger(logger_name=f"async{mode}"), _W2v())
        path = str(tmp_path / f"m_async{mode}")
        t.fit(packed_dataset(24), packed_dataset(8), path)
        assert (t._saver is not None) == (mode == "True")
        like_best = t._checkpoint_params()
        outs[mode] = (ckpt.restore_best(path, like_best),
                      ckpt.restore_last(path, t.trainable, t.opt_state)[:2],
                      json.load(open(os.path.join(path, "last", "meta.json"))))
    best_a, last_a, meta_a = outs["True"]
    best_s, last_s, meta_s = outs["False"]
    assert meta_a == meta_s
    for a, b in zip(jax.tree.leaves((best_a, last_a)),
                    jax.tree.leaves((best_s, last_s))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
