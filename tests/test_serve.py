"""Serving path: Predictor over a trained checkpoint; unscorable rows."""

import numpy as np
import jax

from umpr_tpu.config import Config
from umpr_tpu.models.umpr import ModelDims, init_umpr
from umpr_tpu.train import checkpoint as ckpt
from umpr_tpu.serve import Predictor
from tests.test_checkpoint_loader import small_dataset


class FakeW2v:
    def __init__(self, emb):
        self.embedding = emb


def test_predictor_roundtrip(tmp_path):
    cfg = Config(argv=["--device", "cpu", "--review_net_only", "True",
                       "--batch_size", "8"])  # divisible over the 8 CPU devices
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((25, 8)).astype(np.float32)
    dims = ModelDims.from_config(cfg)
    params = init_umpr(jax.random.PRNGKey(2), dims, emb)
    root = str(tmp_path / "m")
    ckpt.save_best(root, params)

    ds = small_dataset(n=10)
    predictor = Predictor(cfg, FakeW2v(emb), root)
    preds, rows = predictor.predict_dataset(ds)
    assert preds.shape == (10,) and np.isfinite(preds).all()
    assert (preds >= 0).all()  # ReLU head
    np.testing.assert_array_equal(rows, np.arange(10))

    # deterministic across calls
    preds2, _ = predictor.predict_dataset(ds)
    np.testing.assert_array_equal(preds, preds2)
