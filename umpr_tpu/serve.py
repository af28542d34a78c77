"""Batch serving: rating predictions from a trained checkpoint.

The reference only exposes test() (MSE over a labeled split, main.py:88-99);
production deployment needs predictions for (user, item) pairs.  This module
adds a jitted no-grad predict path (the composite XLA attention -- measured
fastest for serving too, see umpr_tpu/ops/attention.py) and a CLI:

    python -m umpr_tpu.serve --data_dir data/music \
        --word2vec_file embedding/glove.6B.50d.txt \
        --model_path model/<run-dir> --input data/music/test.csv \
        --output predictions.csv

The input CSV has the training-CSV schema; a `rating` column is optional
(ignored for prediction; filled with 0 when absent).  Output columns:
userID, itemID, prediction.  Rows dropped by the reference's sample filters
(insufficient history / missing photos, see umpr_tpu/data/dataset.py) are
emitted with an empty prediction -- the reference model cannot score them
either.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from umpr_tpu.config import Config
from umpr_tpu.data.dataset import build_dataset
from umpr_tpu.data.loader import BatchLoader, prefetch_to_device
from umpr_tpu.models.umpr import ModelDims, init_umpr, umpr_forward
from umpr_tpu.parallel.mesh import make_mesh, replicated, batch_sharded
from umpr_tpu.train import checkpoint as ckpt
from umpr_tpu.text.vocab import Word2vec


class Predictor:
    def __init__(self, config, word2vec, model_path):
        self.config = config
        self.dims = ModelDims.from_config(config)
        try:
            devices = jax.devices(config.device) if config.device else jax.devices()
        except RuntimeError:
            devices = jax.devices()
        if not config.multi_gpu:
            devices = devices[:1]
        self.mesh = make_mesh(devices, shape=config.mesh_shape or None)
        n_dev = int(np.prod(self.mesh.devices.shape))
        assert config.batch_size % n_dev == 0, (
            f"batch_size {config.batch_size} must divide over {n_dev} devices")
        self.rep, self.dp = replicated(self.mesh), batch_sharded(self.mesh)

        like = init_umpr(jax.random.PRNGKey(0), self.dims, word2vec.embedding)
        params = ckpt.restore_best(model_path, like)
        self.params = jax.device_put(params, self.rep)

        dims = self.dims

        @jax.jit
        def _predict(params, batch):
            pred, _, _ = umpr_forward(params, batch, dims, train=False)
            return pred

        self._predict = _predict

    def predict_dataset(self, dataset):
        """-> (predictions (N,), source_rows (N,)) over retained samples."""
        cfg = self.config
        loader = BatchLoader(dataset, cfg.batch_size,
                             ignore_photos=cfg.review_net_only,
                             resize=(cfg.photo_size, cfg.photo_size),
                             workers=cfg.data_workers)
        preds = []
        for batch in prefetch_to_device(iter(loader), self.dp,
                                        depth=self.config.prefetch_depth):
            mask = np.asarray(batch["sample_mask"]) > 0
            preds.append(np.asarray(self._predict(self.params, batch))[mask])
        out = np.concatenate(preds) if preds else np.zeros(0, np.float32)
        return out, np.asarray(dataset.source_rows)


def main(argv=None):
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--input", required=True, help="CSV of pairs to score")
    parser.add_argument("--output", default="predictions.csv")
    args, rest = parser.parse_known_args(argv)
    config = Config(rest)
    assert config.model_path, "--model_path is required for serving"
    if config.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    df = pd.read_csv(args.input)
    csv_path = args.input
    if "rating" not in df.columns:
        df = df.copy()
        df["rating"] = 0.0
        csv_path = args.input + ".scored.tmp.csv"
        df.to_csv(csv_path, index=False)

    w2v = Word2vec(config.word2vec_file)
    photo_json = os.path.join(config.data_dir, "photos.json")
    photo_dir = os.path.join(config.data_dir, "photos")
    ds = build_dataset(csv_path, photo_json, photo_dir, w2v, config)
    if csv_path != args.input:
        os.remove(csv_path)

    predictor = Predictor(config, w2v, config.model_path)
    preds, rows = predictor.predict_dataset(ds)

    out = df[["userID", "itemID"]].copy()
    out["prediction"] = np.nan
    out.loc[out.index[rows], "prediction"] = preds
    out.to_csv(args.output, index=False)
    print(f"Wrote {len(preds)} predictions ({len(out) - len(preds)} rows "
          f"unscorable by the model's sample filters) to {args.output}")


if __name__ == "__main__":
    main()
