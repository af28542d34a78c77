"""AOT export (umpr_tpu/export.py): serialize -> deserialize -> predict
parity with the live model, weights carried in the sidecar."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from umpr_tpu.models.umpr import ModelDims, init_umpr, umpr_forward
from umpr_tpu.export import (batch_spec, export_predict, save_artifact,
                             load_predict)
from tests.ref_oracle import random_batch


class Cfg:
    batch_size = 8
    max_sent_count = 5
    max_sent_length = 10
    max_ui_sent_count = 2
    photo_count = 1


def _roundtrip(tmp_path, dims, batch):
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((40, 16)).astype(np.float32)
    params = init_umpr(jax.random.PRNGKey(4), dims, emb)

    spec = batch_spec(Cfg, dims)
    assert set(spec) == set(batch), (set(spec) ^ set(batch))
    for k, v in batch.items():
        assert spec[k].shape == v.shape and spec[k].dtype == v.dtype, k

    path = str(tmp_path / "model.jexp")
    save_artifact(path, export_predict(params, dims, spec), params)
    predict, loaded = load_predict(path)

    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, loaded)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    got = np.asarray(predict(loaded, dev_batch))
    want = np.asarray(umpr_forward(params, dev_batch, dims, train=False)[0])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_export_roundtrip_review_only(tmp_path):
    dims = ModelDims(review_net_only=True)
    batch = random_batch(np.random.default_rng(1), B=8, S=5, L=10, S_ui=2)
    _roundtrip(tmp_path, dims, batch)


@pytest.mark.slow
def test_export_roundtrip_full_model(tmp_path):
    dims = ModelDims(review_net_only=False, view_size=1, photo_size=32)
    batch = random_batch(np.random.default_rng(2), B=8, S=5, L=10, S_ui=2,
                         with_photos=True, img=32)
    _roundtrip(tmp_path, dims, batch)


def test_export_cross_platform_lowering(tmp_path):
    """--platforms tpu,cpu: the artifact built on a CPU host must carry a
    TPU lowering too (the documented deploy-from-build-host flow), while
    still deserializing and scoring correctly on the CPU backend."""
    dims = ModelDims(review_net_only=True)
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((40, 16)).astype(np.float32)
    params = init_umpr(jax.random.PRNGKey(4), dims, emb)
    batch = random_batch(np.random.default_rng(1), B=8, S=5, L=10, S_ui=2)

    spec = batch_spec(Cfg, dims)
    path = str(tmp_path / "xplat.jexp")
    save_artifact(path, export_predict(params, dims, spec,
                                       platforms=("cpu", "tpu")), params)

    from jax import export as jex
    with open(path, "rb") as f:
        exp = jex.deserialize(f.read())
    assert set(exp.platforms) == {"cpu", "tpu"}

    predict, loaded = load_predict(path)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    got = np.asarray(predict(loaded, dev_batch))
    want = np.asarray(umpr_forward(params, dev_batch, dims, train=False)[0])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_export_cli_end_to_end(tmp_path):
    """umpr_tpu.export CLI: checkpoint -> artifact + sidecar + metadata;
    load_predict scores a loader-shaped batch."""
    import json
    import os
    from umpr_tpu import export as exp_mod
    from umpr_tpu.train import checkpoint as ckpt

    rng = np.random.default_rng(0)
    emb_rows = 19
    glove = tmp_path / "glove.txt"
    with open(glove, "w") as f:
        for i in range(emb_rows - 3):  # vocab adds PAD/UNK/NUM rows
            f.write(f"w{i} " + " ".join(
                f"{x:.4f}" for x in rng.standard_normal(16)) + "\n")

    from umpr_tpu.text.vocab import Word2vec
    w2v = Word2vec(str(glove))
    dims = ModelDims(review_net_only=True)
    params = init_umpr(jax.random.PRNGKey(2), dims, w2v.embedding)
    model_dir = str(tmp_path / "m")
    ckpt.save_best(model_dir, params)

    out = str(tmp_path / "model.jexp")
    exp_mod.main(["--output", out, "--model_path", model_dir,
                  "--word2vec_file", str(glove),
                  "--device", "cpu", "--review_net_only", "True",
                  "--batch_size", "8", "--max_sent_count", "5",
                  "--max_sent_length", "10", "--max_ui_sent_count", "2"])
    assert os.path.exists(out) and os.path.exists(out + ".params.npz")
    meta = json.load(open(out + ".json"))
    assert meta["batch_size"] == 8 and meta["review_net_only"] is True

    predict, loaded = load_predict(out)
    batch = random_batch(np.random.default_rng(5), B=8, S=5, L=10, S_ui=2,
                         vocab=emb_rows)
    preds = np.asarray(predict(loaded, {k: jnp.asarray(v) for k, v in batch.items()}))
    assert preds.shape == (8,) and np.isfinite(preds).all()
