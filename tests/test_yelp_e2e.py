"""Yelp 4-view end-to-end: labeled photos.json + real JPEGs + full UMPR
(review + control + visual nets) through the main.py CLI — fit, checkpoint,
then --test_only reload.  Covers the reference's yelp configuration
(reference config.py:30-31, src/dataset.py:87-119) at photo_size=32 so the
VGG16 path stays CI-sized.
"""

import os
import sys

import numpy as np
import pytest

import main as umpr_main
from tools.make_synthetic_corpus import main as make_corpus


@pytest.fixture(scope="module")
def yelp_dir(tmp_path_factory):
    pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("yelp")
    make_corpus(["--out", str(root), "--style", "yelp", "--photos",
                 "--users", "28", "--items", "6", "--reviews_per_user", "5",
                 "--emb_dim", "16"])
    from umpr_tpu.text.preprocess import process_dataset, YELP_COLS
    process_dataset(str(root / "reviews.json"), "/nonexistent", str(root),
                    0.8, YELP_COLS)
    return root


def _run_main(monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", ["main.py"] + argv)
    umpr_main.main()


@pytest.mark.slow
def test_yelp_four_view_fit_and_test_only(yelp_dir, tmp_path, monkeypatch):
    model_dir = str(tmp_path / "model")
    log_path = str(tmp_path / "log.txt")
    base = ["--data_dir", str(yelp_dir),
            "--word2vec_file", str(yelp_dir / "glove.txt"),
            "--views", "['food','inside','outside','drink']",
            "--photo_size", "32", "--photo_count", "2",
            "--device", "cpu", "--batch_size", "8",
            "--train_epochs", "1", "--eval_every", "4",
            "--gru_size", "16", "--self_atte_size", "8", "--kernel_count", "8",
            "--learning_rate", "0.01", "--min_sent_count", "1",
            "--seed", "3"]

    _run_main(monkeypatch, base + ["--model_path", model_dir,
                                   "--log_path", log_path])
    assert os.path.exists(os.path.join(model_dir, "best", "arrays.npz"))
    # dataset caches were written next to the CSVs (reference main.py:66-73)
    assert os.path.exists(yelp_dir / "dataset_train.cache" / "complete.marker")

    log = open(log_path).read()
    assert "Initial validation mse is" in log
    assert "Test end, test mse is" in log

    # --test_only reload path (reference main.py:88-99)
    _run_main(monkeypatch, base + ["--test_only", "True",
                                   "--model_path", model_dir,
                                   "--log_path", str(tmp_path / "log2.txt")])
    log2 = open(str(tmp_path / "log2.txt")).read()
    assert "Test end, test mse is" in log2

    # the dataset really is multi-view multi-photo: V=4, P=2 slots resolved
    from umpr_tpu.data.dataset import UMPRDataset
    ds = UMPRDataset.load(str(yelp_dir / "dataset_train.cache"))
    assert ds.photo_paths.shape[1:] == (4, 2)
    assert (np.char.str_len(ds.photo_paths.reshape(-1)) > 0).all()
