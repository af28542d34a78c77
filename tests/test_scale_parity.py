"""CI pin for tools/scale_parity.py — the matched-conditions scale-MSE
driver (VERDICT r2 #2).  Runs BOTH sides of the actual CLI on a small
corpus and asserts the full protocol agrees: per-epoch valid MSE, best-
epoch selection, and final test MSE on the best model.  The full-scale
result (64,706 reviews x 20 epochs) is recorded in PARITY.md."""

import json
import os
import random
import subprocess
import sys

import numpy as np
import pytest

from umpr_tpu.text.preprocess import AMAZON_COLS, process_dataset

pytest.importorskip("torch")

WORDS = ("great sound quality album terrible loved fantastic song guitar "
         "drums vocals melody lyric beat bass mix production classic").split()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("scalecorpus")
    rng = random.Random(11)
    with open(root / "reviews.json", "w") as f:
        for u in range(60):
            for it in rng.sample(range(12), 6):
                sents = [" ".join(rng.choices(WORDS, k=rng.randint(6, 12)))
                         for _ in range(rng.randint(2, 4))]
                f.write(repr({"reviewerID": f"U{u}", "asin": f"I{it}",
                              "reviewText": ". ".join(sents) + ".",
                              "overall": float(rng.randint(1, 5))}) + "\n")
    with open(root / "meta.json", "w") as f:
        for it in range(12):
            f.write(repr({"asin": f"I{it}", "imUrl": f"http://x/{it}.jpg"}) + "\n")
    process_dataset(str(root / "reviews.json"), str(root / "meta.json"),
                    str(root), 0.8, AMAZON_COLS)
    nprng = np.random.default_rng(3)
    with open(root / "glove.txt", "w") as f:
        for w in WORDS:
            f.write(w + " " + " ".join(
                f"{x:.4f}" for x in nprng.standard_normal(16)) + "\n")
    return root


def run_side(side, corpus, out, extra=()):
    cmd = [sys.executable, "tools/scale_parity.py",
           "--data_dir", str(corpus), "--glove", str(corpus / "glove.txt"),
           "--side", side, "--out", str(out), "--epochs", "2",
           "--batch", "16", "--seed", "2", "--min_sent_count", "1",
           *extra]
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, f"{side} side failed:\n{r.stdout}\n{r.stderr}"
    with open(out) as f:
        return json.load(f)


@pytest.mark.slow
def test_scale_parity_protocol_matches(corpus, tmp_path):
    ours = run_side("ours", corpus, tmp_path / "ours.json", extra=("--cpu",))
    ref = run_side("ref", corpus, tmp_path / "ref.json")
    assert ours["best_epoch"] == ref["best_epoch"]
    np.testing.assert_allclose(ours["valid_mse"], ref["valid_mse"], rtol=2e-3)
    assert abs(ours["test_mse"] - ref["test_mse"]) / ref["test_mse"] < 2e-3
