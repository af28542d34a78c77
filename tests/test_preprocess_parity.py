"""Byte-for-byte preprocessor parity vs the reference data_process.py on a
synthetic Amazon-style dump (the CSV splits ARE the dataset definition --
seeds 3/4 at reference data_process.py:52-53)."""

import filecmp
import os
import random
import subprocess
import sys

import pytest

from umpr_tpu.text.preprocess import process_dataset, AMAZON_COLS

REF = "/root/reference/data/data_process.py"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_csvs_byte_identical_to_reference(tmp_path):
    rng = random.Random(7)
    words = ("great sound quality album terrible loved unicodeé "
             "fantastic song guitar drums vocals melody beat").split()
    raw = tmp_path / "reviews.json"
    with open(raw, "w") as f:
        for u in range(12):
            for it in rng.sample(range(6), 4):
                sents = [" ".join(rng.choices(words, k=rng.randint(5, 12)))
                         for _ in range(rng.randint(1, 4))]
                f.write(repr({"reviewerID": f"U{u}", "asin": f"I{it}",
                              "reviewText": ". ".join(sents) + ".",
                              "overall": float(rng.randint(1, 5))}) + "\n")
        # quirk rows the reference drops (data_process.py:49)
        f.write(repr({"reviewerID": "U0", "asin": "I0", "reviewText": "",
                      "overall": 3.0}) + "\n")
        f.write(repr({"reviewerID": "U1", "asin": "I1", "reviewText": None,
                      "overall": 2.0}) + "\n")

    ours = tmp_path / "ours"
    refs = tmp_path / "refs"
    process_dataset(str(raw), "/nonexistent", str(ours), 0.8, AMAZON_COLS)
    subprocess.run(
        [sys.executable, "data_process.py", "--data_path", str(raw),
         "--meta_path", "/nonexistent", "--save_dir", str(refs),
         "--train_rate", "0.8"],
        cwd="/root/reference/data", check=True, capture_output=True)

    for split in ("train", "valid", "test"):
        a, b = ours / f"{split}.csv", refs / f"{split}.csv"
        assert filecmp.cmp(a, b, shallow=False), f"{split}.csv differs"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_gzipped_dump_byte_identical_to_reference(tmp_path):
    """The real Amazon dumps ship as .json.gz (reference defaults at
    data_process.py:92-93 and its gzip branch at :18-19, which evals BYTES
    lines -- utf-8 by PEP 3120).  Both preprocessors must parse the gz path
    to identical CSVs, including a non-ASCII token."""
    import gzip

    rng = random.Random(13)
    words = ("classic guitar solo énergie mellow harsh tempo groove "
             "chorus bridge").split()
    raw = tmp_path / "reviews.json.gz"
    with gzip.open(raw, "wt", encoding="utf-8") as f:
        for u in range(10):
            for it in rng.sample(range(5), 3):
                sents = [" ".join(rng.choices(words, k=rng.randint(5, 10)))
                         for _ in range(rng.randint(1, 3))]
                f.write(repr({"reviewerID": f"U{u}", "asin": f"I{it}",
                              "reviewText": ". ".join(sents) + ".",
                              "overall": float(rng.randint(1, 5))}) + "\n")

    ours = tmp_path / "ours"
    refs = tmp_path / "refs"
    process_dataset(str(raw), "/nonexistent", str(ours), 0.8, AMAZON_COLS)
    subprocess.run(
        [sys.executable, "data_process.py", "--data_path", str(raw),
         "--meta_path", "/nonexistent", "--save_dir", str(refs),
         "--train_rate", "0.8"],
        cwd="/root/reference/data", check=True, capture_output=True)

    for split in ("train", "valid", "test"):
        a, b = ours / f"{split}.csv", refs / f"{split}.csv"
        assert filecmp.cmp(a, b, shallow=False), f"{split}.csv differs"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_yelp_csvs_byte_identical_to_reference(tmp_path):
    """Yelp column mapping (user_id/business_id/text/stars, JSON lines —
    reference data_process.py:99-100) through both preprocessors."""
    import json

    from umpr_tpu.text.preprocess import YELP_COLS

    rng = random.Random(11)
    words = ("pizza delicious service slow ambiance cozy staff friendly "
             "overpriced portions huge dessert amazing wait").split()
    raw = tmp_path / "yelp_reviews.json"
    with open(raw, "w") as f:
        for u in range(10):
            for b in rng.sample(range(5), 3):
                sents = [" ".join(rng.choices(words, k=rng.randint(5, 12)))
                         for _ in range(rng.randint(1, 4))]
                # json.dumps keeps the line parseable by the reference's bare
                # eval() too (no true/false/null tokens in these rows)
                f.write(json.dumps({"user_id": f"u{u}", "business_id": f"b{b}",
                                    "text": ". ".join(sents) + ".",
                                    "stars": rng.randint(1, 5),
                                    "useful": rng.randint(0, 9)}) + "\n")
        f.write(json.dumps({"user_id": "u0", "business_id": "b0",
                            "text": "", "stars": 3, "useful": 0}) + "\n")

    ours = tmp_path / "ours"
    refs = tmp_path / "refs"
    process_dataset(str(raw), "/nonexistent", str(ours), 0.8, YELP_COLS)
    subprocess.run(
        [sys.executable, "data_process.py", "--data_type", "yelp",
         "--data_path", str(raw), "--meta_path", "/nonexistent",
         "--save_dir", str(refs), "--train_rate", "0.8"],
        cwd="/root/reference/data", check=True, capture_output=True)

    for split in ("train", "valid", "test"):
        a, b = ours / f"{split}.csv", refs / f"{split}.csv"
        assert filecmp.cmp(a, b, shallow=False), f"{split}.csv differs"
