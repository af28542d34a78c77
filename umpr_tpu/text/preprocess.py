"""Offline corpus preprocessor: raw Amazon/Yelp dumps -> train/valid/test CSVs.

Bit-for-bit reproduction of the reference preprocessor (data/data_process.py):
same column mapping, same review cleaning (lowercase, punctuation->space
keeping '.', WordPunctTokenizer, stop-word removal), same seeded 80/10/10
split (random_state 3 then 4, data_process.py:52-53), same CSV layout, and
the same photos.json manifest extraction from Amazon metadata
(data_process.py:67-84).

The only intentional deviation: raw JSON lines are parsed with
``ast.literal_eval`` (falling back to ``json.loads``) instead of bare
``eval`` (data_process.py:24) — identical results on the python-literal
format of the Amazon dumps, without arbitrary code execution.
"""

from __future__ import annotations

import ast
import argparse
import gzip
import json
import os
import time
import uuid

import pandas as pd
from sklearn.model_selection import train_test_split
from nltk.tokenize import WordPunctTokenizer

from umpr_tpu.text.stoplists import STOP_WORDS, PUNCTUATIONS

AMAZON_COLS = ["reviewerID", "asin", "reviewText", "overall"]
YELP_COLS = ["user_id", "business_id", "text", "stars"]


def _open_maybe_gz(path):
    if path.endswith(".gz"):
        return gzip.open(path, "rt", encoding="UTF-8")
    return open(path, "r", encoding="UTF-8")


def _parse_line(line):
    """Amazon dumps are python-literal dicts; Yelp dumps are JSON."""
    try:
        return json.loads(line)
    except (json.JSONDecodeError, ValueError):
        return ast.literal_eval(line)


def clean_review(review, punctuations=None, stop_words=STOP_WORDS):
    """Lowercase, replace punctuation (except '.') with spaces, tokenize with
    WordPunctTokenizer, drop stop words (reference: data_process.py:40-47)."""
    if punctuations is None:
        punctuations = PUNCTUATIONS - {"."}
    review = review.lower()
    for p in punctuations:
        review = review.replace(p, " ")
    words = WordPunctTokenizer().tokenize(review)
    return " ".join(w for w in words if w not in stop_words)


def process_dataset(reviews_path, meta_path, save_dir, train_rate, select_cols):
    os.makedirs(save_dir, exist_ok=True)

    print(f"#### Read {reviews_path}")
    data = []
    with _open_maybe_gz(reviews_path) as f:
        for line in f:
            item = _parse_line(line)
            data.append([item[c] for c in select_cols])
    df = pd.DataFrame(data, columns=["userID", "itemID", "review", "rating"])

    # Dense integer ids per user/item, identical to pandas ngroup in the
    # reference (data_process.py:31-32).
    df["user_num"] = df.groupby(df["userID"]).ngroup()
    df["item_num"] = df.groupby(df["itemID"]).ngroup()

    # Erase null reviews BEFORE cleaning (reference order: data_process.py:49-50).
    df = df.drop(df[[not isinstance(x, str) or len(x) == 0 for x in df["review"]]].index)
    punct = PUNCTUATIONS - {"."}
    df["review"] = df["review"].apply(lambda r: clean_review(r, punct))

    # Seeded two-stage split: the seeds ARE the dataset definition
    # (reference: data_process.py:52-53).
    train, valid = train_test_split(df, test_size=1 - train_rate, random_state=3)
    valid, test = train_test_split(valid, test_size=0.5, random_state=4)
    train.to_csv(os.path.join(save_dir, "train.csv"), index=False)
    valid.to_csv(os.path.join(save_dir, "valid.csv"), index=False)
    test.to_csv(os.path.join(save_dir, "test.csv"), index=False)
    print(
        f'#### Saved dataset({len(df)} reviews, {len(df["user_num"].drop_duplicates())} users, '
        f'{len(df["item_num"].drop_duplicates())} items): '
        f"train.csv({len(train)}), valid.csv({len(valid)}), test.csv({len(test)})"
    )

    # Extract the photo manifest from Amazon metadata (business_id/photo_id/
    # imUrl rows with fresh uuid photo names, reference: data_process.py:67-84).
    try:
        print(f"#### Read {meta_path}")
        photos = []
        items_set = set(df["itemID"])
        with _open_maybe_gz(meta_path) as f:
            for line in f:
                item = _parse_line(line)
                if "imUrl" in item and item.get("asin") in items_set:
                    photos.append([item["asin"], uuid.uuid4().hex[:16], item["imUrl"]])
        photo_df = pd.DataFrame(photos, columns=["business_id", "photo_id", "imUrl"])
        photo_df.to_json(os.path.join(save_dir, "photos.json"), orient="records", lines=True)
        print(f"#### Saved photos.json({len(photos)} pictures).")
    except Exception:
        print(f"#### Failed to read {meta_path} or its content is damaged.")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_type", dest="data_type", default="amazon")
    parser.add_argument("--data_path", dest="data_path", required=True)
    parser.add_argument("--meta_path", dest="meta_path", default="")
    parser.add_argument("--save_dir", dest="save_dir", default=None)
    parser.add_argument("--train_rate", dest="train_rate", default=0.8)
    args = parser.parse_args(argv)

    col_name = YELP_COLS if args.data_type == "yelp" else AMAZON_COLS
    if args.save_dir is None:
        args.save_dir = os.path.dirname(args.data_path) if "/" in args.data_path else "./"
    os.makedirs(args.save_dir, exist_ok=True)

    start = time.perf_counter()
    process_dataset(args.data_path, args.meta_path, args.save_dir, float(args.train_rate), col_name)
    print(f"## preprocess: Data loading complete! Time used {time.perf_counter() - start:.0f} seconds.")


if __name__ == "__main__":
    main()
