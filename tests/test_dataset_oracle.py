"""Sample-selection parity vs the ACTUAL reference Dataset class.

The order-dependent retain_idx filters in reference src/dataset.py:11-119
define the effective train/valid/test sets and therefore MSE; this test
instantiates the real reference ``Dataset`` on the same CSVs + photos.json
and asserts exact equality of retained-sample sets, token ids, lengths,
photo paths and ratings against ``umpr_tpu.data.build_dataset`` — for both
the amazon single-view path and a yelp labeled multi-view manifest (with
items deliberately missing views, so every filter actually fires).
"""

import json
import os
import random
import sys

import numpy as np
import pytest

from umpr_tpu.config import Config
from umpr_tpu.data.dataset import build_dataset
from umpr_tpu.text.preprocess import process_dataset, AMAZON_COLS, YELP_COLS
from umpr_tpu.text.vocab import Word2vec

REF_SRC = "/root/reference/src"

WORDS = ("great sound quality album terrible loved fantastic song guitar "
         "drums vocals melody lyric beat bass mix production classic modern "
         "pasta pizza salad decor patio cozy waiter service wine beer").split()

YELP_VIEWS = ["food", "inside", "outside", "drink"]


def _ref_dataset(csv_path, photo_json, photo_dir, w2v, cfg):
    if not os.path.exists(REF_SRC):
        pytest.skip("reference not mounted")
    sys.path.insert(0, REF_SRC)
    try:
        import dataset as ref_dataset_mod
    finally:
        sys.path.remove(REF_SRC)
    return ref_dataset_mod.Dataset(csv_path, photo_json, photo_dir, w2v, cfg)


def _write_corpus(root, style, n_users=25, n_items=10, per_user=5, seed=11):
    rng = random.Random(seed)
    raw = root / "reviews.json"
    with open(raw, "w") as f:
        for u in range(n_users):
            for it in rng.sample(range(n_items), per_user):
                n_sents = rng.randint(1, 5)  # some 1-sentence rows -> drops
                sents = [" ".join(rng.choices(WORDS, k=rng.randint(3, 14)))
                         for _ in range(n_sents)]  # short sentences -> drops
                text = ". ".join(sents) + "."
                stars = float(rng.randint(1, 5))
                if style == "amazon":
                    f.write(repr({"reviewerID": f"U{u}", "asin": f"I{it}",
                                  "reviewText": text, "overall": stars}) + "\n")
                else:
                    f.write(json.dumps({"user_id": f"U{u}",
                                        "business_id": f"I{it}",
                                        "text": text, "stars": stars}) + "\n")
    meta = root / "meta.json"
    if style == "amazon":
        with open(meta, "w") as f:
            for it in range(n_items):
                f.write(repr({"asin": f"I{it}", "imUrl": f"http://x/{it}.jpg"}) + "\n")
        process_dataset(str(raw), str(meta), str(root), 0.8, AMAZON_COLS)
    else:
        process_dataset(str(raw), "/nonexistent", str(root), 0.8, YELP_COLS)
        # labeled manifest with deliberate gaps: items 0-2 miss one view
        # (sample dropped); other items get 1 or 2 photos per view (1 <
        # photo_count=2 makes the 'unknown' padding fire)
        def n_photos(it, vi):
            if it < 3:
                return 0 if vi == it else 2
            return 1 + (it + vi) % 2

        with open(root / "photos.json", "w") as f:
            for it in range(n_items):
                for vi, v in enumerate(YELP_VIEWS):
                    for k in range(n_photos(it, vi)):
                        f.write(json.dumps({"business_id": f"I{it}",
                                            "photo_id": f"I{it}_{v}_{k}",
                                            "label": v}) + "\n")

    nprng = np.random.default_rng(0)
    with open(root / "glove.txt", "w") as f:
        for w in sorted(set(WORDS)):
            f.write(w + " " + " ".join(
                f"{x:.4f}" for x in nprng.standard_normal(16)) + "\n")


def _ragged_from_packed(tok, lens, cnt):
    return [[tok[i, s, :int(lens[i, s])].tolist() for s in range(int(cnt[i]))]
            for i in range(len(cnt))]


def _assert_equal(ours, ref):
    ref_u, ref_i, ref_ui, ref_photos, ref_ratings = ref.data
    assert len(ours) == len(ref) > 0

    for name, packed, ref_side in (
            ("user", (ours.u_tokens, ours.u_lengths, ours.u_counts), ref_u),
            ("item", (ours.i_tokens, ours.i_lengths, ours.i_counts), ref_i),
            ("ui", (ours.ui_tokens, ours.ui_lengths, ours.ui_counts), ref_ui)):
        got = _ragged_from_packed(*packed)
        want = [[list(map(int, s)) for s in sample] for sample in ref_side]
        assert got == want, f"{name} reviews differ"

    # photo paths: ref pads missing slots with 'unknown', ours with ''
    want_photos = [[[("" if p == "unknown" else p) for p in view]
                    for view in sample] for sample in ref_photos]
    assert ours.photo_paths.tolist() == want_photos

    np.testing.assert_array_equal(
        ours.ratings, np.asarray(ref_ratings, np.float32))

    # retained-row sets: recompute which original rows the reference kept
    kept = np.flatnonzero(np.asarray(ref.retain_idx, bool))
    np.testing.assert_array_equal(ours.source_rows, kept)


@pytest.mark.parametrize("split", ["train", "valid"])
def test_amazon_sample_selection_matches_reference(tmp_path, split):
    # the small valid split has sparse within-split histories, so it runs
    # with min_sent_count=1 to keep a non-empty retained set
    _write_corpus(tmp_path, "amazon", n_users=60)
    cfg = Config(argv=["--device", "cpu", "--min_sent_count",
                       "3" if split == "train" else "1"])
    w2v = Word2vec(str(tmp_path / "glove.txt"))
    csv = str(tmp_path / f"{split}.csv")
    pj, pd_ = str(tmp_path / "photos.json"), str(tmp_path / "photos")
    ours = build_dataset(csv, pj, pd_, w2v, cfg)
    ref = _ref_dataset(csv, pj, pd_, w2v, cfg)
    _assert_equal(ours, ref)


def test_yelp_multiview_sample_selection_matches_reference(tmp_path):
    _write_corpus(tmp_path, "yelp")
    cfg = Config(argv=[
        "--device", "cpu", "--min_sent_count", "3", "--photo_count", "2",
        "--views", "['food','inside','outside','drink']"])
    w2v = Word2vec(str(tmp_path / "glove.txt"))
    csv = str(tmp_path / "train.csv")
    pj, pd_ = str(tmp_path / "photos.json"), str(tmp_path / "photos")
    ours = build_dataset(csv, pj, pd_, w2v, cfg)
    ref = _ref_dataset(csv, pj, pd_, w2v, cfg)
    _assert_equal(ours, ref)
    # the view-gap filter actually dropped something, and 'unknown' padding
    # actually occurred (otherwise this test proves nothing)
    assert len(ref) < int(np.sum([len(x) > 0 for x in
                                  __import__("pandas").read_csv(csv)["review"]]))
    assert (ours.photo_paths == "").any()


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_fuzzed_corpora_and_configs_match_reference(tmp_path, seed):
    """Property sweep: random corpus shapes x random truncation configs must
    keep exact sample-selection parity (the retain_idx filter ORDER and the
    keep-longest truncations are where drift would hide)."""
    rng = random.Random(seed)
    _write_corpus(tmp_path, "amazon", n_users=rng.randint(25, 70),
                  n_items=rng.randint(6, 15), per_user=rng.randint(3, 5),
                  seed=seed)
    cfg = Config(argv=[
        "--device", "cpu",
        "--min_sent_count", str(rng.randint(1, 3)),
        "--max_sent_count", str(rng.choice([4, 8, 20])),
        "--max_ui_sent_count", str(rng.choice([1, 2, 5])),
        "--max_sent_length", str(rng.choice([6, 12, 20]))])
    w2v = Word2vec(str(tmp_path / "glove.txt"))
    csv = str(tmp_path / "train.csv")
    pj, pd_ = str(tmp_path / "photos.json"), str(tmp_path / "photos")
    ours = build_dataset(csv, pj, pd_, w2v, cfg)
    ref = _ref_dataset(csv, pj, pd_, w2v, cfg)
    _assert_equal(ours, ref)


def test_document_level_review_matches_reference(tmp_path):
    """review_level='review': whole review as one sentence (reference
    dataset.py:24)."""
    _write_corpus(tmp_path, "amazon")
    cfg = Config(argv=["--device", "cpu", "--min_sent_count", "1",
                       "--review_level", "review"])
    w2v = Word2vec(str(tmp_path / "glove.txt"))
    csv = str(tmp_path / "train.csv")
    pj, pd_ = str(tmp_path / "photos.json"), str(tmp_path / "photos")
    ours = build_dataset(csv, pj, pd_, w2v, cfg)
    ref = _ref_dataset(csv, pj, pd_, w2v, cfg)
    _assert_equal(ours, ref)


@pytest.mark.skipif(not os.environ.get("UMPR_SOAK"),
                    reason="extended soak: set UMPR_SOAK=<n_seeds> to run")
def test_soak_extended_sample_selection(tmp_path):
    """Opt-in extended sweep (UMPR_SOAK=<n_seeds>): random corpus shapes x
    truncation configs x amazon/yelp styles x multi-view photo counts, every
    seed asserted EXACT against the reference Dataset.  One-off runs of 30
    and 150 seeds are recorded in PARITY.md; this keeps the harness in the
    repo so future changes can re-run it cheaply (~2-4 s per seed)."""
    n_seeds = int(os.environ["UMPR_SOAK"])
    for seed in range(2000, 2000 + n_seeds):
        rng = random.Random(seed)
        root = tmp_path / str(seed)
        root.mkdir()
        style = "yelp" if seed % 5 == 0 else "amazon"
        n_items = rng.randint(5, 18)
        _write_corpus(root, style, n_users=rng.randint(20, 80),
                      n_items=n_items,
                      per_user=min(rng.randint(3, 6), n_items), seed=seed)
        argv = ["--device", "cpu",
                "--min_sent_count", str(rng.randint(1, 3)),
                "--max_sent_count", str(rng.choice([4, 8, 20])),
                "--max_ui_sent_count", str(rng.choice([1, 2, 5])),
                "--max_sent_length", str(rng.choice([6, 12, 20]))]
        if style == "yelp":
            argv += ["--views", "['food','inside','outside','drink']",
                     "--photo_count", str(rng.choice([1, 2, 3]))]
        cfg = Config(argv=argv)
        w2v = Word2vec(str(root / "glove.txt"))
        csv = str(root / "train.csv")
        pj, pd_ = str(root / "photos.json"), str(root / "photos")
        ours = build_dataset(csv, pj, pd_, w2v, cfg)
        ref = _ref_dataset(csv, pj, pd_, w2v, cfg)
        try:
            _assert_equal(ours, ref)
        except AssertionError as e:
            raise AssertionError(f"seed {seed} ({style}): {e}") from e
