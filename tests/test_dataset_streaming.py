"""Streaming (chunked, low-RSS) dataset build == full-memory build.

The streaming path (umpr_tpu/data/dataset.py::_build_dataset_streaming)
must produce byte-identical packed arrays to the full path for any chunk
size, including corpora with unicode documents (python-tokenized and
spliced into the flat stream) and rows dropped by every filter."""

import json
import random

import numpy as np
import pandas as pd
import pytest

from umpr_tpu.config import Config
from umpr_tpu.data.dataset import build_dataset
from umpr_tpu.text.vocab import Word2vec


WORDS = ("great sound quality album terrible loved fantastic song guitar "
         "drums vocals melody lyric beat bass mix production classic").split()


from tests.test_native import FakeW2v  # one Word2vec test double


def _make_corpus(tmp_path, n_rows=160, n_users=25, n_items=8):
    rng = random.Random(3)
    rows = []
    for _ in range(n_rows):
        u, it = rng.randrange(n_users), rng.randrange(n_items)
        n_sents = rng.randint(0, 4)
        sents = [" ".join(rng.choices(WORDS, k=rng.randint(3, 12)))
                 for _ in range(n_sents)]
        if rng.random() < 0.1 and sents:  # unicode docs -> python splice path
            sents[0] = "café " + sents[0]
        rows.append({"userID": f"U{u}", "itemID": f"I{it}",
                     "review": ". ".join(sents) + ("." if sents else ""),
                     "rating": float(rng.randint(1, 5)),
                     "user_num": u, "item_num": it})
    csv = tmp_path / "train.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    with open(tmp_path / "photos.json", "w") as f:
        for it in range(n_items - 1):  # last item has no photos -> dropped
            f.write(json.dumps({"business_id": f"I{it}",
                                "photo_id": f"p{it}"}) + "\n")
    return str(csv)


def _cfg(chunk_rows, min_sent=2):
    return Config(argv=["--device", "cpu", "--min_sent_count", str(min_sent),
                        "--build_chunk_rows", str(chunk_rows)])


@pytest.mark.parametrize("chunk_rows", [37, 1000000])
def test_streaming_equals_full_build(tmp_path, chunk_rows):
    pytest.importorskip("umpr_tpu.native")
    from umpr_tpu.native import _load
    if _load() is None:
        pytest.skip("native toolchain unavailable")

    csv = _make_corpus(tmp_path)
    w2v = FakeW2v(WORDS)
    pj, pdir = str(tmp_path / "photos.json"), str(tmp_path / "photos")

    full = build_dataset(csv, pj, pdir, w2v, _cfg(0))
    stream = build_dataset(csv, pj, pdir, w2v, _cfg(chunk_rows))
    assert len(full) == len(stream) > 0
    for field in ("u_tokens", "u_lengths", "u_counts", "i_tokens",
                  "i_lengths", "i_counts", "ui_tokens", "ui_lengths",
                  "ui_counts", "ratings", "photo_paths", "source_rows"):
        np.testing.assert_array_equal(
            getattr(full, field), getattr(stream, field), err_msg=field)


def test_streaming_empty_split_builds_empty_dataset(tmp_path, caplog):
    """Every row filtered out must yield an empty dataset from the STREAMING
    path itself -- not a range(step=0) crash silently re-routed through the
    full-memory fallback."""
    import logging

    pytest.importorskip("umpr_tpu.native")
    from umpr_tpu.native import _load
    if _load() is None:
        pytest.skip("native toolchain unavailable")

    csv = _make_corpus(tmp_path, n_rows=40)
    w2v = FakeW2v(WORDS)
    pj, pdir = str(tmp_path / "photos.json"), str(tmp_path / "photos")

    # min_sent_count beyond any user's history drops every sample
    with caplog.at_level(logging.WARNING, logger="umpr_tpu.data"):
        ds = build_dataset(csv, pj, pdir, w2v, _cfg(17, min_sent=10_000))
    assert len(ds) == 0
    assert ds.u_tokens.shape[0] == 0 and ds.ratings.shape[0] == 0
    assert not any("streaming dataset build failed" in r.getMessage()
                   for r in caplog.records), "fell back to the full build"


def test_streaming_mmap_cache_roundtrip(tmp_path):
    """mmap_dir mode: packed arrays land on disk as .npy memmaps, the dir is
    a complete loadable cache, and contents equal the in-memory build."""
    pytest.importorskip("umpr_tpu.native")
    from umpr_tpu.native import _load
    if _load() is None:
        pytest.skip("native toolchain unavailable")

    csv = _make_corpus(tmp_path)
    w2v = FakeW2v(WORDS)
    pj, pdir = str(tmp_path / "photos.json"), str(tmp_path / "photos")
    cache = str(tmp_path / "train.cache")

    mem = build_dataset(csv, pj, pdir, w2v, _cfg(50))
    mm = build_dataset(csv, pj, pdir, w2v, _cfg(50), mmap_dir=cache)
    assert isinstance(mm.u_tokens, np.memmap)

    import os
    assert os.path.exists(os.path.join(cache, "complete.marker"))
    from umpr_tpu.data.dataset import UMPRDataset
    reloaded = UMPRDataset.load(cache)
    for ds in (mm, reloaded):
        for field in ("u_tokens", "u_lengths", "u_counts", "i_tokens",
                      "i_lengths", "i_counts", "ui_tokens", "ui_lengths",
                      "ui_counts", "ratings", "photo_paths", "source_rows"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ds, field)), getattr(mem, field),
                err_msg=field)


def test_pack_ui_matches_python(tmp_path):
    """fast_pack_ui == _build_ui + _pack_reviews on ragged input with
    keep-longest truncation."""
    from umpr_tpu.native import (_load, fast_pack_ui, flatten_tokenized)
    from umpr_tpu.data.dataset import _build_ui, _pack_reviews
    if _load() is None:
        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(0)
    docs = []
    for _ in range(30):
        docs.append([rng.integers(3, 20, rng.integers(1, 9)).astype(np.int32)
                     for _ in range(rng.integers(0, 7))])
    flat = flatten_tokenized(docs)
    rows = np.arange(len(docs), dtype=np.int64)

    got = fast_pack_ui(flat, rows, max_count=3, max_len=8)
    retain = [True] * len(docs)
    want = _pack_reviews(_build_ui([list(d) for d in docs], retain, 3), 3, 8)
    for g, w, name in zip(got, want, ("tokens", "lengths", "counts")):
        np.testing.assert_array_equal(g, w, err_msg=name)
