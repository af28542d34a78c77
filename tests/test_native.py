"""Native C++ tokenizer: byte-exact equivalence with the python path,
including unicode fallbacks, plus a speed sanity check."""

import time

import numpy as np
import pytest

from umpr_tpu.text.vocab import Word2vec


class FakeW2v(Word2vec):
    def __init__(self, words):
        self.vocab = [self.PAD, self.UNK, self.NUM] + list(words)
        self.word2index = {w: i for i, w in enumerate(self.vocab)}
        self.embedding = np.zeros((len(self.vocab), 4), np.float32)
        self.word_dim = 4


WORDS = ("great sound quality album terrible loved fantastic song guitar "
         "drums vocals melody lyric beat bass mix production classic modern "
         "other words here too").split()

DOCS = [
    "great sound quality album loved melody. terrible mix production bass guitar drums",
    "fantastic song guitar drums vocals melody",
    "short one. also small. loved fantastic song guitar drums vocals again",
    ". . leading dots. sound quality album loved beat bass mix .",
    "",
    "numbers 123 456 here 89 count loved sound",
    "unknown tokens xyzzy plugh foobar quux sound melody",
    "tab\tseparated  and   multi spaced sound quality loved album",
    "café unicode résumé doc sound quality loved album extra",  # -> python path
    "digits ²³ weird sound quality loved album extra",              # unicode digits
    # ASCII control separators \x1c-\x1f: str.split() treats them as
    # whitespace; the doc stays all-ASCII so it exercises the native path
    "control\x1dchars\x1c here \x1e sound quality loved album extra\x1f end",
]


def normalize(result):
    return [[list(map(int, s)) for s in doc] for doc in result]


def python_tokenize(docs, w2v, max_len, sentence_level, keep_gt=5):
    out = []
    for x in docs:
        parts = (str(x).strip(". ").split(".") if sentence_level else [str(x)])
        sents = []
        for sent in parts:
            ids = w2v.sent2indices(sent)[:max_len]
            if len(ids) > keep_gt:
                sents.append(ids)
        out.append(sents)
    return out


@pytest.mark.parametrize("sentence_level", [True, False])
@pytest.mark.parametrize("max_len", [20, 7])
def test_native_matches_python(sentence_level, max_len):
    from umpr_tpu.native import fast_tokenize_reviews
    w2v = FakeW2v(WORDS)
    fast = fast_tokenize_reviews(DOCS, w2v, max_len, sentence_level)
    if fast is None:
        pytest.skip("native toolchain unavailable")
    ref = python_tokenize(DOCS, w2v, max_len, sentence_level)
    assert normalize(fast) == ref


def test_native_matches_python_with_duplicate_vocab_words():
    """Duplicate words in the embedding file: the python Word2vec dict
    overwrites the word's id WITHOUT advancing the count (the reference's
    id-shifting quirk, vocab.py:72-79); the native vocab_build must
    replicate that, not first-occurrence-wins."""
    from umpr_tpu.native import fast_tokenize_reviews

    words = ["alpha", "beta", "alpha", "gamma", "delta"]  # alpha duplicated
    vecs = np.arange(len(words) * 4, dtype=np.float32).reshape(len(words), 4)
    w2v = Word2vec(source="arrays", vocab=words, vectors=vecs)
    # python semantics: alpha -> 5 (overwritten), gamma -> 5 (!), delta -> 6
    assert [w2v.word2index[w] for w in ("alpha", "beta", "gamma", "delta")] \
        == [5, 4, 5, 6]

    docs = ["alpha beta gamma delta alpha beta. delta gamma beta alpha zz 12"]
    fast = fast_tokenize_reviews(docs, w2v, 20, True)
    if fast is None:
        pytest.skip("native toolchain unavailable")
    assert normalize(fast) == python_tokenize(docs, w2v, 20, True)


def test_native_speedup():
    from umpr_tpu.native import fast_tokenize_reviews
    w2v = FakeW2v(WORDS)
    rng = np.random.default_rng(0)
    docs = [". ".join(" ".join(rng.choice(WORDS, size=rng.integers(6, 15)))
                      for _ in range(rng.integers(2, 6)))
            for _ in range(3000)]

    if fast_tokenize_reviews(docs[:10], w2v, 20, True) is None:  # warm build
        pytest.skip("native toolchain unavailable")
    # best-of-3 for the native side: a single timing sample on a loaded CI
    # host can land in a scheduler stall and flake the comparison
    t_fast = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fast = fast_tokenize_reviews(docs, w2v, 20, True)
        t_fast = min(t_fast, time.perf_counter() - t0)

    t0 = time.perf_counter()
    ref = python_tokenize(docs, w2v, 20, True)
    t_py = time.perf_counter() - t0

    assert normalize(fast) == ref
    assert t_fast < t_py, f"native ({t_fast:.3f}s) not faster than python ({t_py:.3f}s)"


def test_native_histories_match_python(tmp_path):
    """C++ build_histories_packed vs the python path: identical packed
    arrays, counts and retain mutations -- including duplicate user-item
    pairs and rows dropped by min_sent_count."""
    import pandas as pd
    import jax
    from umpr_tpu.data import dataset as d
    from umpr_tpu.native import fast_build_histories, flatten_tokenized

    rng = np.random.default_rng(3)
    n = 400
    users = rng.integers(0, 25, n)
    items = rng.integers(0, 12, n)
    users[10] = users[11]; items[10] = items[11]  # duplicate (u, i) pair
    reviews = []
    for i in range(n):
        n_s = int(rng.integers(0, 5))  # some rows have zero sentences
        reviews.append([list(rng.integers(3, 50, int(rng.integers(6, 15))))
                        for _ in range(n_s)])
    df = pd.DataFrame({"user_num": users, "item_num": items})

    S, L, MIN = 6, 16, 3
    # --- python path ---
    retain_py = [len(x) > 0 for x in reviews]
    uh = d._build_histories(df, reviews, retain_py, "user_num", "item_num", MIN, S)
    ih = d._build_histories(df, reviews, retain_py, "item_num", "user_num", MIN, S)
    keep = [i for i, r in enumerate(retain_py) if r]
    ut, ul, uc = d._pack_reviews([uh[i] for i in keep], S, L)
    it_, il, ic = d._pack_reviews([ih[i] for i in keep], S, L)

    # --- native path ---
    flat = flatten_tokenized(reviews)
    retain_nat = np.asarray([len(x) > 0 for x in reviews], np.uint8)
    up = fast_build_histories(users.astype(np.int64), items.astype(np.int64),
                              flat, retain_nat, MIN, S, L)
    if up is None:
        import pytest
        pytest.skip("native toolchain unavailable")
    ip = fast_build_histories(items.astype(np.int64), users.astype(np.int64),
                              flat, retain_nat, MIN, S, L)

    assert retain_nat.astype(bool).tolist() == retain_py
    keep_n = np.asarray(keep)
    np.testing.assert_array_equal(up[0][keep_n], ut)
    np.testing.assert_array_equal(up[1][keep_n], ul)
    np.testing.assert_array_equal(up[2][keep_n], uc)
    np.testing.assert_array_equal(ip[0][keep_n], it_)
    np.testing.assert_array_equal(ip[1][keep_n], il)
    np.testing.assert_array_equal(ip[2][keep_n], ic)


def test_unicode_routing_and_parity():
    """Round-5 UTF-8 path: SAFE non-ASCII (accents, curly quotes, emoji,
    CJK) flows through the C++ byte tokenizer -- including non-ASCII
    VOCAB words matched by UTF-8 byte equality -- while RISKY chars
    (unicode whitespace, unicode digits) still route that document to
    the python path.  Everything stays byte-exact vs python."""
    from umpr_tpu.native import _encode_corpus, fast_tokenize_reviews

    words = list(WORDS) + ["café", "naïve", "你好", "’s"]
    w2v = FakeW2v(words)
    docs = [
        "café naïve sound quality loved album extra",       # safe accents
        "’s curly “quote” sound quality loved album extra",  # safe punct
        "你好 世界 sound quality loved album extra mix",      # safe CJK
        "emoji \U0001f60a doc sound quality loved album",    # safe emoji
        "nbsp separated sound quality loved album extra",   # RISKY \s
        "ideographic　space sound quality loved album extra",  # RISKY \s
        "arabic ٣٤ digits sound quality loved album",   # RISKY \d
        "superscript ² sound quality loved album extra",     # RISKY isdigit
        "plain ascii sound quality loved album extra",
    ]
    _, _, _, mask = _encode_corpus(docs)
    assert mask.tolist() == [True, True, True, True,
                             False, False, False, False, True]
    fast = fast_tokenize_reviews(docs, w2v, 20, True)
    if fast is None:
        pytest.skip("native tokenizer unavailable")
    assert normalize(fast) == python_tokenize(docs, w2v, 20, True)
    # non-ASCII vocab hits resolve through the native path (not UNK)
    cafe_id = w2v.word2index["café"]
    assert int(fast[0][0][0]) == cafe_id
