"""Golden tests for the text and data layers vs the reference implementation:
tokenization, padding/packing, config reflection, image decode, eval
semantics on partial batches."""

import os
import sys
import types

import numpy as np
import pytest

from umpr_tpu.config import Config
from umpr_tpu.text.vocab import Word2vec


def make_glove(tmp_path, words, dim=8):
    rng = np.random.default_rng(0)
    p = tmp_path / "glove.txt"
    with open(p, "w") as f:
        for w in words:
            f.write(w + " " + " ".join(f"{x:.4f}" for x in rng.standard_normal(dim)) + "\n")
    return str(p)


def ref_word2vec(glove_path):
    sys.modules.setdefault("gensim", types.ModuleType("gensim"))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from src.word2vec import Word2vec as RefW2v
    return RefW2v(glove_path)


SENTS = [
    "great sound quality",
    "the album. has 12 tracks",          # digits -> <NUM>, '.' -> space
    "unknownword great 007 great",        # OOV -> <UNK>; '007' is digits
    "   spaced   out   ",
    "",
]


def test_sent2indices_matches_reference(tmp_path):
    glove = make_glove(tmp_path, ["great", "sound", "quality", "album",
                                  "has", "tracks", "the"])
    ours, ref = Word2vec(glove), ref_word2vec(glove)
    assert ours.vocab == ref.vocab
    assert ours.word2index == ref.word2index
    np.testing.assert_allclose(np.asarray(ours.embedding, dtype=np.float64)[3:],
                               np.stack(ref.embedding[3:]), rtol=1e-5)
    for s in SENTS:
        for align in (0, 4, 10):
            assert ours.sent2indices(s, align) == ref.sent2indices(s, align), (s, align)
    for seq in ([1, 2, 3], [1] * 10):
        for n in (2, 5, 10):
            assert ours.pad(list(seq), n) == ref.pad(list(seq), n)


def test_packing_matches_reference_pad_reviews():
    """Our static (tokens, lengths) arrays sliced to the batch maxima must
    equal the reference's dynamic pad_reviews output (dataset.py:122-131)."""
    sys.modules.setdefault("gensim", types.ModuleType("gensim"))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from src.dataset import pad_reviews
    from umpr_tpu.data.dataset import _pack_reviews

    reviews = [
        [[10, 11, 12, 13, 14, 15], [20, 21, 22, 23, 24, 25, 26]],
        [[30, 31, 32, 33, 34, 35, 36, 37]],
        [[40, 41, 42, 43, 44, 45], [50, 51, 52, 53, 54, 55], [60, 61, 62, 63, 64, 65]],
    ]
    ref_tokens, ref_lengths = pad_reviews([list(map(list, r)) for r in reviews])
    ref_tokens = np.asarray(ref_tokens)
    ref_lengths = np.asarray(ref_lengths)
    S_b, L_b = ref_tokens.shape[1], ref_tokens.shape[2]

    tokens, lengths, counts = _pack_reviews(reviews, max_count=5, max_len=12)
    np.testing.assert_array_equal(tokens[:, :S_b, :L_b], ref_tokens)
    np.testing.assert_array_equal(lengths[:, :S_b], ref_lengths)
    assert list(counts) == [2, 1, 3]
    # pad sentences beyond each count carry length 1 (dataset.py:127)
    assert lengths[1, 1] == 1 and tokens[1, 1].sum() == 0


def test_config_reflection_flags():
    cfg = Config(argv=["--views", "['food','inside','outside','drink']",
                       "--multi_gpu", "False", "--batch_size", "128",
                       "--learning_rate", "3e-4", "--review_net_only", "True"])
    assert cfg.views == ["food", "inside", "outside", "drink"]
    assert cfg.multi_gpu is False          # ast.literal_eval bool (readme.md:167-173)
    assert cfg.batch_size == 128 and cfg.learning_rate == 3e-4
    assert cfg.review_net_only is True and cfg.view_size == 4
    assert "batch_size = 128" in str(cfg)

    with pytest.raises(AssertionError):
        Config(argv=["--review_level", "paragraph"])
    with pytest.raises(AssertionError):
        Config(argv=["--test_only", "True"])  # requires model_path


def test_get_image_matches_reference(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from umpr_tpu.data.images import get_image
    rng = np.random.default_rng(1)
    p = str(tmp_path / "img.jpg")
    cv2.imwrite(p, rng.integers(0, 255, (100, 150, 3)).astype(np.uint8))

    ours = get_image(p, (224, 224))              # uint8 HWC RGB
    img = cv2.imread(p)
    img = cv2.resize(img, (224, 224))
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    ref = img.transpose(2, 0, 1) / 255.0          # reference dataset.py:134-141
    np.testing.assert_allclose(ours.transpose(2, 0, 1) / 255.0, ref, atol=1e-7)

    # failure paths -> zeros (reference dataset.py:142-143)
    assert (get_image("", (8, 8)) == 0).all()
    bad = str(tmp_path / "bad.jpg")
    open(bad, "wb").write(b"nope")
    assert (get_image(bad, (8, 8)) == 0).all()


def test_eval_partial_batch_equals_reference_semantics():
    """Dataset MSE with dead-sample padding == plain sum/count over the real
    samples (reference evaluate.py:6-14)."""
    import jax
    import jax.numpy as jnp
    from umpr_tpu.models.umpr import ModelDims, init_umpr
    from umpr_tpu.train.optim import split_frozen
    from umpr_tpu.train.step import make_eval_step, evaluate_mse
    from tests.ref_oracle import random_batch

    rng = np.random.default_rng(0)
    dims = ModelDims(review_net_only=True)
    params = init_umpr(jax.random.PRNGKey(0), dims,
                       rng.standard_normal((40, 16)).astype(np.float32))
    trainable, frozen = split_frozen(params)
    eval_step = make_eval_step(dims)

    full = random_batch(rng, B=6, S=4, L=10, S_ui=2)
    # split into one full batch of 4 and one padded batch of 2 (+2 dead)
    def slice_batch(idx, pad_to):
        b = {k: v[idx] for k, v in full.items()}
        n = len(idx)
        if n < pad_to:
            for k, v in b.items():
                reps = np.concatenate([v, np.repeat(v[:1], pad_to - n, axis=0)])
                b[k] = reps
            b["sample_mask"][n:] = 0
            for k in ("u_counts", "i_counts", "ui_counts"):
                b[k][n:] = 0
        return {k: jnp.asarray(v) for k, v in b.items()}

    batches = [slice_batch(list(range(4)), 4), slice_batch([4, 5], 4)]
    mse = evaluate_mse(eval_step, trainable, frozen, batches)

    # oracle: per-sample squared errors computed batch-free
    from umpr_tpu.models.umpr import umpr_forward
    sq, cnt = 0.0, 0
    for i in range(6):
        b1 = slice_batch([i], 4)
        pred, _, _ = umpr_forward({**trainable, **frozen}, b1, dims)
        sq += float((pred[0] - full["ratings"][i]) ** 2)
        cnt += 1
    # NOTE: single-sample batches change the runtime batch maxima, so tiny
    # numeric drift vs the grouped batches is expected (reference behaves
    # the same way across different batch splits); compare loosely.
    assert abs(mse - sq / cnt) < 0.15 * max(1.0, abs(mse))


def test_cli_surface_covers_reference_config():
    """Every reference hyperparameter flag must exist on our Config
    (reference config.py:7-39), so reference command lines keep working."""
    ref_attrs = [
        "multi_gpu", "train_epochs", "batch_size", "learning_rate",
        "l2_regularization", "lr_decay", "word2vec_file", "data_dir",
        "log_path", "model_path", "test_only", "review_net_only",
        "review_level", "max_sent_count", "min_sent_count",
        "max_ui_sent_count", "max_sent_length", "views", "photo_count",
        "gru_size", "self_atte_size", "kernel_count", "kernel_size",
        "threshold", "loss_v_rate", "device",
    ]
    cfg = Config(argv=[])
    for name in ref_attrs:
        assert hasattr(cfg, name), f"missing reference flag --{name}"


def test_loader_multiworker_photo_decode(tmp_path):
    """workers>0 decode path (ThreadPoolExecutor) yields identical batches
    to the synchronous path."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np
    from tests.test_checkpoint_loader import small_dataset
    from umpr_tpu.data.loader import BatchLoader

    ds = small_dataset(n=8)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 255, (80, 90, 3)).astype(np.uint8))
        paths.append(p)
    ds.photo_paths = np.asarray(
        [[[paths[i % 4]]] for i in range(8)], dtype=np.str_)

    sync = list(BatchLoader(ds, 4, ignore_photos=False, photo_cache_bytes=0))
    multi = list(BatchLoader(ds, 4, ignore_photos=False, workers=3,
                             photo_cache_bytes=0))
    for a, b in zip(sync, multi):
        np.testing.assert_array_equal(a["photos"], b["photos"])


def test_word2vec_text_format_loader(tmp_path):
    """source='word2vec' + CLI header sniffing: standard word2vec text files
    (header `<count> <dim>`, rows most-frequent-first) load with the
    reference gensim path's reserved ids and head-truncation semantics
    (reference word2vec.py:54-64)."""
    from umpr_tpu.text.vocab import Word2vec

    path = tmp_path / "model.txt"
    rows = [("loved", [0.1, 0.2]), ("sound", [0.3, 0.4]),
            ("album", [0.5, 0.6]), ("rarely", [0.7, 0.8])]
    with open(path, "w") as f:
        f.write(f"{len(rows)} 2\n")
        for w, v in rows:
            f.write(w + " " + " ".join(map(str, v)) + "\n")

    w2v = Word2vec(str(path), source="word2vec")
    assert w2v.vocab == ["<PAD>", "<UNK>", "<NUM>",
                         "loved", "sound", "album", "rarely"]
    assert w2v.word_dim == 2
    np.testing.assert_array_equal(w2v.embedding[:3], np.zeros((3, 2)))
    np.testing.assert_allclose(w2v.embedding[3], [0.1, 0.2])
    assert w2v.sent2indices("loved 12 zzz sound") == [3, 2, 1, 4]

    # frequency truncation: keep the first (most frequent) vocab_size rows
    w2v_t = Word2vec(str(path), source="word2vec", vocab_size=2)
    assert w2v_t.vocab == ["<PAD>", "<UNK>", "<NUM>", "loved", "sound"]
    assert len(w2v_t.embedding) == 5

    # the default CLI path ('glove' source) sniffs the header
    auto = Word2vec(str(path))
    assert auto.vocab == w2v.vocab
    np.testing.assert_array_equal(auto.embedding, w2v.embedding)

    # and a real glove file (no header) is untouched by the sniffing
    gpath = tmp_path / "glove.txt"
    with open(gpath, "w") as f:
        f.write("word 1.0 2.0\nother 3.0 4.0\n")
    g = Word2vec(str(gpath))
    assert g.vocab[3:] == ["word", "other"]


def test_glove_fallback_handles_multitoken_words(tmp_path):
    """glove.840B-style lines whose 'word' contains spaces ('. . .') crash
    the reference's loader; ours recovers the vector as the last-dim floats
    (the pandas fast path rejects the ragged file, the python fallback
    absorbs it)."""
    from umpr_tpu.text.vocab import Word2vec
    p = tmp_path / "glove.txt"
    p.write_text(
        "hello 1.0 2.0 3.0\n"
        ". . . 4.0 5.0 6.0\n"     # multi-token word
        "broken_line_no_floats a b c\n"  # unparsable: skipped
        "world 7.0 8.0 9.0\n")
    w2v = Word2vec(str(p))
    assert w2v.vocab[3:] == ["hello", ". . .", "world"]
    np.testing.assert_array_equal(w2v.embedding[4], [4.0, 5.0, 6.0])
    np.testing.assert_array_equal(
        w2v.embedding[w2v.word2index["world"]], [7.0, 8.0, 9.0])


def test_photo_cache_keys_on_resize(tmp_path):
    """One cache shared by loaders with different photo sizes must not
    return the wrong shape."""
    import cv2
    from umpr_tpu.data.images import PhotoCache
    p = str(tmp_path / "a.jpg")
    cv2.imwrite(p, np.full((64, 64, 3), 128, np.uint8))
    cache = PhotoCache(10 << 20)
    a = cache.get(p, (32, 32))
    b = cache.get(p, (16, 16))
    assert a.shape == (32, 32, 3) and b.shape == (16, 16, 3)
    assert cache.hits == 0 and cache.misses == 2
    assert cache.get(p, (32, 32)).shape == (32, 32, 3)
    assert cache.hits == 1
