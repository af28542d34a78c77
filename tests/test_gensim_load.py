"""gensim-model loading WITHOUT gensim (umpr_tpu.text.gensim_load).

A gensim 3.x ``Word2Vec.save()`` file is a pickle of the model object graph
(classes under gensim.models.*) with large arrays optionally split into
``<path>.<attr>.npy`` sidecars.  These tests synthesize exactly that wire
format with stand-in classes registered under the gensim module names,
then:

- load it through OUR restricted unpickler (no gensim modules installed);
- run the ACTUAL reference ``Word2vec(source='gensim')``
  (/root/reference/src/word2vec.py:54-64) against the same file — with
  ``gensim.models.Word2Vec.load`` stubbed to a real unpickler over the
  same stand-in classes — and compare vocab/word2index/embedding exactly,
  including the reference's break-at-``len(embedding) >= vocab_size``
  truncation quirk (which keeps vocab_size-3 words).
"""

import contextlib
import pickle
import sys
import types

import numpy as np
import pytest

from umpr_tpu.text.vocab import Word2vec


# --------------------------------------------------------------------------
# synthesize a gensim-3.x-shaped model file


class _FakeVocabEntry:
    def __init__(self, count, index):
        self.count = count
        self.index = index


class _FakeKeyedVectors:
    def __init__(self, vocab, vectors):
        self.vocab = vocab          # word -> _FakeVocabEntry
        self.vectors = vectors      # (V, D) float32
        self.index2word = sorted(vocab, key=lambda w: vocab[w].index)

    def __getitem__(self, w):       # gensim API used by the reference
        return self.vectors[self.vocab[w].index]


class _FakeWord2Vec:
    def __init__(self, wv):
        self.wv = wv


@contextlib.contextmanager
def _gensim_wire_modules():
    """Register the stand-in classes under gensim's real module paths so a
    plain pickle round-trips with gensim GLOBAL records, then clean up."""
    mods = {}
    for name in ("gensim", "gensim.models", "gensim.models.word2vec",
                 "gensim.models.keyedvectors", "gensim.models.utils"):
        mods[name] = sys.modules.get(name)
        sys.modules[name] = types.ModuleType(name)
    sys.modules["gensim"].models = sys.modules["gensim.models"]
    w2v_mod = sys.modules["gensim.models.word2vec"]
    kv_mod = sys.modules["gensim.models.keyedvectors"]
    for cls, mod in ((_FakeWord2Vec, w2v_mod), (_FakeKeyedVectors, kv_mod),
                     (_FakeVocabEntry, kv_mod)):
        public = {"_FakeWord2Vec": "Word2Vec",
                  "_FakeKeyedVectors": "Word2VecKeyedVectors",
                  "_FakeVocabEntry": "Vocab"}[cls.__name__]
        patched = type(public, (cls,), {"__module__": mod.__name__})
        setattr(mod, public, patched)
    try:
        yield w2v_mod, kv_mod
    finally:
        for name, old in mods.items():
            if old is None:
                del sys.modules[name]
            else:
                sys.modules[name] = old


def make_model_file(path, words, seed=0, sidecar=False):
    """Write a gensim-3.x-wire-format model: counts descend in a shuffled
    index order so count-sorting and index lookup are both exercised."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(words))
    vocab = {}
    for rank, w in enumerate(words):
        vocab[w] = None  # placeholder to fix dict iteration order
    with _gensim_wire_modules() as (w2v_mod, kv_mod):
        Vocab, KV, W2V = kv_mod.Vocab, kv_mod.Word2VecKeyedVectors, w2v_mod.Word2Vec
        for rank, w in enumerate(words):
            # count 1000-10*rank: strictly descending in `words` order
            vocab[w] = Vocab(count=1000 - 10 * rank, index=int(order[rank]))
        vectors = rng.standard_normal((len(words), 6)).astype(np.float32)
        kv = KV(vocab, vectors)
        if sidecar:
            np.save(f"{path}.wv.vectors.npy", vectors)
            kv.vectors = None
        model = W2V(kv)
        with open(path, "wb") as f:
            pickle.dump(model, f, protocol=2)
    expected = {w: vectors[vocab[w].index] for w in words}
    return expected


def ref_gensim_word2vec(path, vocab_size):
    """Run the real reference loader with gensim.models.Word2Vec.load
    stubbed to unpickle over the stand-in classes."""
    with _gensim_wire_modules():
        sys.modules["gensim"].models.Word2Vec = sys.modules[
            "gensim.models.word2vec"].Word2Vec

        def _load(p):
            # gensim's SaveLoad.load also restores .npy sidecars; reuse our
            # restorer so the stub matches gensim's observable behavior
            from umpr_tpu.text.gensim_load import _restore_sidecars
            with open(p, "rb") as f:
                model = pickle.load(f)
            _restore_sidecars(model, p)
            return model

        sys.modules["gensim"].models.Word2Vec.load = staticmethod(_load)
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        for m in ("src.word2vec", "src"):
            sys.modules.pop(m, None)  # reimport against the stubbed gensim
        from src.word2vec import Word2vec as RefW2v
        return RefW2v(path, source="gensim", vocab_size=vocab_size)


WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa"]


@pytest.mark.parametrize("vocab_size", [0, 8])
@pytest.mark.parametrize("sidecar", [False, True])
def test_gensim_load_matches_reference(tmp_path, vocab_size, sidecar):
    path = str(tmp_path / "w2v.model")
    make_model_file(path, WORDS, sidecar=sidecar)
    ours = Word2vec(path, source="gensim", vocab_size=vocab_size)
    ref = ref_gensim_word2vec(path, vocab_size)
    assert ours.vocab == ref.vocab
    assert ours.word2index == ref.word2index
    np.testing.assert_array_equal(
        np.asarray(ours.embedding, np.float32),
        np.stack([np.asarray(e, np.float32) for e in ref.embedding]))
    if vocab_size:
        # the reference's truncation quirk: vocab_size COUNTS the 3
        # reserved rows, so vocab_size words requested keeps vocab_size-3
        assert len(ours.vocab) == vocab_size


def test_gensim_autosniff_from_default_source(tmp_path):
    path = str(tmp_path / "w2v.model")
    expected = make_model_file(path, WORDS)
    w2v = Word2vec(path)  # source='glove' default; pickle magic sniffs it
    assert w2v.vocab[3:] == WORDS
    np.testing.assert_array_equal(w2v.embedding[3 + WORDS.index("gamma")],
                                  expected["gamma"])


def test_gensim4_layout(tmp_path):
    """gensim 4.x stores key_to_index/index_to_key + expandos counts."""
    path = str(tmp_path / "kv4.model")
    rng = np.random.default_rng(1)
    vectors = rng.standard_normal((4, 5)).astype(np.float32)
    with _gensim_wire_modules() as (w2v_mod, kv_mod):
        kv = kv_mod.Word2VecKeyedVectors.__new__(kv_mod.Word2VecKeyedVectors)
        kv.__dict__.update(
            key_to_index={"w0": 0, "w1": 1, "w2": 2, "w3": 3},
            index_to_key=["w0", "w1", "w2", "w3"],
            vectors=vectors,
            expandos={"count": np.array([5, 9, 7, 3])})
        with open(path, "wb") as f:
            pickle.dump(kv, f, protocol=2)
    w2v = Word2vec(path, source="gensim", vocab_size=0)
    assert w2v.vocab[3:] == ["w0", "w1", "w2", "w3"]
    np.testing.assert_array_equal(w2v.embedding[3:], vectors)
    # count-sorted truncation: vocab_size=5 keeps the top-2 by count
    w2v = Word2vec(path, source="gensim", vocab_size=5)
    assert w2v.vocab[3:] == ["w1", "w2"]


def test_unpickler_rejects_arbitrary_globals(tmp_path):
    """The restricted unpickler must refuse non-numpy/stdlib globals — the
    code-execution surface gensim's own loader leaves open."""
    from umpr_tpu.text.gensim_load import load_gensim_model
    evil_pickles = [
        b"\x80\x02cos\nsystem\nq\x00.",            # GLOBAL os.system
        b"\x80\x02cbuiltins\neval\nq\x00.",        # whitelisted MODULE is not enough
        b"\x80\x02cbuiltins\ngetattr\nq\x00.",
        b"\x80\x02cnumpy\nload\nq\x00.",           # numpy callables beyond ndarray
    ]
    for i, evil in enumerate(evil_pickles):
        path = str(tmp_path / f"evil{i}.model")
        with open(path, "wb") as f:
            f.write(evil)
        with pytest.raises(pickle.UnpicklingError):
            load_gensim_model(path)
