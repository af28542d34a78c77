"""Pretraining subsystem: skip-gram embeddings, ABAE math parity vs the
reference torch implementation, and the R-Net pretrainer end to end."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from umpr_tpu.text.vocab import Word2vec
from umpr_tpu.pretrain.word2vec_train import train_skipgram
from umpr_tpu.pretrain import abae as jabae

torch = pytest.importorskip("torch")

CORPUS = [
    "great sound quality album",
    "terrible sound mix production",
    "loved fantastic song guitar",
    "guitar drums vocals melody",
    "sound quality production mix",
    "fantastic album loved song",
] * 40  # repeat so min_count filtering keeps the vocabulary


def test_skipgram_trains_and_feeds_word2vec():
    vocab, vecs, counts = train_skipgram(CORPUS, emb_dim=16, min_count=10,
                                         epochs=2, batch_size=512)
    assert len(vocab) >= 10 and vecs.shape == (len(vocab), 16)
    w2v = Word2vec(source="arrays", vocab=vocab, vectors=vecs, counts=counts,
                   vocab_size=8)
    assert len(w2v.vocab) == 3 + 8  # PAD/UNK/NUM + truncated vocab
    assert (w2v.embedding[:3] == 0).all()
    # frequency sort: first kept word must be among the most frequent
    ids = w2v.sent2indices("sound quality xyz 123")
    assert ids[-1] == 2 and ids[2] == 1  # digits -> <NUM>, OOV -> <UNK>


def test_pair_batches_cover_every_skipgram_pair():
    """The streamed pair generator must emit exactly the brute-force
    skip-gram pair multiset (both directions, sentence-bounded windows),
    with every batch but the last at the requested size."""
    import collections
    from umpr_tpu.pretrain.word2vec_train import _flat_ids, _pair_batches

    sentences = ["a b c d e", "c d e", "f", "a c a b", "", "b"]
    word2id = {w: i for i, w in enumerate("abcdef")}
    ids, sent = _flat_ids(sentences, word2id)
    got = collections.Counter()
    sizes = []
    for c, o in _pair_batches(ids, sent, window=2, batch_size=8,
                              rng=np.random.default_rng(0)):
        got.update(zip(c.tolist(), o.tolist()))
        sizes.append(len(c))
    want = collections.Counter()
    for s in sentences:
        toks = [word2id[w] for w in s.split()]
        for i, cw in enumerate(toks):
            for j in range(max(0, i - 2), min(len(toks), i + 3)):
                if j != i:
                    want[(cw, toks[j])] += 1
    assert got == want
    assert all(n == 8 for n in sizes[:-1])


def test_abae_forward_matches_reference():
    """Our ABAE forward/loss vs the reference torch ABAE with identical
    weights (KMeans init bypassed by copying our aspects in)."""
    import sys, types
    sys.modules.setdefault("gensim", types.ModuleType("gensim"))
    sys.path.insert(0, "/root/reference")
    import importlib
    import pretrain.abae as ref_abae_mod

    rng = np.random.default_rng(0)
    V, D, K, B, L, NEG = 30, 12, 4, 6, 8, 3
    emb = rng.standard_normal((V, D)).astype(np.float32)

    # our params (KMeans init inside; then copied to the reference model)
    params = jabae.init_abae(jax.random.PRNGKey(0), emb, K)

    pos = rng.integers(0, V, size=(B, L)).astype(np.int32)
    neg = rng.integers(0, V, size=(B, NEG, L)).astype(np.int32)
    pt, loss = jabae.abae_forward(params, jnp.asarray(pos), jnp.asarray(neg),
                                  reg_rate=0.1)

    # build the reference ABAE without re-running its KMeans __init__
    ref = ref_abae_mod.ABAE.__new__(ref_abae_mod.ABAE)
    torch.nn.Module.__init__(ref)
    ref.eps = 1e-6
    ref.embedding = torch.nn.Embedding.from_pretrained(torch.tensor(emb))
    ref.M = torch.nn.Parameter(torch.tensor(np.asarray(params["M"])))
    fc_lin = torch.nn.Linear(D, K)
    fc_lin.weight.data = torch.tensor(np.asarray(params["fc"]["kernel"]).T)
    fc_lin.bias.data = torch.tensor(np.asarray(params["fc"]["bias"]))
    ref.fc = torch.nn.Sequential(fc_lin, torch.nn.Softmax(dim=-1))
    ref.aspect = torch.nn.Parameter(torch.tensor(np.asarray(params["aspect"])))
    ref.reg_rate = 0.1

    with torch.no_grad():
        ref_pt, ref_loss = ref(torch.tensor(pos.astype(np.int64)),
                               torch.tensor(neg.astype(np.int64)))
    np.testing.assert_allclose(np.asarray(pt), ref_pt.squeeze(1).numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4, atol=1e-5)


def test_rnet_cli_end_to_end(tmp_path):
    """`python -m umpr_tpu.pretrain.rnet` twice: the first run trains ABAE +
    R-Net and saves both; the second hits the ABAE-restore branch (shape
    template without the throwaway KMeans) and retrains only the R-Net."""
    import os
    import pandas as pd
    from umpr_tpu.pretrain import rnet as rnet_cli
    from umpr_tpu.train.checkpoint import restore_pytree
    from umpr_tpu.models.review_net import init_rnet

    data_dir = tmp_path / "data"
    os.makedirs(data_dir)
    rows = [{"userID": f"U{i % 7}", "itemID": f"I{i % 5}",
             "review": ". ".join(CORPUS[(i + j) % len(CORPUS)]
                                 for j in range(3)),
             "rating": float(i % 5 + 1), "user_num": i % 7, "item_num": i % 5}
            for i in range(40)]
    pd.DataFrame(rows).to_csv(data_dir / "train.csv", index=False)

    save_abae = str(tmp_path / "abae_ckpt")
    save_rnet = str(tmp_path / "rnet_ckpt")
    argv = ["--device", "cpu", "--data_dir", str(data_dir),
            "--train_epochs", "1", "--batch_size", "32",
            "--vocab_size", "50", "--aspect_size", "3",
            "--gru_size", "8", "--emb_dim", "16",
            "--save_ABAE", save_abae, "--save_rnet", save_rnet]
    rnet_cli.main(argv)
    assert os.path.exists(os.path.join(save_abae, "arrays.npz"))
    like = init_rnet(jax.random.PRNGKey(0), 16, 8)
    first = restore_pytree(save_rnet, like)

    rnet_cli.main(argv)  # second run: ABAE restored, R-Net retrained
    second = restore_pytree(save_rnet, like)
    assert first["M"].shape == second["M"].shape == (16, 16)


def test_abae_cli_end_to_end(tmp_path):
    """`python -m umpr_tpu.pretrain.abae` on a train.txt corpus saves a
    restorable checkpoint (reference pretrain/abae.py __main__ analogue)."""
    import os
    from umpr_tpu.pretrain import abae as abae_cli
    from umpr_tpu.train.checkpoint import restore_pytree

    data_dir = tmp_path / "data"
    os.makedirs(data_dir)
    with open(data_dir / "train.txt", "w") as f:
        f.write("\n".join(CORPUS))

    save = str(tmp_path / "abae_ckpt")
    abae_cli.main(["--device", "cpu", "--data_dir", str(data_dir),
                   "--train_epochs", "1", "--batch_size", "64",
                   "--vocab_size", "50", "--aspect_size", "3",
                   "--emb_dim", "16", "--save_path", save])
    assert os.path.exists(os.path.join(save, "arrays.npz"))
    # corpus vocab: 14 unique words + 3 reserved rows = 17
    like = jabae.init_abae(jax.random.PRNGKey(0),
                           np.zeros((17, 16), np.float32), 3, kmeans=False)
    restored = restore_pytree(save, like)
    assert restored["aspect"].shape == (3, 16)
    assert np.isfinite(np.asarray(restored["aspect"])).all()


def test_rnet_pretrain_end_to_end(tmp_path):
    from umpr_tpu.pretrain.rnet import pretrain_r_net
    from umpr_tpu.train.checkpoint import restore_pytree
    from umpr_tpu.models.review_net import init_rnet

    vocab, vecs, counts = train_skipgram(CORPUS, emb_dim=16, min_count=10,
                                         epochs=1, batch_size=512)
    w2v = Word2vec(source="arrays", vocab=vocab, vectors=vecs, counts=counts)
    abae_params = jabae.init_abae(jax.random.PRNGKey(0), w2v.embedding, 3)
    save = str(tmp_path / "rnet_ckpt")
    pretrain_r_net(w2v, CORPUS[:60], abae_params, save, gru_size=8,
                   max_length=10, batch_size=32, train_epochs=1)
    like = init_rnet(jax.random.PRNGKey(1), 16, 8)
    restored = restore_pytree(save, like)
    assert restored["M"].shape == (16, 16)


def _mine_pairs_loop(data, probs, rng, sample_k=20, hi=0.8, lo=0.5):
    """Straightforward transliteration of the reference's per-sentence pair
    mining (pretrain_rnet.py:98-127): the oracle for the blocked/vectorized
    mine_pairs (identical rng call sequence, early exit, strict-improvement
    updates, skip when no partner beat the sentinels)."""
    norms = np.linalg.norm(probs, axis=-1)
    n = len(data)
    s1, s2, labels = [], [], []
    for i in range(n):
        pos_j, neg_j = None, None
        max_cos, min_cos = -1.0, 1.0
        for j in rng.choice(n, size=min(sample_k, n), replace=False):
            if i == j:
                continue
            cos = float(probs[i] @ probs[j] / (norms[i] * norms[j] + 1e-12))
            if cos > max_cos:
                max_cos, pos_j = cos, j
            if cos < min_cos:
                min_cos, neg_j = cos, j
            if max_cos > hi and min_cos < lo:
                break
        if pos_j is None or neg_j is None:
            continue
        s1 += [i, i]
        s2 += [pos_j, neg_j]
        labels += [1.0, 0.0]
    return data[s1], data[s2], np.asarray(labels, np.float32)


@pytest.mark.parametrize("n,k,seed", [(400, 20, 0), (37, 20, 1), (5, 20, 2),
                                      (1, 20, 3), (0, 20, 4), (256, 3, 5)])
def test_mine_pairs_matches_loop(n, k, seed):
    """Blocked mine_pairs == per-sentence loop, pair for pair, incl. the
    early exit, first-occurrence ties (duplicate prob rows), self-skip,
    and the no-partner skip."""
    from umpr_tpu.pretrain.rnet import mine_pairs

    rng = np.random.default_rng(seed)
    probs = np.abs(rng.standard_normal((n, 7))).astype(np.float32)
    if n >= 8:
        probs[n // 2] = probs[0]      # duplicate rows -> exact cosine ties
        probs[n // 2 + 1] = 0.0       # zero-norm row
    data = rng.integers(0, 50, size=(n, 9))

    a = _mine_pairs_loop(data, probs, np.random.default_rng(seed + 100),
                         sample_k=k)
    b = mine_pairs(data, probs, np.random.default_rng(seed + 100),
                   sample_k=k, block_size=64)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert len(a[0]) == len(b[0])
