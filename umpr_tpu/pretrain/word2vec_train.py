"""Corpus word-embedding trainer (skip-gram with negative sampling, JAX).

Replaces the reference's gensim dependency (pretrain_rnet.py:237-240,
abae.py:221-224: gensim.models.Word2Vec(size=emb_dim, window=5,
min_count=10)), which is not available in this environment.  Functional
equivalent, not bit-identical: same vocabulary policy (min_count filter,
frequency-sorted truncation downstream) and the standard SGNS objective
gensim implements; initialization/schedule details differ.

The returned (vocab, vectors, counts) triple feeds Word2vec(source='arrays')
which reproduces the reference's gensim loading path (frequency sort +
truncation, word2vec.py:54-64).
"""

from __future__ import annotations

from collections import Counter

import numpy as np

import jax
import jax.numpy as jnp
import optax


def build_vocab(sentences, min_count=10):
    counts = Counter(w for s in sentences for w in s.split())
    vocab = [w for w, c in counts.items() if c >= min_count]
    return vocab, np.asarray([counts[w] for w in vocab], np.int64)


def _pairs(sentences, word2id, window, rng):
    """(center, context) id pairs over all sentences."""
    centers, contexts = [], []
    for s in sentences:
        ids = [word2id[w] for w in s.split() if w in word2id]
        for i, c in enumerate(ids):
            lo = max(0, i - window)
            hi = min(len(ids), i + window + 1)
            for j in range(lo, hi):
                if j != i:
                    centers.append(c)
                    contexts.append(ids[j])
    if not centers:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    centers = np.asarray(centers, np.int32)
    contexts = np.asarray(contexts, np.int32)
    perm = rng.permutation(len(centers))
    return centers[perm], contexts[perm]


def train_skipgram(sentences, emb_dim=50, window=5, min_count=10, neg=5,
                   epochs=3, batch_size=8192, lr=2e-3, seed=0, logger=None):
    """sentences: list of whitespace-tokenized strings.
    Returns (vocab list, vectors (V, emb_dim) float32, counts (V,))."""
    rng = np.random.default_rng(seed)
    vocab, counts = build_vocab(sentences, min_count)
    if len(vocab) == 0:
        return vocab, np.zeros((0, emb_dim), np.float32), counts
    word2id = {w: i for i, w in enumerate(vocab)}
    V = len(vocab)

    # unigram^0.75 negative-sampling distribution (standard SGNS)
    p_neg = counts.astype(np.float64) ** 0.75
    p_neg /= p_neg.sum()

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    params = {
        "in": jax.random.uniform(k1, (V, emb_dim), jnp.float32,
                                 -0.5 / emb_dim, 0.5 / emb_dim),
        "out": jnp.zeros((V, emb_dim), jnp.float32),
    }
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, centers, contexts, negs):
        def loss_fn(p):
            vc = p["in"][centers]            # (B, D)
            uo = p["out"][contexts]          # (B, D)
            un = p["out"][negs]              # (B, neg, D)
            pos = jax.nn.log_sigmoid(jnp.sum(vc * uo, -1))
            negl = jax.nn.log_sigmoid(-jnp.einsum("bd,bnd->bn", vc, un)).sum(-1)
            return -jnp.mean(pos + negl)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    centers, contexts = _pairs(sentences, word2id, window, rng)
    n = len(centers)
    for epoch in range(epochs):
        total, nb = 0.0, 0
        for s in range(0, n, batch_size):
            c = centers[s:s + batch_size]
            o = contexts[s:s + batch_size]
            if len(c) < 16:
                continue
            negs = rng.choice(V, size=(len(c), neg), p=p_neg).astype(np.int32)
            params, opt_state, loss = step(params, opt_state, c, o, negs)
            total += float(loss)
            nb += 1
        if logger:
            logger.info(f"skipgram epoch {epoch}: loss {total / max(nb, 1):.4f} "
                        f"({n} pairs, vocab {V})")
    return vocab, np.asarray(params["in"], np.float32), counts
