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


def _flat_ids(sentences, word2id):
    """Corpus as one flat int32 id stream + parallel sentence-id array
    (8 bytes/token total).  The previous design materialized every
    (center, context) pair as python int lists -- ~2*window pairs per token
    at ~30 bytes per list int, tens-to-hundreds of GB at the Yelp/CSJ
    corpus scale this module replaces gensim for."""
    chunk_ids, chunk_sent = [], []
    buf_ids, buf_sent = [], []
    for si, s in enumerate(sentences):
        toks = [word2id[w] for w in s.split() if w in word2id]
        buf_ids.extend(toks)
        buf_sent.extend([si] * len(toks))
        if len(buf_ids) >= (1 << 20):
            chunk_ids.append(np.asarray(buf_ids, np.int32))
            chunk_sent.append(np.asarray(buf_sent, np.int64))
            buf_ids, buf_sent = [], []
    chunk_ids.append(np.asarray(buf_ids, np.int32))
    chunk_sent.append(np.asarray(buf_sent, np.int64))
    return np.concatenate(chunk_ids), np.concatenate(chunk_sent)


_PAIR_CHUNK = 1 << 21  # positions per slab (tens of MB live at a time)


def _pair_batches(ids, sent, window, batch_size, rng):
    """Yield shuffled (centers, contexts) batches streamed from the flat id
    arrays: for offset d, the pairs are (ids[i], ids[i+d]) plus the flip,
    wherever both positions lie in one sentence.  Chunk order and intra-
    chunk order are shuffled; leftovers carry across chunks so every batch
    but the final one is exactly batch_size (one jit shape)."""
    T = len(ids)
    spans = [(d, lo) for d in range(1, window + 1)
             for lo in range(0, max(T - d, 0), _PAIR_CHUNK)]
    rng.shuffle(spans)
    rem_c = rem_o = np.zeros(0, np.int32)
    for d, lo in spans:
        hi = min(lo + _PAIR_CHUNK, T - d)
        a, b = ids[lo:hi], ids[lo + d:hi + d]
        ok = sent[lo:hi] == sent[lo + d:hi + d]
        a, b = a[ok], b[ok]
        c = np.concatenate([rem_c, a, b])
        o = np.concatenate([rem_o, b, a])
        perm = rng.permutation(len(c))
        c, o = c[perm], o[perm]
        end = len(c) - len(c) % batch_size
        for s in range(0, end, batch_size):
            yield c[s:s + batch_size], o[s:s + batch_size]
        rem_c, rem_o = c[end:], o[end:]
    if len(rem_c):
        yield rem_c, rem_o


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

    flat_ids, flat_sent = _flat_ids(sentences, word2id)
    for epoch in range(epochs):
        total, nb, n = 0.0, 0, 0
        for c, o in _pair_batches(flat_ids, flat_sent, window, batch_size, rng):
            n += len(c)
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
