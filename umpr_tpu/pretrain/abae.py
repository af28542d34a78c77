"""ABAE: unsupervised Attention-Based Aspect Extraction (He et al. 2017),
used to warm-start the R-Net (reference: pretrain/abae.py).

Math parity with the reference model (abae.py:42-102):
- attention a_i = softmax(e_i M (sum_j e_j))  (abae.py:63-65);
- aspect bottleneck p_t = softmax(W z_s + b), reconstruction r_s = p_t A
  (abae.py:67-69);
- aspect matrix initialized by sklearn KMeans over the embedding table
  (abae.py:53-56; one-shot host-side init, kept in sklearn);
- max-margin hinge loss vs `neg_count` negative sentences + orthonormality
  penalty reg * ||A_n A_n^T - I||  (abae.py:80-90), eps = 1e-6;
- the word embedding table is TRAINABLE here (abae.py:46-47), unlike in the
  main UMPR model.

TPU-native: one jitted train step (static shapes: sentences are id arrays
aligned to max_length, negatives pre-sampled per epoch on host), Adam with
per-epoch exponential lr decay like the reference driver (abae.py:118-119).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp
import optax

EPS = 1e-6


def init_abae(key, word_emb, aspect_size, kmeans=True):
    """word_emb: (V, D).  KMeans aspect init as in the reference.

    kmeans=False skips the (expensive, minutes at large vocabs) clustering
    and zero-fills the aspect matrix -- for shape templates whose values a
    checkpoint restore immediately replaces."""
    word_emb = np.asarray(word_emb, np.float32)
    if kmeans:
        from sklearn.cluster import KMeans
        km = KMeans(n_clusters=aspect_size, n_init=10)
        km.fit(word_emb)
        aspect = jnp.asarray(km.cluster_centers_, jnp.float32)
    else:
        aspect = jnp.zeros((aspect_size, word_emb.shape[1]), jnp.float32)
    k1, k2 = jax.random.split(key)
    d = word_emb.shape[1]
    return {
        "embedding": jnp.asarray(word_emb),
        "M": jax.random.normal(k1, (d, d), jnp.float32),
        "fc": {
            "kernel": jax.random.uniform(k2, (d, aspect_size), jnp.float32,
                                         -1 / np.sqrt(d), 1 / np.sqrt(d)),
            "bias": jnp.zeros((aspect_size,), jnp.float32),
        },
        "aspect": aspect,
    }


def _encode(params, ids):
    """ids: (B, L) -> (z_s (B, D), p_t (B, K))."""
    emb = params["embedding"][ids]                      # (B, L, D)
    ys = emb.sum(axis=-2)                               # (B, D)
    di = jnp.einsum("bld,de,be->bl", emb, params["M"], ys)
    ai = jax.nn.softmax(di, axis=-1)                    # (B, L)
    zs = jnp.einsum("bl,bld->bd", ai, emb)              # (B, D)
    pt = jax.nn.softmax(zs @ params["fc"]["kernel"] + params["fc"]["bias"], axis=-1)
    return zs, pt


def abae_forward(params, pos, neg=None, reg_rate=0.1):
    """pos: (B, L) ids; neg: (B, n_neg, L) ids or None (inference).
    Returns p_t or (p_t, loss).  Reference: abae.py:59-91."""
    zs, pt = _encode(params, pos)
    rs = pt @ params["aspect"]                          # (B, D)
    if neg is None:
        return pt

    neg_emb = params["embedding"][neg]                  # (B, n, L, D)
    neg_zs = neg_emb.sum(axis=-2)                       # (B, n, D)

    def normed(x):
        return x / (EPS + jnp.linalg.norm(x, axis=-1, keepdims=True))

    nzs, nrs, nneg = normed(zs), normed(rs), normed(neg_zs)
    hinge = (1.0 - jnp.sum(nrs * nzs, axis=-1, keepdims=True)
             + jnp.einsum("bd,bnd->bn", nrs, nneg))
    loss = jax.nn.relu(hinge).mean()

    na = normed(params["aspect"])
    penalty = na @ na.T - jnp.eye(na.shape[0])
    loss = loss + reg_rate * jnp.linalg.norm(penalty)
    return pt, loss


def get_aspect_words(params, top=10):
    """Top-k nearest vocabulary words per aspect (abae.py:93-102)."""
    emb = np.asarray(params["embedding"])
    emb = emb / (EPS + np.linalg.norm(emb, axis=-1, keepdims=True))
    out = []
    for asp in np.asarray(params["aspect"]):
        asp = asp / (EPS + np.linalg.norm(asp))
        sims = emb @ asp
        out.append(list(np.argsort(-sims)[:top]))
    return out


def sentences_to_ids(word2vec, sentences, max_length=20):
    return np.asarray(
        [word2vec.sent2indices(s, align_length=max_length) for s in sentences],
        np.int32)


def sample_negatives(n, n_neg, rng):
    """Per-sentence negative indices, excluding self (abae.py:29-33)."""
    negs = rng.integers(0, n, size=(n, n_neg))
    clash = negs == np.arange(n)[:, None]
    negs[clash] = (negs[clash] + 1) % n
    return negs.astype(np.int32)


def train_abae(word2vec, sentences, *, sent_len=20, neg_count=20, batch_size=512,
               aspect_size=14, abae_regular=0.1, learning_rate=1e-3,
               lr_decay=0.99, train_epochs=15, save_path=None, seed=0,
               logger=None, valid=None):
    data = sentences_to_ids(word2vec, sentences, sent_len)
    n = len(data)
    rng = np.random.default_rng(seed)
    params = init_abae(jax.random.PRNGKey(seed), word2vec.embedding, aspect_size)
    tx = optax.scale_by_adam()
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, pos, neg, lr):
        def loss_fn(p):
            _, loss = abae_forward(p, pos, neg, abae_regular)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, jax.tree.map(lambda u: -lr * u, updates))
        return params, opt_state, loss

    n_batches = n // batch_size if n >= batch_size else 0
    for epoch in range(train_epochs):
        lr = learning_rate * (lr_decay ** epoch)
        order = rng.permutation(n)
        negs = sample_negatives(n, neg_count, rng)
        total, count = 0.0, 0
        for bi in range(max(n_batches, 1)):
            idx = order[bi * batch_size:(bi + 1) * batch_size] if n >= batch_size else order
            pos = data[idx]
            neg = data[negs[idx]]               # (B, n_neg, L)
            params, opt_state, loss = step(params, opt_state, pos, neg, lr)
            total += float(loss) * len(idx)
            count += len(idx)
        if logger:
            logger.info(f"Epoch {epoch:3d}; train loss {total / max(count, 1):.6f}")

    if logger:
        for i, words in enumerate(get_aspect_words(params, 10)):
            logger.debug(f"Aspect: {i}: {[word2vec.vocab[k] for k in words]}")
    if save_path:
        from umpr_tpu.train.checkpoint import save_pytree
        save_pytree(save_path, params)
        if logger:
            logger.info(f'Trained model "{save_path}" has been saved.')
    return params


def evaluate_aspects(params, word2vec, tests, test_labels, *, sent_len=20,
                     batch_size=1024, categories=None, aspect_mapping=None,
                     logger=None):
    """Aspect-classification accuracy against human labels (reference
    abae.py:166-188).  The reference interactively asks a human to map each
    learned aspect to a category name via input(); pass `aspect_mapping`
    (list of category indices, one per aspect) to run non-interactively.
    """
    categories = categories or ["Food", "Staff", "Ambience", "Price",
                                "Anecdotes", "Miscellaneous"]
    n_aspects = params["aspect"].shape[0]
    if aspect_mapping is None:
        print("Please choose a category from following list for each aspect.")
        print(dict(enumerate(categories)))
        aspect_mapping = [int(input(f"Input index(0~{len(categories) - 1}) "
                                    f"to aspect {k}:")) for k in range(n_aspects)]
    aspect_words = [categories[i] for i in aspect_mapping]

    data = sentences_to_ids(word2vec, tests, sent_len)
    probs = abae_predict(params, data, batch_size)
    pred = probs.argmax(axis=-1)
    correct = sum(1 for truth, aid in zip(test_labels, pred)
                  if truth == aspect_words[aid])
    acc = correct / max(len(pred), 1)
    (logger.info if logger else print)(f"Accuracy: {acc:.6f}")
    return acc


def abae_predict(params, data, batch_size=1024):
    """Aspect distributions for (N, L) id array."""
    fwd = jax.jit(lambda p, ids: abae_forward(p, ids))
    out = []
    for s in range(0, len(data), batch_size):
        out.append(np.asarray(fwd(params, jnp.asarray(data[s:s + batch_size]))))
    return np.concatenate(out) if out else np.zeros((0, params["aspect"].shape[0]))


def main(argv=None):
    from umpr_tpu.text.vocab import Word2vec
    from umpr_tpu.pretrain.word2vec_train import train_skipgram
    from umpr_tpu.utils.logging import get_logger

    logger = get_logger()
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", type=str, default="")
    parser.add_argument("--train_epochs", type=int, default=15)
    parser.add_argument("--batch_size", type=int, default=512)
    parser.add_argument("--learning_rate", type=float, default=0.001)
    parser.add_argument("--abae_regular", type=float, default=0.1)
    parser.add_argument("--lr_decay", type=float, default=0.99)
    parser.add_argument("--data_dir", type=str, default="dataset/restaurant")
    parser.add_argument("--vocab_size", type=int, default=9000)
    parser.add_argument("--emb_dim", type=int, default=200)
    parser.add_argument("--max_length", type=int, default=20)
    parser.add_argument("--neg_count", type=int, default=20)
    parser.add_argument("--aspect_size", type=int, default=14)
    parser.add_argument("--save_path", type=str, default="pretrain/model/ABAE")
    args = parser.parse_args(argv)
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    train_path = os.path.join(args.data_dir, "train.txt")
    trains = open(train_path).read().splitlines()
    logger.info(f"train sentences: {len(trains)}")

    vocab, vecs, counts = train_skipgram(trains, emb_dim=args.emb_dim,
                                         logger=logger)
    w2v = Word2vec(source="arrays", vocab=vocab, vectors=vecs, counts=counts,
                   vocab_size=args.vocab_size)
    logger.info(f"vocabulary size: {len(w2v)}")
    # save_pytree creates the directory itself; a makedirs(dirname(...))
    # here would crash on a bare filename (dirname == "")
    train_abae(w2v, trains, sent_len=args.max_length, neg_count=args.neg_count,
               batch_size=args.batch_size, aspect_size=args.aspect_size,
               abae_regular=args.abae_regular, learning_rate=args.learning_rate,
               lr_decay=args.lr_decay, train_epochs=args.train_epochs,
               save_path=args.save_path, logger=logger)


if __name__ == "__main__":
    main()
