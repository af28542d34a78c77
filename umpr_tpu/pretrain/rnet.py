"""R-Net pretrainer: sentence-pair matching supervised by ABAE aspect
similarity (reference: pretrain/pretrain_rnet.py).

Pipeline parity (pretrain_rnet.py:84-205):
- ABAE aspect distribution per training sentence;
- for each sentence, sample 20 candidates and keep the most / least cosine-
  similar as positive / negative pairs (early exit at >0.8 / <0.5,
  pretrain_rnet.py:98-127);
- PretrainRNet = frozen embedding + the SAME RNet used by UMPR + a
  sigmoid(Linear(4u -> 1)) head with BCE loss (pretrain_rnet.py:144-169);
- only the RNet submodule is saved (pretrain_rnet.py:171-172) for UMPR's
  warm start (consumed via Config.rnet_pretrained, the analogue of
  RNet(pretrained=...) at reference model.py:30-34);
- Adam with bias-excluded weight decay + per-epoch exponential decay
  (pretrain_rnet.py:181-185).

Intentional deviation (documented, like the double-unsort quirk in
ops/gru.py): the reference's PretrainRNetDataset appends ``len(sent)`` of
the already-padded array as each pair's GRU length, i.e. the constant
``max_length``, so its GRU always runs over the full padded sentence
(pretrain_rnet.py:107-116,136-141).  This pretrainer feeds the TRUE token
counts instead (``(ids != 0).sum()``) — the masked GRU then stops at each
sentence's real end, which matches how the same RNet is driven inside UMPR
and avoids training the warm-start weights on trailing-PAD dynamics.  The
mined pairs and the loss are otherwise identical.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp
import optax

from umpr_tpu.models.layers import init_linear, linear
from umpr_tpu.models.review_net import init_rnet, rnet
from umpr_tpu.ops import masking
from umpr_tpu.train.optim import make_optimizer
from umpr_tpu.pretrain.abae import sentences_to_ids, abae_predict


def mine_pairs(data, probs, rng, sample_k=20, hi=0.8, lo=0.5,
               block_size=8192):
    """For each sentence, find pos/neg partners by aspect-cosine
    (pretrain_rnet.py:98-127).  data: (N, L) ids; probs: (N, K).
    Returns s1, s2, labels arrays (2N, ...).

    Vectorized, blocked implementation of the reference's per-sentence
    scan (random.sample of 20 candidates, running strict max/min, early
    exit once max_cos > hi and min_cos < lo).  The candidate draws keep
    the per-sentence ``rng.choice`` call sequence, and the early-exit /
    first-occurrence-tie / skip-on-None semantics are reproduced with
    prefix scans, so the mined pairs match the straightforward loop for a
    fixed seed (tests/test_pretrain.py) while the cosine work runs as
    blocked einsums -- ~40x faster on corpus-scale inputs (the loop's
    ~190 us/sentence would be half an hour at Yelp sentence counts)."""
    probs = np.ascontiguousarray(probs)
    norms = np.linalg.norm(probs, axis=-1)
    n = len(data)
    if n == 0:
        return data[:0], data[:0], np.zeros(0, np.float32)
    k = min(sample_k, n)
    # same rng call sequence as the reference-shaped loop: one
    # choice(n, k, replace=False) per sentence, in sentence order
    cand = np.empty((n, k), np.int64)
    for i in range(n):
        cand[i] = rng.choice(n, size=k, replace=False)

    s1_idx, s2_idx, lab = [], [], []
    pos_col = np.arange(k)
    for lo_i in range(0, n, block_size):
        blk = slice(lo_i, min(lo_i + block_size, n))
        rows = np.arange(blk.start, blk.stop)
        cb = cand[blk]                                   # (B, k)
        # accumulate in the probs dtype (promoted to at least f32), exactly
        # like the loop's np.dot -- forcing f32 on f64 inputs could flip
        # strict > / < comparisons near the hi/lo thresholds
        cos = np.einsum("bkd,bd->bk", probs[cb], probs[blk],
                        dtype=np.result_type(probs.dtype, np.float32))
        cos = cos / (norms[blk][:, None] * norms[cb] + 1e-12)
        is_self = cb == rows[:, None]
        # running strict max/min over the candidate scan; self rows are
        # skipped exactly like the loop's `continue`
        run_max = np.maximum.accumulate(np.where(is_self, -np.inf, cos), 1)
        run_min = np.minimum.accumulate(np.where(is_self, np.inf, cos), 1)
        done = (run_max > hi) & (run_min < lo)
        # first index where the loop would break (inclusive: the breaking
        # candidate was processed); k-1 when it never breaks
        t_star = np.where(done.any(1), done.argmax(1), k - 1)
        in_prefix = (pos_col[None, :] <= t_star[:, None]) & ~is_self
        pm = np.where(in_prefix, cos, -np.inf)
        nm = np.where(in_prefix, cos, np.inf)
        best_pos, best_neg = pm.argmax(1), nm.argmin(1)
        # the loop only records a partner on a STRICT improvement over the
        # initial sentinels (-1.0 / 1.0); otherwise the sentence is skipped
        ok = (pm[np.arange(len(rows)), best_pos] > -1.0) & \
             (nm[np.arange(len(rows)), best_neg] < 1.0)
        for r in np.nonzero(ok)[0]:
            i = rows[r]
            s1_idx += [i, i]
            s2_idx += [cb[r, best_pos[r]], cb[r, best_neg[r]]]
            lab += [1.0, 0.0]
    return data[s1_idx], data[s2_idx], np.asarray(lab, np.float32)


def mine_pairs_hard(data, probs, rng, min_category=5):
    """Hard-label variant (reference PretrainRNetDataset_bak,
    pretrain_rnet.py:29-81): bucket sentences by argmax aspect, sample a
    positive from the same bucket and a negative from another bucket."""
    labels_by_cat = {}
    assign = probs.argmax(axis=-1)
    for i, c in enumerate(assign):
        labels_by_cat.setdefault(int(c), []).append(i)
    labels_by_cat = {c: v for c, v in labels_by_cat.items() if len(v) >= min_category}
    cats = list(labels_by_cat)
    s1, s2, y = [], [], []
    if len(cats) < 2:
        return data[s1], data[s2], np.asarray(y, np.float32)
    for c, members in labels_by_cat.items():
        for i in members:
            pos = i
            while pos == i:
                pos = members[rng.integers(len(members))]
            other = c
            while other == c:
                other = cats[rng.integers(len(cats))]
            neg = labels_by_cat[other][rng.integers(len(labels_by_cat[other]))]
            s1 += [i, i]; s2 += [pos, neg]; y += [1.0, 0.0]
    return data[s1], data[s2], np.asarray(y, np.float32)


def init_pretrain_rnet(key, word_emb, gru_size):
    word_emb = np.asarray(word_emb, np.float32)
    k1, k2 = jax.random.split(key)
    return {
        "embedding": jnp.asarray(word_emb),
        "rnet": init_rnet(k1, word_emb.shape[1], gru_size),
        "linear": init_linear(k2, gru_size * 4, 1),
    }


def pretrain_rnet_forward(params, u_ids, u_len, i_ids, i_len, labels):
    """Single-sentence pairs viewed as (B, 1, L) reviews through RNet
    (pretrain_rnet.py:155-169)."""
    B, L = u_ids.shape
    emb = params["embedding"]
    u_emb = emb[u_ids][:, None]            # (B, 1, L, D)
    i_emb = emb[i_ids][:, None]
    Lb = masking.batch_max_length(u_len, i_len)
    exists = masking.exists_mask(jnp.int32(1), Lb, 1, L)
    both = jnp.concatenate([u_emb, i_emb], axis=0)  # (2B, 1, L, D)
    _, _, _, _, _, att_u, att_i = rnet(params["rnet"], both,
                                       u_len[:, None], i_len[:, None],
                                       exists)
    att = jnp.concatenate([att_u, att_i], axis=-1)
    prob = jax.nn.sigmoid(linear(params["linear"], att))[:, 0]
    prob = jnp.clip(prob, 1e-7, 1 - 1e-7)
    loss = -jnp.mean(labels * jnp.log(prob) + (1 - labels) * jnp.log(1 - prob))
    return prob, loss


def pretrain_r_net(word2vec, sentences, abae_params, save_path, *,
                   gru_size=64, max_length=20, batch_size=1024,
                   learning_rate=0.01, lr_decay=0.99, l2_regularization=1e-3,
                   train_epochs=10, seed=0, logger=None):
    data = sentences_to_ids(word2vec, sentences, max_length)
    probs = abae_predict(abae_params, data)
    rng = np.random.default_rng(seed)
    s1, s2, labels = mine_pairs(data, probs, rng)

    params = init_pretrain_rnet(jax.random.PRNGKey(seed),
                                word2vec.embedding, gru_size)
    tx = make_optimizer(l2_regularization)
    trainable = {k: v for k, v in params.items() if k != "embedding"}
    opt_state = tx.init(trainable)
    frozen = {"embedding": params["embedding"]}

    @jax.jit
    def step(trainable, opt_state, b, lr):
        def loss_fn(tr):
            p = {**tr, **frozen}
            _, loss = pretrain_rnet_forward(p, b["s1"], b["l1"], b["s2"],
                                            b["l2"], b["y"])
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(
            trainable, jax.tree.map(lambda u: -lr * u, updates))
        return trainable, opt_state, loss

    # lengths arrays aligned with the mined pairs
    sent_len = lambda ids: np.maximum((ids != 0).sum(-1), 1).astype(np.int32)
    l1_all, l2_all = sent_len(s1), sent_len(s2)

    n = len(s1)
    nb = max(n // batch_size, 1) if n else 0
    if logger:
        logger.info(f"Start to train R net. ({n} pairs)")
    for epoch in range(train_epochs):
        lr = learning_rate * (lr_decay ** epoch)
        order = rng.permutation(n)
        total, count = 0.0, 0
        for bi in range(nb):
            idx = order[bi * batch_size:(bi + 1) * batch_size]
            if len(idx) == 0:
                continue
            b = {"s1": jnp.asarray(s1[idx]), "l1": jnp.asarray(l1_all[idx]),
                 "s2": jnp.asarray(s2[idx]), "l2": jnp.asarray(l2_all[idx]),
                 "y": jnp.asarray(labels[idx])}
            trainable, opt_state, loss = step(trainable, opt_state, b, lr)
            total += float(loss) * len(idx)
            count += len(idx)
        if logger:
            logger.info(f"Epoch {epoch:3d}; train loss {total / max(count, 1):.6f}")

    from umpr_tpu.train.checkpoint import save_pytree
    save_pytree(save_path, trainable["rnet"])  # only the RNet submodule
    if logger:
        logger.info(f"End of Training. Saving R-Net to {save_path}.")
    return {**trainable, **frozen}


def main(argv=None):
    import pandas as pd
    from umpr_tpu.text.vocab import Word2vec
    from umpr_tpu.pretrain.word2vec_train import train_skipgram
    from umpr_tpu.pretrain.abae import train_abae
    from umpr_tpu.train.checkpoint import restore_pytree
    from umpr_tpu.utils.logging import get_logger

    logger = get_logger()
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", type=str, default="")
    parser.add_argument("--train_epochs", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=1024)
    parser.add_argument("--learning_rate", type=float, default=0.01)
    parser.add_argument("--lr_decay", type=float, default=0.99)
    parser.add_argument("--l2_regularization", type=float, default=1e-3)
    parser.add_argument("--vocab_size", type=int, default=9000)
    parser.add_argument("--emb_dim", type=int, default=50)
    parser.add_argument("--max_length", type=int, default=20)
    parser.add_argument("--aspect_size", type=int, default=14)
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--gru_size", type=int, default=64)
    parser.add_argument("--save_ABAE", type=str, default="pretrain/model/trained_ABAE_rnet")
    parser.add_argument("--save_rnet", type=str, default="pretrain/model/pretraining_rnet")
    args = parser.parse_args(argv)
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    trains = pd.read_csv(os.path.join(args.data_dir, "train.csv"))["review"].to_list()
    trains = [s.strip() for review in trains for s in str(review).split(".")
              if len(s) > 10]

    vocab, vecs, counts = train_skipgram(trains, emb_dim=args.emb_dim, logger=logger)
    w2v = Word2vec(source="arrays", vocab=vocab, vectors=vecs, counts=counts,
                   vocab_size=args.vocab_size)

    if not os.path.exists(os.path.join(args.save_ABAE, "arrays.npz")):
        logger.info(f'Start to train ABAE! No such file "{args.save_ABAE}".')
        abae_params = train_abae(
            w2v, trains, sent_len=20, neg_count=20, batch_size=512,
            aspect_size=args.aspect_size, abae_regular=0.1, learning_rate=1e-3,
            lr_decay=0.99, train_epochs=15, save_path=args.save_ABAE, logger=logger)
    else:
        from umpr_tpu.pretrain.abae import init_abae
        # kmeans=False: this is only a shape template; restore_pytree
        # replaces every value, so the reference's KMeans init would be
        # minutes of wasted clustering at large vocabs
        like = init_abae(jax.random.PRNGKey(0), w2v.embedding,
                         args.aspect_size, kmeans=False)
        abae_params = restore_pytree(args.save_ABAE, like)

    pretrain_r_net(w2v, trains, abae_params, args.save_rnet,
                   gru_size=args.gru_size, max_length=args.max_length,
                   batch_size=args.batch_size, learning_rate=args.learning_rate,
                   lr_decay=args.lr_decay, l2_regularization=args.l2_regularization,
                   train_epochs=args.train_epochs, logger=logger)


if __name__ == "__main__":
    main()
