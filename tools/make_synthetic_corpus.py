"""Generate a synthetic Amazon- or Yelp-style corpus for end-to-end runs.

The real UMPR corpora (Amazon Music/CSJ, Yelp) are not shipped in this
environment; this produces raw dumps + photos + a GloVe-format embedding
file at any scale, ready for the full pipeline:

    python tools/make_synthetic_corpus.py --out /tmp/corpus --users 300 \
        --items 40 --reviews_per_user 10 [--style yelp] [--photos]
    python -m umpr_tpu.text.preprocess --data_path /tmp/corpus/reviews.json \
        --meta_path /tmp/corpus/meta.json --save_dir /tmp/corpus
    python main.py --data_dir /tmp/corpus --word2vec_file /tmp/corpus/glove.txt ...

Used by the round-1 verification runs recorded in PARITY.md / NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import random

import numpy as np

WORDS = ("great sound quality album terrible loved fantastic song guitar "
         "drums vocals melody lyric beat bass mix production classic modern "
         "epic boring catchy smooth raw live studio remix cover acoustic "
         "pasta pizza salad decor patio cozy waiter service drink cocktail "
         "wine beer ambiance music noisy quiet spicy sweet fresh stale").split()

YELP_VIEWS = ["food", "inside", "outside", "drink"]

# ---------------------------------------------------------------------------
# Realistic mode (--realistic): Music-small-scale corpora with heavy-tailed
# user/item activity, a GloVe-sized synthetic vocabulary, and ratings drawn
# from a latent user/item-bias model whose sentiment leaks into the review
# text -- so a review-text model has real signal to learn and converged test
# MSE is dominated by the (stable) irreducible noise, not by init randomness.
# Used for the scaled MSE-parity runs vs the reference oracle (PARITY.md).
# ---------------------------------------------------------------------------

_SYLLABLES = [c + v for c in "bcdfghjklmnprstvwz" for v in "aeiou"]


def _make_vocab(nprng, n, forbidden):
    """n distinct pronounceable non-stopword lowercase words."""
    words, seen = [], set(forbidden)
    while len(words) < n:
        k = int(nprng.integers(2, 5))
        w = "".join(nprng.choice(_SYLLABLES, k))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def _zipf_probs(n, a):
    p = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** a
    return p / p.sum()


def realistic(args):
    """Write an amazon-style corpus of ~args.n_reviews reviews."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from umpr_tpu.text.stoplists import STOP_WORDS

    nprng = np.random.default_rng(args.seed)
    U, I, N = args.users, args.items, args.n_reviews

    # each (user, item) pair is written at most once; the sampler would
    # otherwise spin forever once every pair has been seen
    if N > U * I:
        raise SystemExit(
            f"--realistic needs n_reviews <= users*items unique pairs; got "
            f"{N} > {U}*{I}={U * I}. Raise --users/--items (the recorded "
            f"scale-parity run used --users 5541 --items 3568).")
    if args.vocab_size < 350:
        raise SystemExit(
            f"--realistic reserves vocab[:300] for sentiment lexicons and "
            f"draws 30-word topics from the rest; --vocab_size {args.vocab_size} "
            f"leaves too few content words (need >= 350).")

    vocab = _make_vocab(nprng, args.vocab_size, STOP_WORDS)
    pos_lex = vocab[:150]
    neg_lex = vocab[150:300]
    content = vocab[300:]
    content_p = _zipf_probs(len(content), 1.05)
    # each item talks about its own 30-word topic 60% of the time
    topics = nprng.choice(len(content), size=(I, 30), p=content_p)

    # heavy-tailed activity; identity permuted so id order carries no signal
    user_p = _zipf_probs(U, 0.85)[nprng.permutation(U)]
    item_p = _zipf_probs(I, 0.95)[nprng.permutation(I)]
    b_u = nprng.normal(0.0, 0.55, U)
    b_i = nprng.normal(0.0, 0.55, I)

    def write_review(f, u, it, text, stars):
        if args.style == "yelp":
            f.write(json.dumps({"user_id": f"U{u}", "business_id": f"I{it}",
                                "text": text, "stars": stars}) + "\n")
        else:
            f.write(repr({"reviewerID": f"U{u}", "asin": f"I{it}",
                          "reviewText": text, "overall": stars}) + "\n")

    seen_pairs = set()
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "reviews.json"), "w") as f:
        written = 0
        while written < N:
            draw = N - written
            us = nprng.choice(U, size=draw, p=user_p)
            its = nprng.choice(I, size=draw, p=item_p)
            for u, it in zip(us, its):
                u, it = int(u), int(it)
                if (u, it) in seen_pairs:
                    continue
                seen_pairs.add((u, it))
                score = 3.4 + b_u[u] + b_i[it] + nprng.normal(0.0, 0.4)
                stars = float(min(5, max(1, round(score))))
                s = (stars - 3.0) / 2.0  # sentiment strength in [-1, 1]
                lex = pos_lex if s >= 0 else neg_lex
                anti = neg_lex if s >= 0 else pos_lex
                sents = []
                for _ in range(int(nprng.integers(3, 8))):
                    n_words = int(nprng.integers(7, 17))
                    n_senti = int(nprng.binomial(4, min(0.95, abs(s) * 0.75 + 0.08)))
                    n_senti = min(n_senti, n_words - 6)
                    words = []
                    for _ in range(n_words - n_senti):
                        if nprng.random() < 0.6:
                            words.append(content[int(topics[it][nprng.integers(30)])])
                        else:
                            words.append(content[int(nprng.choice(len(content), p=content_p))])
                    for _ in range(n_senti):
                        pool = lex if nprng.random() < 0.9 else anti
                        words.append(pool[int(nprng.integers(len(pool)))])
                    nprng.shuffle(words)
                    sents.append(" ".join(words))
                text = ". ".join(sents) + "."
                write_review(f, u, it, text, stars)
                written += 1

    if args.style == "yelp":
        # yelp ships a view-labeled photos.json directly (the reference's
        # yelp photos dataset manifest); 2 photos per view per item
        with open(os.path.join(args.out, "photos.json"), "w") as f:
            for it in range(I):
                for v in YELP_VIEWS:
                    for k in range(2):
                        f.write(json.dumps({"business_id": f"I{it}",
                                            "photo_id": f"I{it}_{v}_{k}",
                                            "label": v}) + "\n")
        if args.photos:
            import cv2
            pdir = os.path.join(args.out, "photos")
            os.makedirs(pdir, exist_ok=True)
            for it in range(I):
                # per-item base color carries the item's latent bias so the
                # visual net has real (if weak) signal, plus per-photo noise
                base = np.clip(128 + 80 * b_i[it] / 0.55, 20, 235)
                for v in YELP_VIEWS:
                    for k in range(2):
                        img = np.clip(base + nprng.normal(0, 40, (64, 80, 3)),
                                      0, 255).astype(np.uint8)
                        cv2.imwrite(os.path.join(pdir, f"I{it}_{v}_{k}.jpg"),
                                    img)
    else:
        with open(os.path.join(args.out, "meta.json"), "w") as f:
            for it in range(I):
                f.write(repr({"asin": f"I{it}",
                              "imUrl": f"http://x/{it}.jpg"}) + "\n")

    if args.write_glove:
        # random frozen embeddings are sufficient for parity runs (both
        # frameworks share the table); word2vec_train is the trained-
        # embedding path used by the 65k UMPR-R run
        with open(os.path.join(args.out, "glove.txt"), "w") as f:
            for w in vocab:
                vec = nprng.standard_normal(args.emb_dim)
                f.write(w + " " + " ".join(f"{x:.4f}" for x in vec) + "\n")

    print(f"Wrote realistic corpus: {N} reviews, {U} users, {I} items, "
          f"vocab {len(vocab)} to {args.out}")


def aspect_corpus(args):
    """Amazon-style corpus with PLANTED aspect structure (--aspect_corpus):
    K latent aspects, each with its own topic vocabulary and its own
    positive/negative sentiment lexicon; every item carries a per-aspect
    quality; each sentence talks about ONE aspect using that aspect's topic
    words plus sentiment words matching the item's quality on it; the
    rating is driven by the qualities of the aspects the review mentions.

    This is the corpus the ABAE -> R-Net pretraining pipeline (reference
    pretrain/abae.py, pretrain_rnet.py) assumes exists: sentences cluster
    by aspect in embedding space (so ABAE's KMeans-initialized aspect
    matrix has something to find), and aspect-conditional sentiment words
    predict the label (so an R-Net warm-started on aspect-pair
    discrimination starts with useful text features).  The round-3
    warm-start exercise used sentiment lexicons UNcorrelated with topics,
    giving ABAE near-random aspects and a warm start that injected noise
    (PARITY.md); this generator exists to measure the warm start where the
    subsystem's premise holds."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from umpr_tpu.text.stoplists import STOP_WORDS

    nprng = np.random.default_rng(args.seed)
    U, I, N, K = args.users, args.items, args.n_reviews, args.aspects
    if N > U * I:
        raise SystemExit(f"need n_reviews <= users*items; got {N} > {U * I}")

    TOPIC_W, SENT_W, FILLER_W = 40, 25, 150
    need = K * (TOPIC_W + 2 * SENT_W) + FILLER_W
    vocab = _make_vocab(nprng, need, STOP_WORDS)
    pos = [vocab[k * SENT_W:(k + 1) * SENT_W] for k in range(K)]
    off = K * SENT_W
    neg = [vocab[off + k * SENT_W:off + (k + 1) * SENT_W] for k in range(K)]
    off += K * SENT_W
    topics = [vocab[off + k * TOPIC_W:off + (k + 1) * TOPIC_W] for k in range(K)]
    filler = vocab[off + K * TOPIC_W:]

    # per-item aspect qualities in [0,1] and aspect salience
    quality = nprng.uniform(0.0, 1.0, (I, K))
    salience = nprng.dirichlet(np.full(K, 1.2), I)
    b_u = nprng.normal(0.0, 0.25, U)
    user_p = _zipf_probs(U, 0.85)[nprng.permutation(U)]
    item_p = _zipf_probs(I, 0.95)[nprng.permutation(I)]

    seen = set()
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "reviews.json"), "w") as f:
        written = 0
        while written < N:
            us = nprng.choice(U, size=N - written, p=user_p)
            its = nprng.choice(I, size=N - written, p=item_p)
            for u, it in zip(us, its):
                u, it = int(u), int(it)
                if (u, it) in seen:
                    continue
                seen.add((u, it))
                n_sent = int(nprng.integers(3, 8))
                aspects = nprng.choice(K, size=n_sent, p=salience[it])
                sents = []
                for a in aspects:
                    q = float(np.clip(quality[it, a]
                                      + nprng.normal(0, 0.1), 0, 1))
                    n_words = int(nprng.integers(8, 17))
                    n_senti = int(nprng.integers(2, 5))
                    lex = pos[a] if q >= 0.5 else neg[a]
                    anti = neg[a] if q >= 0.5 else pos[a]
                    words = []
                    for _ in range(n_words - n_senti):
                        src = topics[a] if nprng.random() < 0.65 else filler
                        words.append(src[int(nprng.integers(len(src)))])
                    # sentiment-word polarity purity scales with |q - 0.5|
                    p_right = 0.55 + 0.9 * abs(q - 0.5)
                    for _ in range(n_senti):
                        pool = lex if nprng.random() < p_right else anti
                        words.append(pool[int(nprng.integers(len(pool)))])
                    nprng.shuffle(words)
                    sents.append(" ".join(words))
                mean_q = float(np.mean(quality[it, aspects]))
                score = 1.0 + 4.0 * mean_q + b_u[u] + nprng.normal(0, 0.25)
                stars = float(min(5, max(1, round(score))))
                f.write(repr({"reviewerID": f"U{u}", "asin": f"I{it}",
                              "reviewText": ". ".join(sents) + ".",
                              "overall": stars}) + "\n")
                written += 1

    with open(os.path.join(args.out, "meta.json"), "w") as f:
        for it in range(I):
            f.write(repr({"asin": f"I{it}",
                          "imUrl": f"http://x/{it}.jpg"}) + "\n")
    print(f"Wrote aspect corpus: {N} reviews, {U} users, {I} items, "
          f"{K} aspects, vocab {len(vocab)} to {args.out}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--users", type=int, default=300)
    ap.add_argument("--items", type=int, default=40)
    ap.add_argument("--reviews_per_user", type=int, default=10)
    ap.add_argument("--style", choices=["amazon", "yelp"], default="amazon")
    ap.add_argument("--photos", action="store_true",
                    help="also write decodable JPEGs (requires cv2)")
    ap.add_argument("--emb_dim", type=int, default=50)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--realistic", action="store_true",
                    help="Music-small-scale amazon corpus: Zipf user/item "
                         "activity, latent-bias ratings, sentiment-correlated "
                         "text, GloVe-sized vocab (no glove.txt written -- "
                         "train embeddings with umpr_tpu.pretrain.word2vec_train)")
    ap.add_argument("--n_reviews", type=int, default=65000)
    ap.add_argument("--vocab_size", type=int, default=5000)
    ap.add_argument("--write_glove", action="store_true",
                    help="with --realistic: also write glove.txt with "
                         "random emb_dim-d vectors for the whole vocab")
    ap.add_argument("--aspect_corpus", action="store_true",
                    help="amazon-style corpus with planted aspect structure "
                         "(K topics x aspect-specific sentiment lexicons) "
                         "for pretraining-value experiments; embeddings via "
                         "tools/train_embeddings.py")
    ap.add_argument("--aspects", type=int, default=6)
    args = ap.parse_args(argv)

    if args.aspect_corpus:
        aspect_corpus(args)
        return
    if args.realistic:
        realistic(args)
        return

    os.makedirs(args.out, exist_ok=True)
    rng = random.Random(args.seed)
    nprng = np.random.default_rng(args.seed)

    with open(os.path.join(args.out, "reviews.json"), "w") as f:
        for u in range(args.users):
            k = min(args.reviews_per_user, args.items)
            for it in rng.sample(range(args.items), k):
                sents = [" ".join(rng.choices(WORDS, k=rng.randint(6, 14)))
                         for _ in range(rng.randint(2, 5))]
                text = ". ".join(sents) + "."
                stars = float(rng.randint(1, 5))
                if args.style == "amazon":
                    f.write(repr({"reviewerID": f"U{u}", "asin": f"I{it}",
                                  "reviewText": text, "overall": stars}) + "\n")
                else:
                    f.write(json.dumps({"user_id": f"U{u}",
                                        "business_id": f"I{it}",
                                        "text": text, "stars": stars}) + "\n")

    if args.style == "amazon":
        with open(os.path.join(args.out, "meta.json"), "w") as f:
            for it in range(args.items):
                f.write(repr({"asin": f"I{it}",
                              "imUrl": f"http://x/{it}.jpg"}) + "\n")
    else:
        # yelp ships photos.json directly (with view labels)
        with open(os.path.join(args.out, "photos.json"), "w") as f:
            for it in range(args.items):
                for v in YELP_VIEWS:
                    for k in range(2):
                        f.write(json.dumps({"business_id": f"I{it}",
                                            "photo_id": f"I{it}_{v}_{k}",
                                            "label": v}) + "\n")

    with open(os.path.join(args.out, "glove.txt"), "w") as f:
        for w in sorted(set(WORDS)):
            vec = nprng.standard_normal(args.emb_dim)
            f.write(w + " " + " ".join(f"{x:.4f}" for x in vec) + "\n")

    if args.photos:
        import cv2
        pdir = os.path.join(args.out, "photos")
        os.makedirs(pdir, exist_ok=True)
        if args.style == "yelp":
            pids = [f"I{it}_{v}_{k}" for it in range(args.items)
                    for v in YELP_VIEWS for k in range(2)]
        else:
            pids = []  # amazon pids are assigned by the preprocessor (uuid)
        for pid in pids:
            img = nprng.integers(0, 255, (260, 340, 3)).astype(np.uint8)
            cv2.imwrite(os.path.join(pdir, pid + ".jpg"), img)

    print(f"Wrote {args.style} corpus ({args.users}x{args.reviews_per_user} "
          f"reviews, {args.items} items) to {args.out}")
    if args.style == "amazon" and args.photos:
        print("Note: amazon photo ids are minted by the preprocessor; run it "
              "first, then create jpgs named after photos.json photo_id values.")


if __name__ == "__main__":
    main()
