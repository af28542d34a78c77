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
    args = ap.parse_args(argv)

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
