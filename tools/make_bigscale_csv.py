"""Write a Yelp-scale synthetic CSV corpus DIRECTLY in the preprocessor's
output schema (userID,itemID,review,rating,user_num,item_num) -- for
BASELINE configs 4-5 scale proofs, where generating + preprocessing 8M
raw JSON reviews would double the host cost for no extra coverage (the
preprocessor's bit-parity has its own tests).

    python tools/make_bigscale_csv.py --out /tmp/yelp8m --n_reviews 8021121

Vocabulary/word-length statistics mirror tools/make_synthetic_corpus.py's
realistic mode (Zipf words, 2-3 sentences x 8-14 tokens).  The split is
80/10/10 by row position (the streaming builder only cares about row
volume, history structure, and vocab size).
"""
import argparse
import os

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--out", required=True)
ap.add_argument("--n_reviews", type=int, default=8021121)
ap.add_argument("--users", type=int, default=400000)
ap.add_argument("--items", type=int, default=80000)
ap.add_argument("--vocab", type=int, default=40000)
ap.add_argument("--seed", type=int, default=0)
ap.add_argument("--write_glove", action=argparse.BooleanOptionalAction,
                default=True)  # --no-write_glove skips the embedding dump
args = ap.parse_args()

rng = np.random.default_rng(args.seed)
os.makedirs(args.out, exist_ok=True)

# Zipf word table (syllable words like the realistic generator's)
SYL = ["ba", "ce", "di", "fo", "gu", "ha", "ji", "ko", "lu", "me", "ni",
       "po", "qu", "ru", "se", "ti", "vu", "wa", "xe", "zo"]


def word(i):
    s = []
    i += 17
    while i:
        s.append(SYL[i % len(SYL)])
        i //= len(SYL)
    return "".join(s)


words = np.array([word(i) for i in range(args.vocab)])
zipf_p = 1.0 / np.arange(1, args.vocab + 1)
zipf_p /= zipf_p.sum()

if args.write_glove:
    dim = 50
    with open(os.path.join(args.out, "glove.txt"), "w") as f:
        vecs = rng.standard_normal((args.vocab, dim)).astype(np.float32)
        for w, v in zip(words, vecs):
            f.write(w + " " + " ".join(f"{x:.4f}" for x in v) + "\n")
    print(f"wrote glove.txt ({args.vocab} x {dim})")

n = args.n_reviews
bounds = [int(n * 0.8), int(n * 0.9), n]
names = ["train", "valid", "test"]
files = [open(os.path.join(args.out, f"{nm}.csv"), "w") for nm in names]
for f in files:
    f.write("userID,itemID,review,rating,user_num,item_num\n")

CHUNK = 200000
written = 0
while written < n:
    m = min(CHUNK, n - written)
    users = rng.integers(0, args.users, m)
    items = rng.integers(0, args.items, m)
    ratings = rng.integers(1, 6, m)
    n_sents = rng.integers(2, 4, m)
    rows = []
    # one flat word draw per chunk, sliced per review (fast)
    lens = rng.integers(8, 15, (m, 3))
    total_words = int(lens.sum())
    flat = rng.choice(words, total_words, p=zipf_p)
    pos = 0
    for j in range(m):
        sents = []
        for s in range(n_sents[j]):
            k = int(lens[j, s])
            sents.append(" ".join(flat[pos:pos + k]))
            pos += k
        rows.append(f"U{users[j]},I{items[j]},{' . '.join(sents)},"
                    f"{ratings[j]}.0,{users[j]},{items[j]}\n")
    # split by global row position
    for j, r in enumerate(rows):
        g = written + j
        fi = 0 if g < bounds[0] else (1 if g < bounds[1] else 2)
        files[fi].write(r)
    written += m
    if written % 1000000 < CHUNK:
        print(f"{written}/{n} rows", flush=True)

for f in files:
    f.close()
# photos manifest (JSON-lines records, the preprocessor's format): one
# entry per item so the reference's has-photos retain filter keeps every
# sample (amazon 'unknown'-view semantics); the files don't exist --
# review-only configs never decode, photo configs would zero-fill
with open(os.path.join(args.out, "photos.json"), "w") as f:
    for k in range(args.items):
        f.write('{"business_id":"I%d","photo_id":"p%d",'
                '"imUrl":"http://x/%d.jpg"}\n' % (k, k, k))
print("done:", args.out)
