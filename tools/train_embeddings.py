"""Train corpus word embeddings (SGNS) and write them as a word2vec-text
file consumable by --word2vec_file.

The reference trains gensim Word2Vec in-situ inside its pretraining
scripts (reference pretrain/pretrain_rnet.py:237-240); our pretrainers do
the same via umpr_tpu.pretrain.word2vec_train.train_skipgram.  The MAIN
model, however, takes its table from --word2vec_file -- for a warm-started
R-Net to transfer, main.py must embed words with the SAME vectors the
pretrainers trained against.  This tool runs the one shared skipgram pass
and writes it most-frequent-first with a word2vec header, which
Word2vec(...) loads with the reference's sort-by-frequency + truncation
semantics (reference src/word2vec.py:54-64).

    python tools/train_embeddings.py --data_dir /tmp/corpus \
        [--out /tmp/corpus/glove.txt] [--emb_dim 50] [--min_count 10]
"""
import argparse
import os
import sys

sys.path.insert(0, ".")  # run from repo root


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True,
                    help="directory holding train.csv (the preprocessor's "
                         "output); embeddings are trained on its sentences")
    ap.add_argument("--out", default=None,
                    help="output path (default <data_dir>/glove.txt)")
    ap.add_argument("--emb_dim", type=int, default=50)
    ap.add_argument("--min_count", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import pandas as pd

    from umpr_tpu.pretrain.word2vec_train import train_skipgram
    from umpr_tpu.utils.logging import get_logger

    logger = get_logger(logger_name="train-embeddings")
    # the same sentence slicing as the pretrainers (umpr_tpu/pretrain/rnet.py)
    trains = pd.read_csv(os.path.join(args.data_dir, "train.csv"))["review"]
    trains = [s.strip() for review in trains.to_list()
              for s in str(review).split(".") if len(s) > 10]
    vocab, vecs, counts = train_skipgram(
        trains, emb_dim=args.emb_dim, min_count=args.min_count,
        epochs=args.epochs, logger=logger)

    out = args.out or os.path.join(args.data_dir, "glove.txt")
    order = np.argsort(-np.asarray(counts), kind="stable")
    with open(out, "w") as f:
        f.write(f"{len(order)} {args.emb_dim}\n")
        for i in order:
            f.write(vocab[i] + " "
                    + " ".join(f"{x:.6f}" for x in vecs[i]) + "\n")
    print(f"Wrote {len(order)} x {args.emb_dim} embeddings to {out}")


if __name__ == "__main__":
    main()
