#!/bin/bash
# Pretraining-value experiment (VERDICT r3 #4): on a corpus with PLANTED
# aspect structure (tools/make_synthetic_corpus.py --aspect_corpus), show
# the ABAE -> R-Net warm start (--rnet_pretrained) beating cold start on
# early-epoch valid MSE under matched conditions (same seed -> same init,
# same batch order; the only difference is the R-Net initialization).
#
#   bash tools/run_pretrain_value.sh [workdir] 2>&1 | tee /tmp/pretrain_value.log
#
# Round 3's negative result (PARITY.md): on a corpus whose sentiment words
# are topic-UNcorrelated, ABAE aspects are near-random and the warm start
# hurt (0.6988 vs 0.489).  Here the corpus satisfies the subsystem's
# premise, so this measures the warm start where it is supposed to work.
set -u
cd "$(dirname "$0")/.."
D="${1:-/tmp/asp12k}"
mkdir -p log

echo "== corpus =="
python tools/make_synthetic_corpus.py --out "$D" --aspect_corpus \
    --n_reviews 12000 --users 1200 --items 300 --aspects 6 --seed 31
python -m umpr_tpu.text.preprocess --data_path "$D/reviews.json" \
    --meta_path "$D/meta.json" --save_dir "$D"

echo "== shared SGNS embeddings =="
timeout 3600 python -u tools/train_embeddings.py --data_dir "$D"

echo "== ABAE + R-Net pretraining =="
timeout 5400 python -u -m umpr_tpu.pretrain.rnet --data_dir "$D" \
    --aspect_size 6 --save_ABAE "$D/abae" --save_rnet "$D/rnet" \
    2>&1 | tail -8

COMMON=(--data_dir "$D" --word2vec_file "$D/glove.txt"
        --review_net_only True --learning_rate 0.003 --train_epochs 8
        --eval_every 50 --seed 2 --cache_dataset True)

echo "== cold start =="
timeout 5400 python -u main.py "${COMMON[@]}" \
    --metrics_jsonl "$D/cold.jsonl" --model_path "$D/model_cold" \
    --log_path "$D/cold.log" 2>&1 | tail -3

echo "== warm start (--rnet_pretrained) =="
timeout 5400 python -u main.py "${COMMON[@]}" \
    --rnet_pretrained "$D/rnet" \
    --metrics_jsonl "$D/warm.jsonl" --model_path "$D/model_warm" \
    --log_path "$D/warm.log" 2>&1 | tail -3

echo "== comparison =="
python - "$D" <<'EOF'
import json, sys
d = sys.argv[1]
def curve(p):
    rows = [json.loads(l) for l in open(p)]
    return ([(r["batch"], r["valid_mse"]) for r in rows if r["event"] == "eval"],
            [r.get("test_mse") for r in rows if r["event"] == "test"])
cold, ct = curve(f"{d}/cold.jsonl")
warm, wt = curve(f"{d}/warm.jsonl")
print(f"{'batch':>6} {'cold':>10} {'warm':>10}")
for (b, c), (_, w) in zip(cold, warm):
    print(f"{b:6d} {c:10.4f} {w:10.4f} {'  <- warm better' if w < c else ''}")
print("test:", ct, wt)
EOF
echo "== pretrain-value done =="
