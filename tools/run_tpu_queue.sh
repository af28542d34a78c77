#!/bin/bash
# One-shot TPU validation queue: run when the TPU attachment comes back.
# Order matters (each warms the compile cache for the next; the 1-vCPU
# host must never run two TPU processes concurrently).
#
#   bash tools/run_tpu_queue.sh [outdir]
#
# 1. Kernel numerics validation on hardware (exit-code gated)
# 2. bench.py (headline + full-UMPR + throughput modes; re-warms .jax_cache
#    for the driver's end-of-round run)
# 3. UMPR-R step profile attribution
# 4. through-trainer dispatch A/B
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_queue}"
mkdir -p "$OUT"
export PYTHONPATH="$PWD:/root/.axon_site"

echo "== 1/4 kernel validation =="
timeout 2400 python -u tools/validate_kernels_tpu.py \
    2>&1 | tee "$OUT/validate.log"

echo "== 2/4 bench.py =="
timeout 3600 python -u bench.py 2>&1 | tee "$OUT/bench.log"

echo "== 3/4 UMPR-R profile =="
timeout 2400 python -u tools/profile_step.py --review_only --dtype float32 \
    --trace_dir "$OUT/trace" 2>&1 | tee "$OUT/profile.log"

echo "== 4/4 through-trainer dispatch A/B (chunk-RNG fix) =="
# epoch elapsed_s lands in metrics.jsonl; compare k=1 vs k=10 deltas
python tools/make_synthetic_corpus.py --out "$OUT/corpus" --users 600
python -m umpr_tpu.text.preprocess --data_path "$OUT/corpus/reviews.json" \
    --meta_path "$OUT/corpus/meta.json" --save_dir "$OUT/corpus" \
    --train_rate 0.8
for k in 1 10; do
    timeout 1800 python -u main.py --data_dir "$OUT/corpus" \
        --word2vec_file "$OUT/corpus/glove.txt" --review_net_only True \
        --train_epochs 3 --eval_every 1000000 --min_sent_count 1 \
        --cache_dataset True --steps_per_dispatch "$k" \
        --metrics_jsonl "$OUT/trainer_k$k.jsonl" \
        --model_path "$OUT/model_k$k" --log_path "$OUT/trainer_k$k.log" \
        2>&1 | tail -3 | tee -a "$OUT/trainer_ab.log"
done
python - "$OUT" <<'EOF'
import json, sys
for k in (1, 10):
    recs = [json.loads(l) for l in open(f"{sys.argv[1]}/trainer_k{k}.jsonl")]
    ep = [r for r in recs if r["event"] == "epoch"]
    if len(ep) >= 2:  # skip epoch 0 (compile)
        dt = ep[-1]["elapsed_s"] - ep[0]["elapsed_s"]
        print(f"k={k}: {dt:.2f}s for {len(ep)-1} steady-state epochs")
EOF

echo "== queue done; logs in $OUT =="
