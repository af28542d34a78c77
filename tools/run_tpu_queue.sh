#!/bin/bash
# One-shot TPU validation queue: run when the TPU attachment comes back.
# Order matters (each warms the compile cache for the next; the 1-vCPU
# host must never run two TPU processes concurrently).
#
#   bash tools/run_tpu_queue.sh [outdir]
#
# 1. GRU kernel A/B (validates the xg-layout rework on hardware)
# 2. bench.py (headline + full-UMPR + throughput modes; re-warms .jax_cache
#    for the driver's end-of-round run)
# 3. UMPR-R step profile attribution (boundary-copy share after the rework)
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_queue}"
mkdir -p "$OUT"
export PYTHONPATH="$PWD:/root/.axon_site"

echo "== 1/3 GRU kernel A/B =="
timeout 2400 python -u tools/bench_kernels.py --which gru --iters 30 \
    2>&1 | tee "$OUT/gru_ab.log"

echo "== 2/3 bench.py =="
timeout 3600 python -u bench.py 2>&1 | tee "$OUT/bench.log"

echo "== 3/3 UMPR-R profile =="
timeout 2400 python -u tools/profile_step.py --review_only --dtype float32 \
    --trace_dir "$OUT/trace" 2>&1 | tee "$OUT/profile.log"

echo "== queue done; logs in $OUT =="
