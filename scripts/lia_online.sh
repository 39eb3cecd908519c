#!/usr/bin/env bash
# Online (latency, b=1) suite — parity with the reference's
# examples/cpu/inference/python/llm/scripts/lia_online.sh:13-41
# (in∈{32,256,2016} × out∈{32,256}; resident-% sweep).
set -e
cd "$(dirname "$0")/.."
MODEL=${MODEL:-opt-1.3b}
HBM=${HBM:-100}
for IN in 32 256 2016; do
  for OUT in 32 256; do
    echo "== $MODEL b=1 in=$IN out=$OUT hbm%=$HBM =="
    python run.py --benchmark -m "$MODEL" --dummy-weights --batch-size 1 \
      --input-tokens "$IN" --max-new-tokens "$OUT" --num-iter 2 --num-warmup 1 \
      --fused-decode --hbm-percentage "$HBM" \
      $([ "$HBM" -lt 100 ] && echo --stream-weights)
  done
done
