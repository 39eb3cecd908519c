#!/usr/bin/env bash
# Host-DRAM tiering suite — the CXL-offloading analog (reference
# scripts/cxl_offloading.sh:13-47: batch scaled until DDR/CXL capacity, minibatch 3-4).
# Here: OPT-30B int8 larger than HBM; residency and batch swept.
set -e
cd "$(dirname "$0")/.."
MODEL=${MODEL:-opt-30b}
for HBM in 10 25 40; do
  for B in 16 64; do
    echo "== $MODEL int8 hbm%=$HBM b=$B =="
    python run.py --benchmark -m "$MODEL" --dummy-weights --weight-dtype int8 \
      --batch-size "$B" --input-tokens 256 --max-new-tokens 32 \
      --num-iter 1 --num-warmup 1 --hbm-percentage "$HBM" --stream-weights \
      --num-minibatch 2
  done
done
