#!/usr/bin/env bash
# Offline (throughput, large-batch) suite — parity with the reference's
# scripts/lia_offline.sh:13-25 (b=64 minibatch 1-8 gpu% 0-50; b=900 policies (0,2)).
set -e
cd "$(dirname "$0")/.."
MODEL=${MODEL:-opt-6.7b}
QUANT=${QUANT:-int8}
for B in 16 64; do
  for NM in 1 2 4; do
    echo "== $MODEL b=$B minibatch=$NM =="
    python run.py --benchmark -m "$MODEL" --dummy-weights --weight-dtype "$QUANT" \
      --batch-size "$B" --input-tokens 256 --max-new-tokens 32 \
      --num-iter 1 --num-warmup 1 --fused-decode --num-minibatch "$NM"
  done
done
# tiered / hybrid point (prefill streamed-TPU, decode hybrid host-attention)
python run.py --benchmark -m "$MODEL" --dummy-weights --weight-dtype "$QUANT" \
  --batch-size 64 --input-tokens 256 --max-new-tokens 32 --num-iter 1 --num-warmup 1 \
  --prefill-policy 0 --decoding-policy 2 --hbm-percentage 25 --stream-weights
