#!/usr/bin/env bash
# w4a8 at MODEL level (BASELINE ladder int4 rung): llama-3-8b b8 256/32.
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  timeout "$TO" "$@" > "/tmp/q3g_${name}.log" 2>&1
  echo "--- $name exit=$? wall=$((SECONDS-t0))s (log /tmp/q3g_${name}.log) ---"
  grep -h '"model"' "/tmp/q3g_${name}.log" | tail -1 | sed 's/^/    /'
}
TO=1800 run llama_w4a8 python run.py --benchmark -m llama-3-8b --dummy-weights \
  --weight-dtype int4 --group-size 128 --act-quant dynamic --kv-cache-dtype int8 \
  --batch-size 8 --input-tokens 256 --max-new-tokens 32 --fused-decode \
  --num-iter 1 --num-warmup 1
TO=1800 run llama_int4_ctl python run.py --benchmark -m llama-3-8b --dummy-weights \
  --weight-dtype int4 --group-size 128 \
  --batch-size 8 --input-tokens 256 --max-new-tokens 32 --fused-decode \
  --num-iter 1 --num-warmup 1
TO=1800 run opt67_w4a8 python run.py --benchmark -m opt-6.7b --dummy-weights \
  --weight-dtype int4 --group-size 128 --act-quant dynamic --kv-cache-dtype int8 \
  --batch-size 16 --input-tokens 256 --max-new-tokens 32 --fused-decode \
  --num-iter 1 --num-warmup 1
echo "=== queue r3g done ==="
