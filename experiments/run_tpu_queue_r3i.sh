#!/usr/bin/env bash
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  timeout "$TO" "$@" > "/tmp/q3i_${name}.log" 2>&1
  echo "--- $name exit=$? wall=$((SECONDS-t0))s ---"
  grep -h '"model"\|"metric"' "/tmp/q3i_${name}.log" | tail -1 | sed 's/^/    /'
}
TO=1200 run bench python bench.py
TO=1800 run opt67_w4a8 python run.py --benchmark -m opt-6.7b --dummy-weights \
  --weight-dtype int4 --group-size 128 --act-quant dynamic --kv-cache-dtype int8 \
  --batch-size 16 --input-tokens 256 --max-new-tokens 32 --fused-decode \
  --num-iter 1 --num-warmup 1
echo "=== queue r3i done ==="
