#!/usr/bin/env bash
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  timeout "$TO" "$@" > "/tmp/q3e_${name}.log" 2>&1
  echo "--- $name exit=$? wall=$((SECONDS-t0))s (log /tmp/q3e_${name}.log) ---"
  tail -6 "/tmp/q3e_${name}.log" | sed 's/^/    /'
}
TO=1200 run int8_variants python experiments/bench_decode_attn.py --int8-variants
echo "=== queue r3e done ==="
TO=900 run beam_select python experiments/bench_beam_select.py
echo "=== r3e+select done ==="
