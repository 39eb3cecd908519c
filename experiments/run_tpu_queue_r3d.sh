#!/usr/bin/env bash
# Round-3 phase 4: decode-attention kernel shootout + fused roofline L-slope.
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  timeout "$TO" "$@" > "/tmp/q3d_${name}.log" 2>&1
  echo "--- $name exit=$? wall=$((SECONDS-t0))s (log /tmp/q3d_${name}.log) ---"
  tail -5 "/tmp/q3d_${name}.log" | sed 's/^/    /'
}
TO=1500 run attn_shootout python experiments/bench_decode_attn.py
TO=2400 run opt_roofline python experiments/bench_opt_roofline.py
echo "=== queue r3d done ==="
TO=900 run beam_select python experiments/bench_beam_select.py
echo "=== queue r3d+select done ==="
