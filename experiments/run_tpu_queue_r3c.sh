#!/usr/bin/env bash
# Round-3 phase 3: clean re-measurements (fused controls).
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  timeout "$TO" "$@" > "/tmp/q3c_${name}.log" 2>&1
  echo "--- $name exit=$? wall=$((SECONDS-t0))s (log /tmp/q3c_${name}.log) ---"
  tail -4 "/tmp/q3c_${name}.log" | sed 's/^/    /'
}
TO=1500 run bench_beam python experiments/bench_beam.py
TO=2400 run ns_decompose python experiments/northstar_decompose.py
echo "=== queue r3c done ==="
