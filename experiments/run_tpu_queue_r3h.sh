#!/usr/bin/env bash
# Headline A/B for the 64-slot cache bucketing (S_max 384 -> 320).
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  timeout "$TO" "$@" > "/tmp/q3h_${name}.log" 2>&1
  echo "--- $name exit=$? wall=$((SECONDS-t0))s (log /tmp/q3h_${name}.log) ---"
  tail -3 "/tmp/q3h_${name}.log" | sed 's/^/    /'
}
TO=1200 run bench python bench.py
TO=1500 run bench_beam python experiments/bench_beam.py
echo "=== queue r3h done ==="
