#!/usr/bin/env bash
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  timeout "$TO" "$@" > "/tmp/q3f_${name}.log" 2>&1
  echo "--- $name exit=$? wall=$((SECONDS-t0))s (log /tmp/q3f_${name}.log) ---"
  tail -5 "/tmp/q3f_${name}.log" | sed 's/^/    /'
}
TO=900  run beam_kernel python experiments/check_beam_kernel_tpu.py
TO=1200 run bench python bench.py
TO=1500 run bench_beam python experiments/bench_beam.py
TO=1500 run beam_breakdown python experiments/bench_beam_step_breakdown.py
echo "=== queue r3f done ==="
