#!/usr/bin/env bash
# Round-4 queue B: reruns of the r4a timeouts at lighter configs (the r4a
# attempts populated .jax_cache, so compiles are mostly cached now) + the
# isolated beam-reorder A/B + the fixed prefill-MFU run.
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  timeout "$TO" "$@" > "/tmp/q4b_${name}.log" 2>&1
  echo "--- $name exit=$? wall=$((SECONDS-t0))s ---"
  grep -h '"bench"\|"metric"' "/tmp/q4b_${name}.log" | sed 's/^/    /'
}
TO=900  run beam_reorder python experiments/bench_beam_reorder.py
TO=1200 run prefill_mfu python experiments/bench_prefill_mfu.py
TO=1800 run spec_tiered env OUT_LEN=8 python experiments/bench_spec_tiered.py
TO=1800 run beam_tiered env OUT_LEN=8 python experiments/bench_beam_tiered.py
TO=1800 run policy2 env OUT_LEN=4 B=8 python experiments/bench_policy2_hw.py
echo "=== queue r4b done ==="
