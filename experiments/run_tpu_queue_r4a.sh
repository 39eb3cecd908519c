#!/usr/bin/env bash
# Round-4 queue A: fused-serving re-run (relaxed eligibility), grouped-beam
# tiered A/B, prefill MFU, policy-2 hybrid HW datapoint.
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  timeout "$TO" "$@" > "/tmp/q4a_${name}.log" 2>&1
  echo "--- $name exit=$? wall=$((SECONDS-t0))s ---"
  grep -h '"bench"\|"metric"' "/tmp/q4a_${name}.log" | sed 's/^/    /'
}
TO=1200 run spec_tiered python experiments/bench_spec_tiered.py
TO=1500 run beam_tiered python experiments/bench_beam_tiered.py
TO=1500 run serving_fused python experiments/bench_serving.py --only-fused
TO=1500 run prefill_mfu python experiments/bench_prefill_mfu.py
TO=1800 run policy2 python experiments/bench_policy2_hw.py
echo "=== queue r4a done ==="
