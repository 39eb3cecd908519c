#!/usr/bin/env bash
# Round-4 queue C: relay-aware sizing. The relay's per-put fixed latency
# (~0.3 s; effective 0.07-0.1 GB/s on layer-sized puts) dominates streamed
# steps, so tiered A/Bs run on opt-125m (effect is transfer-bound, model
# size irrelevant) and the 30B anchor budgets ~25 min for resident staging.
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  timeout "$TO" "$@" > "/tmp/q4c_${name}.log" 2>&1
  echo "--- $name exit=$? wall=$((SECONDS-t0))s ---"
  grep -h '"bench"\|"metric"' "/tmp/q4c_${name}.log" | sed 's/^/    /'
}
TO=900  run beam_reorder python experiments/bench_beam_reorder.py
TO=1500 run prefill_mfu python experiments/bench_prefill_mfu.py
TO=1500 run spec_tiered env MODEL=opt-125m B=4 OUT_LEN=8 python experiments/bench_spec_tiered.py
TO=1500 run beam_tiered env MODEL=opt-125m B=2 NB=4 OUT_LEN=8 python experiments/bench_beam_tiered.py
TO=1800 run policy2 env MODEL=opt-125m B=8 OUT_LEN=4 python experiments/bench_policy2_hw.py
TO=5400 run streamed_30b python experiments/bench_streamed_30b.py
echo "=== queue r4c done ==="
