#!/usr/bin/env bash
# Round-4 queue D: remaining HW measurements after the r4c partial run
# (prefill_mfu and spec_tiered landed there; see RESULTS.md). beam_reorder
# re-sized to S=1024 — the S=2048 whole-gather peak (~17 GB when XLA cannot
# alias the donated gather) exceeded the 16 GB HBM and stalled the rig.
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  timeout "$TO" "$@" > "/tmp/q4d_${name}.log" 2>&1
  echo "--- $name exit=$? wall=$((SECONDS-t0))s ---"
  grep -h '"bench"\|"metric"' "/tmp/q4d_${name}.log" | sed 's/^/    /'
}
TO=900  run beam_reorder python experiments/bench_beam_reorder.py
TO=1500 run beam_tiered env MODEL=opt-125m B=2 NB=4 OUT_LEN=8 python experiments/bench_beam_tiered.py
TO=1800 run policy2 env MODEL=opt-125m B=8 OUT_LEN=4 python experiments/bench_policy2_hw.py
TO=5400 run streamed_30b python experiments/bench_streamed_30b.py
echo "=== queue r4d done ==="
