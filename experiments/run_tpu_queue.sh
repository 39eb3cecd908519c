#!/usr/bin/env bash
# Serialized TPU measurement queue (one TPU process at a time, each under
# timeout, logs to /tmp). Order: cheap microbench first, then the north-star,
# then overlap A/B evidence, then the headline bench.
set -u
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  timeout "$TO" "$@" > "/tmp/q_${name}.log" 2>&1
  echo "--- $name exit=$? (log /tmp/q_${name}.log) ---"
  tail -3 "/tmp/q_${name}.log" | sed 's/^/    /'
}

TO=${TO1:-2400} run w4a8 python experiments/bench_w4a8.py
TO=${TO2:-3300} run northstar bash scripts/northstar.sh
TO=${TO3:-3300} run overlap python experiments/bench_overlap_ab.py
TO=${TO4:-1200} run bench python bench.py
TO=${TO5:-1800} run serving python experiments/bench_serving.py
echo "=== queue done ==="
