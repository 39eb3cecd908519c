#!/usr/bin/env bash
# Round-3 serialized TPU measurement queue (one TPU process at a time, each
# under timeout, logs to /tmp). Order: north-star first (needs the most
# relay bandwidth — run while the link is fast), then overlap A/B evidence
# (decode regime + prefill T~C regime), then the OPT-6.7B layer breakdown
# (roofline hunt), then serving, then the headline bench.
set -u
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  timeout "$TO" "$@" > "/tmp/q3_${name}.log" 2>&1
  echo "--- $name exit=$? wall=$((SECONDS-t0))s (log /tmp/q3_${name}.log) ---"
  tail -4 "/tmp/q3_${name}.log" | sed 's/^/    /'
}

# quick relay probe for the record
TO=300 run probe python experiments/probe_relay.py || true

# 1. north-star: OPT-30B int8 b64 30% resident, policy-0, minibatch 4
TO=${TO_NS:-2700} run northstar bash scripts/northstar.sh

# 2a. overlap A/B, decode regime (VERDICT config): opt-1.3b int8, 50% resident
TO=1500 run overlap_decode env MODEL=opt-1.3b B=16 IN=64 OUT=6 HBM=50 \
  python experiments/bench_overlap_ab.py

# 2b. overlap A/B, prefill T~C regime: opt-6.7b int8-dyn, 88% resident,
#     b16 x in512 prefill (compute ~0.4s/pass vs ~0.8s streamed transfer)
TO=1800 run overlap_prefill env MODEL=opt-6.7b B=16 IN=512 OUT=2 HBM=88 \
  python experiments/bench_overlap_ab.py

# 3. OPT-6.7B decode layer breakdown (headline roofline hunt)
TO=1500 run breakdown python experiments/bench_layer_breakdown.py

# 4. serving throughput (slot vs paged vs APC)
TO=1800 run serving python experiments/bench_serving.py

# 5. headline
TO=1200 run bench python bench.py
echo "=== queue done ==="
