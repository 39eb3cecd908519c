#!/usr/bin/env bash
# Round-3 phase 2 TPU queue: verify surface for the beam/serving changes,
# then the beam A/B bench and the north-star decomposition terms.
set -u
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  timeout "$TO" "$@" > "/tmp/q3b_${name}.log" 2>&1
  echo "--- $name exit=$? wall=$((SECONDS-t0))s (log /tmp/q3b_${name}.log) ---"
  tail -4 "/tmp/q3b_${name}.log" | sed 's/^/    /'
}

# verify smoke: CLI end-to-end on the real chip (beam path included)
TO=900 run verify_smoke python run.py --benchmark -m opt-125m --dummy-weights \
  --batch-size 2 --input-tokens 32 --max-new-tokens 8 --num-iter 1 --num-warmup 1

# TPU compile + parity check of the grouped-beam kernels (bf16 + int8) at a
# production-like shape, vs the jnp fallback on the same device
TO=900 run beam_kernel python experiments/check_beam_kernel_tpu.py

# beam vs greedy A/B (VERDICT target: nb=4 step <= 1.3x greedy at equal B*nb)
TO=1500 run bench_beam python experiments/bench_beam.py

# north-star decomposition terms (C_layer, C_fixed, T_layer, max(T,C) model)
TO=2400 run ns_decompose python experiments/northstar_decompose.py
echo "=== queue r3b done ==="

# OPT-6.7B headline roofline: dynamic-act component timings + L-slope
TO=2400 run opt_roofline python experiments/bench_opt_roofline.py
echo "=== queue r3b (with roofline) done ==="
