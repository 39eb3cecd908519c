#!/usr/bin/env bash
# North-star configuration (BASELINE.md / BASELINE.json): OPT-30B INT8, b=64,
# <=50% of weights HBM-resident, policy-0 prefill with minibatch pipelining,
# INT8 KV cache. Reference analog: scripts/lia_offline.sh:13-25 (b=64,
# policies (0,1), minibatch 1-8, gpu% 0-50).
#
# On the dev rig (single v5e behind a remote relay at 0.03-0.8 GB/s host->HBM)
# the streamed passes are relay-bound; on a real TPU-VM (tens of GB/s PCIe)
# the same command is the deployment config. See RESULTS.md for measurements
# and docs/policies.md for the policy semantics.
set -e
cd "$(dirname "$0")/.."
B=${B:-64}
# HBM budget on a 16 GB v5e: resident int8 layers (~0.64 GB each) + bf16
# embed/lm_head (~1.4 GB) + the streaming double-buffer (~1.3 GB) + activations.
# 40% (19 layers, ~15 GB total) OOMs during the async prefill chain; 30%
# (14 layers, ~12 GB) leaves headroom for XLA temps + relay staging.
HBM=${HBM:-30}
NM=${NM:-4}
python run.py --benchmark -m opt-30b --dummy-weights --weight-dtype int8 \
  --kv-cache-dtype int8 --batch-size "$B" --input-tokens 32 --max-new-tokens 4 \
  --hbm-percentage "$HBM" --prefill-policy 0 --decoding-policy 0 \
  --num-minibatch "$NM" --num-iter 1 --num-warmup 1 "$@"
