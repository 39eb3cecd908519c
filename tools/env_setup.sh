#!/usr/bin/env bash
# Environment setup for lia_tpu on a TPU VM (reference analog:
# tools/env_setup.sh:11-32, which builds the CPU stack; here the "device
# stack" is jax[tpu] from the libtpu releases channel and the only native
# piece is the optional OpenMP host helper, built on demand).
#
#   ./tools/env_setup.sh            # install runtime deps + editable package
#   ./tools/env_setup.sh --hf       # + HF checkpoint loading / golden tests
#   ./tools/env_setup.sh --native   # + build the native host helper now
set -euo pipefail
cd "$(dirname "$0")/.."

PYTHON=${PYTHON:-python3}

echo "[env_setup] installing jax[tpu] + lia-tpu (editable)"
$PYTHON -m pip install -U pip
# TPU wheels ship via the libtpu releases index; on CPU-only dev boxes this
# falls back to the plain jax wheel (tests force the CPU backend anyway).
$PYTHON -m pip install "jax[tpu]" \
  -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
  || $PYTHON -m pip install jax
$PYTHON -m pip install -e .

for arg in "$@"; do
  case "$arg" in
    --hf)
      $PYTHON -m pip install -e ".[hf,test]"
      ;;
    --native)
      echo "[env_setup] building native host helper (OpenMP)"
      make -C native
      ;;
  esac
done

echo "[env_setup] smoke test"
$PYTHON - <<'EOF'
import jax
print("jax", jax.__version__, "backend:", jax.default_backend(),
      "devices:", len(jax.devices()))
import lia_tpu
from lia_tpu.models.registry import get_config
print("lia_tpu ok;", get_config("opt-125m").name)
EOF
echo "[env_setup] done — try: lia-tpu-run --benchmark -m opt-125m --dummy-weights"
