#!/usr/bin/env bash
# Reproduce the TinyLIC light-PTQ numbers (RESULTS.md) from scratch on
# one TPU: train a variable-rate λ-conditioned FP32 anchor, then run
# scripts/tinylic_results.py (FP32/BF16/INT8 RD curves + BD deltas +
# real-codec enc/dec timing + model-size table — the measured
# counterpart of light-uniform-PTQ/single_test.ipynb).
#
# Data methodology matches repro_results.sh: train on Tecnick100 crops,
# Kodak24 stays evaluation-only.
#
# Usage:  bash scripts/repro_tinylic.sh [steps]
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${1:-8000}"
REFDATA=/root/reference/task-oriented-PTQ/datasets
TRAIN_DIR="${TRAIN_DIR:-$REFDATA/tecnick100/tecnick/RGB_OR_1200x1200}"
LAMBDAS="0.0067,0.0130,0.0250,0.0483"

retry() {  # retry <max> <cmd...>  (see repro_results.sh: faults can hang)
  local max="$1" n=1; shift
  until timeout --signal=KILL "${ATTEMPT_TIMEOUT:-7200}" "$@"; do
    if (( n >= max )); then
      echo "== FAILED after $n attempts: $*" >&2; return 1
    fi
    n=$((n + 1))
    echo "== attempt $n/$max (waiting for device recovery): $*" >&2
    sleep 240
  done
}

mkdir -p ckpts artifacts

if [[ -f ckpts/tinylic_vr.npz ]]; then
  echo "== anchor exists: ckpts/tinylic_vr.npz"
else
  echo "== training TinyLIC variable-rate anchor ($STEPS steps, lambdas $LAMBDAS)"
  retry 8 python -m rdoptq_tpu.cli.train --arch TinyLIC \
    --lambdas "$LAMBDAS" --steps "$STEPS" --data_dir "$TRAIN_DIR" \
    --out ckpts/tinylic_vr.npz
fi

echo "== light-PTQ results (FP32/BF16/INT8 RD + codec table)"
ATTEMPT_TIMEOUT=3600 retry 4 python scripts/tinylic_results.py \
  --checkpoint ckpts/tinylic_vr.npz --out artifacts/tinylic_light_ptq.json

echo "== done; artifact:"
ls -la artifacts/tinylic_light_ptq.json
