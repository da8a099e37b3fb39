#!/usr/bin/env bash
# Reproduce every measured number in RESULTS.md from scratch on one TPU.
#
# Only git survives between build sessions, so trained anchors must be
# regenerable: this script is the full pipeline (train FP32 anchors ->
# nearest/W8A8/W10A10 BD-rate sweeps -> artifacts/*.json).
#
# Usage:  bash scripts/repro_results.sh [arch] [steps] [iters_w]
#   arch    Minnen2018 | Cheng2020 | Lu2022   (default Minnen2018)
#   steps   anchor training steps             (default 12000)
#   iters_w RDO calibration iters per unit    (default 5000)
#
# Lambdas follow the CompressAI training recipe for qualities 3-6.
set -euo pipefail
cd "$(dirname "$0")/.."

ARCH="${1:-Minnen2018}"
STEPS="${2:-12000}"
ITERS="${3:-5000}"
# extra per-arch sweep flags, e.g. SWEEP_FLAGS="--remat --compute_dtype
# bfloat16" for Lu2022's deep RSTB suffixes
read -r -a EXTRA <<< "${SWEEP_FLAGS:-}"

# The TPU tunnel occasionally faults (UNAVAILABLE) under sustained load.
# Sweeps checkpoint per quality (<out>.partial), so retrying resumes with
# at most one quality's calibration lost. Training is retried likewise
# (it restarts the current quality; finished anchors are skipped).
retry() {  # retry <max> <cmd...>
  # Each attempt is bounded: some device faults HANG the client instead
  # of raising, which would stall the loop forever. Per-unit/per-quality
  # resume makes a timeout kill cheap (at most one unit redone).
  local max="$1" n=1; shift
  until timeout --signal=KILL "${ATTEMPT_TIMEOUT:-1500}" "$@"; do
    if (( n >= max )); then
      echo "== FAILED after $n attempts: $*" >&2; return 1
    fi
    n=$((n + 1))
    echo "== attempt $n/$max (waiting for device recovery): $*" >&2
    sleep 240
  done
}
QUALITIES=(3 4 5 6)
LAMBDAS=(0.0067 0.0130 0.0250 0.0483)
LOW=$(echo "$ARCH" | tr '[:upper:]' '[:lower:]')

mkdir -p ckpts artifacts

for i in "${!QUALITIES[@]}"; do
  q="${QUALITIES[$i]}"; lam="${LAMBDAS[$i]}"
  ckpt="ckpts/${LOW}_q${q}.npz"
  if [[ -f "$ckpt" ]]; then
    echo "== anchor exists: $ckpt"
    continue
  fi
  echo "== training $ARCH q$q (lambda=$lam, $STEPS steps)"
  ATTEMPT_TIMEOUT=5400 retry 8 python -m rdoptq_tpu.cli.train --arch "$ARCH" --quality "$q" \
    --lmbda "$lam" --steps "$STEPS" --out "$ckpt"
done

PAT="ckpts/${LOW}_q{quality}.npz"
QS=$(IFS=,; echo "${QUALITIES[*]}")

# each sweep is skipped when its artifact already exists (tunnel faults
# kill long runs; rerunning the script resumes where it left off)
if [[ -f "artifacts/${LOW}_w8_nearest.json" ]]; then
  echo "== sweep exists: ${LOW}_w8_nearest.json"
else
  echo "== sweep: W8 nearest (no calibration)"
  retry 8 python -m rdoptq_tpu.cli.sweep --arch "$ARCH" --qualities "$QS" \
    --ckpt_pattern "$PAT" --n_bits_w 8 --n_bits_a 8 \
    --out "artifacts/${LOW}_w8_nearest.json"
fi

if [[ -f "artifacts/${LOW}_w8a8_rdo.json" ]]; then
  echo "== sweep exists: ${LOW}_w8a8_rdo.json"
else
  echo "== sweep: W8A8 RDO-calibrated ($ITERS it/unit)"
  retry 8 python -m rdoptq_tpu.cli.sweep --arch "$ARCH" --qualities "$QS" \
    --ckpt_pattern "$PAT" --n_bits_w 8 --n_bits_a 8 --act_quant \
    --iters_w "$ITERS" "${EXTRA[@]}" --out "artifacts/${LOW}_w8a8_rdo.json"
fi

if [[ -f "artifacts/${LOW}_w10a10_rdo.json" ]]; then
  echo "== sweep exists: ${LOW}_w10a10_rdo.json"
else
  echo "== sweep: W10A10 RDO-calibrated ($ITERS it/unit)"
  retry 8 python -m rdoptq_tpu.cli.sweep --arch "$ARCH" --qualities "$QS" \
    --ckpt_pattern "$PAT" --n_bits_w 10 --n_bits_a 10 --act_quant \
    --iters_w "$ITERS" "${EXTRA[@]}" --out "artifacts/${LOW}_w10a10_rdo.json"
fi

echo "== done; artifacts:"
ls -la "artifacts/${LOW}"_*.json
