#!/usr/bin/env bash
# Reproduce every measured number in RESULTS.md from scratch on one TPU.
#
# Only git survives between build sessions, so trained anchors must be
# regenerable: this script is the full pipeline (train FP32 anchors ->
# nearest/W8A8/W10A10 BD-rate sweeps -> artifacts/*.json).
#
# Data methodology (round 2; VERDICT.md Weak #1): anchors train on
# Tecnick100 crops, calibration crops come from CLIC41 (the reference's
# c_data, config.yaml:60), Kodak24 stays evaluation-only. Tecnick/CLIC
# evaluation tables are recorded alongside (train/calib overlap noted in
# the artifact provenance).
#
# Usage:  bash scripts/repro_results.sh [arch] [steps] [iters_w]
#   arch    Minnen2018 | Cheng2020 | Lu2022   (default Minnen2018)
#   steps   anchor training steps             (default 12000)
#   iters_w RDO calibration iters per unit    (default 5000)
set -euo pipefail
cd "$(dirname "$0")/.."

ARCH="${1:-Minnen2018}"
STEPS="${2:-12000}"
ITERS="${3:-5000}"
REFDATA=/root/reference/task-oriented-PTQ/datasets
TRAIN_DIR="${TRAIN_DIR:-$REFDATA/tecnick100/tecnick/RGB_OR_1200x1200}"
CALIB_DIR="${CALIB_DIR:-$REFDATA/clic41}"
# three-dataset evaluation (reference: test_datasets.ipynb cells 13-22).
# The FP32/W8/W8A8 states get the full three-dataset tables; W10A10 keeps
# Kodak only by default (act_bits=10 forces a recompile of every padded
# shape bucket — ~11 per model dims — for one table the reference never
# publishes per-dataset).
# clic gets a fixed pad bucket (@HxW): 23 unique image sizes would
# otherwise each pay a remote XLA compile; 1792 covers the one portrait.
EXTRA_EVAL="${EXTRA_EVAL:-tecnick=$REFDATA/tecnick100/tecnick/RGB_OR_1200x1200,clic=$REFDATA/clic41@1792x2048}"
EXTRA_EVAL_W10="${EXTRA_EVAL_W10:-}"
# extra per-arch sweep flags, e.g. SWEEP_FLAGS="--remat --compute_dtype
# bfloat16" for Lu2022's deep RSTB suffixes
read -r -a EXTRA <<< "${SWEEP_FLAGS:-}"

# The TPU tunnel occasionally faults (UNAVAILABLE) under sustained load.
# Sweeps checkpoint per quality (<out>.partial) with the FP32 anchor
# eval persisted separately, so retrying resumes with at most one unit's
# calibration lost. Training is retried likewise (finished anchors are
# skipped).
retry() {  # retry <max> <cmd...>
  # Each attempt is bounded: some device faults HANG the client instead
  # of raising, which would stall the loop forever. Per-unit/per-quality
  # resume makes a timeout kill cheap (at most one unit redone).
  local max="$1" n=1; shift
  until timeout --signal=KILL "${ATTEMPT_TIMEOUT:-2400}" "$@"; do
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
  ATTEMPT_TIMEOUT=7200 retry 8 python -m rdoptq_tpu.cli.train --arch "$ARCH" --quality "$q" \
    --lmbda "$lam" --steps "$STEPS" --data_dir "$TRAIN_DIR" --out "$ckpt"
  # commit EACH anchor the moment it lands: ckpts/ is gitignored and only
  # git survives between build sessions — losing an interrupted pipeline's
  # anchors once already cost a full retrain (ROUND_NOTES round-3)
  git add -f "$ckpt" 2>/dev/null && \
    git commit -q -m "ckpts: $ARCH q$q anchor" || true
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
    --extra_eval "$EXTRA_EVAL" \
    --out "artifacts/${LOW}_w8_nearest.json"
fi

if [[ -f "artifacts/${LOW}_w8a8_rdo.json" ]]; then
  echo "== sweep exists: ${LOW}_w8a8_rdo.json"
else
  echo "== sweep: W8A8 RDO-calibrated ($ITERS it/unit)"
  retry 8 python -m rdoptq_tpu.cli.sweep --arch "$ARCH" --qualities "$QS" \
    --ckpt_pattern "$PAT" --n_bits_w 8 --n_bits_a 8 --act_quant \
    --iters_w "$ITERS" --calib_dir "$CALIB_DIR" --extra_eval "$EXTRA_EVAL" \
    "${EXTRA[@]}" --out "artifacts/${LOW}_w8a8_rdo.json"
fi

# W10_MODE=nearest skips the expensive RDO calibration at 10 bits: on
# Lu2022 the W10A10 *nearest* row (-0.22% Kodak) already beat the
# reference's calibrated 0.49% (artifacts/lu2022_w10a10_nearest.json) —
# 10-bit grids are ~lossless, so calibrate only if nearest falls short.
W10_MODE="${W10_MODE:-rdo}"
if [[ "$W10_MODE" == "nearest" ]]; then
  if [[ -f "artifacts/${LOW}_w10a10_nearest.json" ]]; then
    echo "== sweep exists: ${LOW}_w10a10_nearest.json"
  else
    echo "== sweep: W10A10 nearest (no calibration)"
    retry 8 python -m rdoptq_tpu.cli.sweep --arch "$ARCH" --qualities "$QS" \
      --ckpt_pattern "$PAT" --n_bits_w 10 --n_bits_a 10 --act_quant \
      --iters_w 0 --extra_eval "$EXTRA_EVAL_W10" \
      "${EXTRA[@]}" --out "artifacts/${LOW}_w10a10_nearest.json"
  fi
elif [[ -f "artifacts/${LOW}_w10a10_rdo.json" ]]; then
  echo "== sweep exists: ${LOW}_w10a10_rdo.json"
else
  echo "== sweep: W10A10 RDO-calibrated ($ITERS it/unit)"
  retry 8 python -m rdoptq_tpu.cli.sweep --arch "$ARCH" --qualities "$QS" \
    --ckpt_pattern "$PAT" --n_bits_w 10 --n_bits_a 10 --act_quant \
    --iters_w "$ITERS" --calib_dir "$CALIB_DIR" \
    --extra_eval "$EXTRA_EVAL_W10" \
    "${EXTRA[@]}" --out "artifacts/${LOW}_w10a10_rdo.json"
fi

echo "== done; artifacts:"
ls -la "artifacts/${LOW}"_*.json
