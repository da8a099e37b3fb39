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
  python -m rdoptq_tpu.cli.train --arch "$ARCH" --quality "$q" \
    --lmbda "$lam" --steps "$STEPS" --out "$ckpt"
done

PAT="ckpts/${LOW}_q{quality}.npz"
QS=$(IFS=,; echo "${QUALITIES[*]}")

echo "== sweep: W8 nearest (no calibration)"
python -m rdoptq_tpu.cli.sweep --arch "$ARCH" --qualities "$QS" \
  --ckpt_pattern "$PAT" --n_bits_w 8 --n_bits_a 8 \
  --out "artifacts/${LOW}_w8_nearest.json"

echo "== sweep: W8A8 RDO-calibrated ($ITERS it/unit)"
python -m rdoptq_tpu.cli.sweep --arch "$ARCH" --qualities "$QS" \
  --ckpt_pattern "$PAT" --n_bits_w 8 --n_bits_a 8 --act_quant \
  --iters_w "$ITERS" "${EXTRA[@]}" --out "artifacts/${LOW}_w8a8_rdo.json"

echo "== sweep: W10A10 RDO-calibrated ($ITERS it/unit)"
python -m rdoptq_tpu.cli.sweep --arch "$ARCH" --qualities "$QS" \
  --ckpt_pattern "$PAT" --n_bits_w 10 --n_bits_a 10 --act_quant \
  --iters_w "$ITERS" "${EXTRA[@]}" --out "artifacts/${LOW}_w10a10_rdo.json"

echo "== done; artifacts:"
ls -la "artifacts/${LOW}"_*.json
