#!/usr/bin/env bash
# Round-5 final queue: runs after queue_r5c drains.
#
# 1. Safety net: re-attempts any stage r5c's budget dropped (same
#    idempotent gates — ms-ssim nearest retry, Cheng ms-ssim CLIC row,
#    q8 anchor, q1-q8 nearest sweep).
# 2. The one remaining reference-facing cell: Lu2022 W8A8 RDO evaluated
#    on CLIC41 (test_datasets.ipynb cell 14's W8A8 row). The original
#    sweep's per-quality PTQ snapshots are deleted on completion, so
#    this re-calibrates (seeded, same config as lu2022_w8a8_rdo.json)
#    with the CLIC column added, writing a NEW artifact
#    lu2022_w8a8_rdo_clic.json (the committed Kodak/Tecnick artifact
#    stays untouched as the documented round-2 measurement).
#
#   BUDGET_MIN=440 bash scripts/queue_r5d.sh
set -u
cd "$(dirname "$0")/.."

BUDGET_MIN="${BUDGET_MIN:-420}"
START=$(date +%s)
HARD_END=$((START + BUDGET_MIN * 60))
REFDATA=/root/reference/task-oriented-PTQ/datasets
TECNICK=$REFDATA/tecnick100/tecnick/RGB_OR_1200x1200
CLIC=$REFDATA/clic41
NOW() { date +%s; }
left_min() { echo $(( (HARD_END - $(NOW)) / 60 )); }
budget_s() { echo $(( HARD_END - $(NOW) - 120 )); }
clamp() { local cap; cap=$(budget_s); (( $1 < cap )) && echo "$1" || echo "$cap"; }

commit_artifacts() {
  git add artifacts/ 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1" || true
}
commit_ckpts() {
  git add -f ckpts/*.npz 2>/dev/null
  git diff --cached --quiet || \
    git commit -q -m "ckpts: commit trained anchors ($1)" || true
}
retry() {
  local max="$1" n=1 t; shift
  while :; do
    t=$(clamp "${ATTEMPT_TIMEOUT:-2400}")
    (( t < 60 )) && { echo "== budget exhausted: $*" >&2; return 1; }
    timeout --signal=KILL "$t" "$@" && return 0
    (( n >= max )) && { echo "== FAILED after $n attempts: $*" >&2; return 1; }
    n=$((n + 1)); echo "== attempt $n/$max: $*" >&2; sleep 240
  done
}
prior_alive() {
  local f
  for f in /tmp/queue_r5b.pid /tmp/queue_r5c.pid; do
    [ -f "$f" ] && kill -0 "$(cat "$f")" 2>/dev/null && return 0
  done
  return 1
}

echo "$(date) r5d queue up (budget ${BUDGET_MIN}min); waiting for r5b/r5c"
while prior_alive && (( $(NOW) < HARD_END )); do sleep 120; done
(( $(NOW) >= HARD_END )) && { echo "budget gone waiting"; exit 1; }
echo "$(date) prior queues drained; left=$(left_min)min"
sleep 30

# ---- 1. safety net: stages r5c may have dropped ----------------------
if (( $(left_min) >= 20 )) && \
   ! python -c "
import json,sys
d=json.load(open('artifacts/lu2022_msssim_w8_nearest.json'))
sys.exit(0 if set(d['per_quality'])=={'5','6'} and
         'clic' in d['per_quality']['6']['extra'] else 1)" 2>/dev/null
then
  echo "$(date) == Lu2022 ms-ssim W8 nearest q5,6 retry (left=$(left_min)min)"
  ATTEMPT_TIMEOUT=3000 retry 2 python -m rdoptq_tpu.cli.sweep \
    --arch Lu2022 --qualities 5,6 \
    --ckpt_pattern 'ckpts/lu2022msssim_q{quality}.npz' \
    --n_bits_w 8 --n_bits_a 8 --iters_w 0 \
    --extra_eval "tecnick=$TECNICK,clic=$CLIC@1792x2048" \
    --out artifacts/lu2022_msssim_w8_nearest.json \
    > /tmp/lu_msssim_w8_q56_r5d.log 2>&1
  commit_artifacts "Lu2022 ms-ssim q5+q6 W8 nearest (Kodak/Tecnick/CLIC)"
fi

if (( $(left_min) >= 25 )) && [ -f ckpts/cheng2020msssim_q5.npz ] && \
   [ ! -f artifacts/cheng2020_msssim_clic_w8_nearest.json ]; then
  echo "$(date) == Cheng2020 ms-ssim CLIC W8 nearest (left=$(left_min)min)"
  retry 2 python -m rdoptq_tpu.cli.sweep --arch Cheng2020 --qualities 5,6 \
    --ckpt_pattern 'ckpts/cheng2020msssim_q{quality}.npz' \
    --n_bits_w 8 --n_bits_a 8 --iters_w 0 \
    --test_dir "$CLIC" --eval_pad_to 1792x2048 \
    --out artifacts/cheng2020_msssim_clic_w8_nearest.json \
    > /tmp/cheng_msssim_clic_r5d.log 2>&1
  commit_artifacts "Cheng2020 ms-ssim CLIC-30 W8 nearest"
fi

if [ ! -f artifacts/lu2022_w8_nearest_q1q8.json ]; then
  for ql in "1 0.0018" "2 0.0035" "7 0.0932" "8 0.1800"; do
    set -- $ql
    if (( $(left_min) >= 35 )) && [ ! -f "ckpts/lu2022_q$1.npz" ]; then
      echo "$(date) == Lu2022 q$1 anchor (left=$(left_min)min)"
      ATTEMPT_TIMEOUT=3600 retry 2 python -m rdoptq_tpu.cli.train \
        --arch Lu2022 --quality "$1" --lmbda "$2" --steps 8000 \
        --data_dir "$TECNICK" --out "ckpts/lu2022_q$1.npz" \
        > "/tmp/lu2022_q$1_train.log" 2>&1
      commit_ckpts "Lu2022 q$1 anchor"
    fi
  done
  if [ -f ckpts/lu2022_q1.npz ] && [ -f ckpts/lu2022_q2.npz ] && \
     [ -f ckpts/lu2022_q7.npz ] && [ -f ckpts/lu2022_q8.npz ] && \
     (( $(left_min) >= 25 )); then
    echo "$(date) == Lu2022 q1-q8 W8 nearest (left=$(left_min)min)"
    ATTEMPT_TIMEOUT=3600 retry 2 python -m rdoptq_tpu.cli.sweep \
      --arch Lu2022 --qualities 1,2,3,4,5,6,7,8 \
      --ckpt_pattern 'ckpts/lu2022_q{quality}.npz' \
      --n_bits_w 8 --n_bits_a 8 --iters_w 0 \
      --out artifacts/lu2022_w8_nearest_q1q8.json \
      > /tmp/lu2022_q1q8.log 2>&1
    commit_artifacts "Lu2022 q1-q8 W8 nearest (full reference quality span)"
  fi
fi

# ---- 2. Lu2022 W8A8 RDO with the CLIC column (cell 14 W8A8 row) ------
if (( $(left_min) >= 150 )) && [ ! -f artifacts/lu2022_w8a8_rdo_clic.json ]
then
  echo "$(date) == Lu2022 W8A8 RDO incl. CLIC eval (left=$(left_min)min)"
  ATTEMPT_TIMEOUT=$(budget_s) retry 1 python -m rdoptq_tpu.cli.sweep \
    --arch Lu2022 --qualities 3,4,5,6 \
    --ckpt_pattern 'ckpts/lu2022_q{quality}.npz' \
    --n_bits_w 8 --n_bits_a 8 --act_quant --iters_w 2000 --batch_size 2 \
    --calib_dir "$CLIC" \
    --extra_eval "tecnick=$TECNICK,clic=$CLIC@1792x2048" \
    --out artifacts/lu2022_w8a8_rdo_clic.json \
    > /tmp/lu2022_rdo_clic.log 2>&1
  commit_artifacts "Lu2022 W8A8 RDO re-run with CLIC column (cell-14 W8A8 facing)"
fi

commit_artifacts "artifacts: end-of-r5d-queue snapshot"
touch /tmp/r5d_queue_done
echo "$(date) r5d queue done (left=$(left_min)min)"
