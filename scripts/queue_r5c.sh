#!/usr/bin/env bash
# Round-5 cleanup queue: re-runs stages the first two queues dropped.
# Known drop at authoring time: the Lu2022 ms-ssim W8-nearest q5,6+CLIC
# sweep (queue_r5 stage 2) failed twice — attempt 1 on a remote-compile
# server fault (HTTP 500 / SIGKILL of tpu_compile_helper on the cold
# 1792x2048 CLIC bucket), attempt 2 on a 2400 s timeout spent on cold
# recompiles. The ms-ssim RDO stage has since compiled + cached the CLIC
# eval program, so retries here are warm (~15 min). Everything else is
# the same idempotent gate set as queue_r5/queue_r5b, ordered by the
# round-4 VERDICT "Next" list; stages skip if their artifact landed.
#
#   BUDGET_MIN=170 bash scripts/queue_r5c.sh
set -u
cd "$(dirname "$0")/.."

BUDGET_MIN="${BUDGET_MIN:-170}"
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
queue_alive() {
  local f
  for f in /tmp/queue_r5.pid /tmp/queue_r5b.pid; do
    [ -f "$f" ] && kill -0 "$(cat "$f")" 2>/dev/null && return 0
  done
  return 1
}

echo "$(date) r5c queue up (budget ${BUDGET_MIN}min); waiting for r5/r5b"
while queue_alive && (( $(NOW) < HARD_END )); do sleep 120; done
(( $(NOW) >= HARD_END )) && { echo "budget gone waiting"; exit 1; }
echo "$(date) prior queues drained; left=$(left_min)min"
sleep 30

# ---- 1. Lu2022 ms-ssim W8 nearest q5,6 + CLIC (dropped by queue_r5) --
if (( $(left_min) >= 20 )) && \
   ! python -c "
import json,sys
d=json.load(open('artifacts/lu2022_msssim_w8_nearest.json'))
sys.exit(0 if set(d['per_quality'])=={'5','6'} and
         'clic' in d['per_quality']['6']['extra'] else 1)" 2>/dev/null
then
  echo "$(date) == Lu2022 ms-ssim W8 nearest q5,6 (left=$(left_min)min)"
  ATTEMPT_TIMEOUT=3000 retry 2 python -m rdoptq_tpu.cli.sweep \
    --arch Lu2022 --qualities 5,6 \
    --ckpt_pattern 'ckpts/lu2022msssim_q{quality}.npz' \
    --n_bits_w 8 --n_bits_a 8 --iters_w 0 \
    --extra_eval "tecnick=$TECNICK,clic=$CLIC@1792x2048" \
    --out artifacts/lu2022_msssim_w8_nearest.json \
    > /tmp/lu_msssim_w8_q56_r5c.log 2>&1
  commit_artifacts "Lu2022 ms-ssim q5+q6 W8 nearest (Kodak/Tecnick/CLIC)"
fi

# ---- 2. Lu2022 ms-ssim W8A8 RDO retry (resumes from .partial) --------
if (( $(left_min) >= 40 )) && \
   ! python -c "
import json,sys
d=json.load(open('artifacts/lu2022_msssim_w8a8_rdo.json'))
sys.exit(0 if set(d['per_quality'])=={'5','6'} and
         'clic' in d['per_quality']['6']['extra'] else 1)" 2>/dev/null
then
  echo "$(date) == Lu2022 ms-ssim W8A8 RDO q5,6 retry (left=$(left_min)min)"
  ATTEMPT_TIMEOUT=3600 retry 2 python -m rdoptq_tpu.cli.sweep \
    --arch Lu2022 --qualities 5,6 \
    --ckpt_pattern 'ckpts/lu2022msssim_q{quality}.npz' \
    --n_bits_w 8 --n_bits_a 8 --act_quant --iters_w 2000 --batch_size 2 \
    --calib_dir "$CLIC" \
    --extra_eval "tecnick=$TECNICK,clic=$CLIC@1792x2048" \
    --out artifacts/lu2022_msssim_w8a8_rdo.json \
    > /tmp/lu_msssim_rdo_q56_r5c.log 2>&1
  commit_artifacts "Lu2022 ms-ssim q5+q6 W8A8 RDO (Kodak/Tecnick/CLIC)"
fi

# ---- 3. Cheng2020 ms-ssim rows (if r5 trained the anchors) -----------
if (( $(left_min) >= 25 )) && [ -f ckpts/cheng2020msssim_q5.npz ] && \
   [ -f ckpts/cheng2020msssim_q6.npz ] && \
   [ ! -f artifacts/cheng2020_msssim_w8_nearest.json ]; then
  echo "$(date) == Cheng2020 ms-ssim W8 nearest q5,6 (left=$(left_min)min)"
  retry 2 python -m rdoptq_tpu.cli.sweep --arch Cheng2020 --qualities 5,6 \
    --ckpt_pattern 'ckpts/cheng2020msssim_q{quality}.npz' \
    --n_bits_w 8 --n_bits_a 8 --iters_w 0 \
    --extra_eval "tecnick=$TECNICK" \
    --out artifacts/cheng2020_msssim_w8_nearest.json \
    > /tmp/cheng_msssim_w8_r5c.log 2>&1
  commit_artifacts "Cheng2020 ms-ssim q5+q6 W8 nearest (Kodak/Tecnick)"
fi

if (( $(left_min) >= 75 )) && [ -f ckpts/cheng2020msssim_q5.npz ] && \
   [ -f ckpts/cheng2020msssim_q6.npz ] && \
   [ ! -f artifacts/cheng2020_msssim_w8a8_rdo.json ]; then
  echo "$(date) == Cheng2020 ms-ssim W8A8 RDO q5,6 (left=$(left_min)min)"
  ATTEMPT_TIMEOUT=3600 retry 2 python -m rdoptq_tpu.cli.sweep \
    --arch Cheng2020 --qualities 5,6 \
    --ckpt_pattern 'ckpts/cheng2020msssim_q{quality}.npz' \
    --n_bits_w 8 --n_bits_a 8 --act_quant --iters_w 2000 --batch_size 2 \
    --calib_dir "$CLIC" --extra_eval "tecnick=$TECNICK" \
    --out artifacts/cheng2020_msssim_w8a8_rdo.json \
    > /tmp/cheng_msssim_rdo_r5c.log 2>&1
  commit_artifacts "Cheng2020 ms-ssim q5+q6 W8A8 RDO (Kodak/Tecnick)"
fi

# ---- 4. codec rows (if r5b's budget dropped them) --------------------
if (( $(left_min) >= 20 )) && ! python -c "
import json,sys
d=json.load(open('artifacts/codec_small_bench.json'))
sys.exit(0 if 'wide' in json.dumps(d) and d.get('platform')!='cpu' else 1)" \
   2>/dev/null; then
  echo "$(date) == small-image wide codec bench (left=$(left_min)min)"
  retry 2 python scripts/codec_small_bench.py > /tmp/codec_small_r5c.log 2>&1
  commit_artifacts "codec: small-image bench through the wide decode path"
fi

if (( $(left_min) >= 25 )) && [ ! -f artifacts/wide_batch_bench.json ]; then
  echo "$(date) == batched wide decode throughput (left=$(left_min)min)"
  retry 2 python scripts/wide_batch_bench.py > /tmp/wide_batch_r5c.log 2>&1
  commit_artifacts "codec: batched wide decode throughput row"
fi

if (( $(left_min) >= 10 )) && ! python -c "
import json,sys
d=json.load(open('artifacts/wide_decode_profile.json'))
sys.exit(0 if d.get('device_split',{}).get('platform') not in (None,'cpu')
         else 1)" 2>/dev/null; then
  echo "$(date) == wide decode device-time split (left=$(left_min)min)"
  retry 2 python scripts/wide_decode_split.py > /tmp/wide_split_r5c.log 2>&1
  commit_artifacts "codec: wide-decode device-time component split"
fi

# ---- 5. serving bench refresh ----------------------------------------
if (( $(left_min) >= 25 )) && ! grep -q timing_protocol \
     artifacts/serving_bench.json 2>/dev/null; then
  echo "$(date) == serving bench refresh (left=$(left_min)min)"
  timeout -s KILL $(clamp 3000) python scripts/bench_serving.py \
    > /tmp/bench_serving_r5c.log 2>&1
  commit_artifacts "serving bench: codec rows re-measured (labeled protocol)"
fi

# ---- 6. fault repro ---------------------------------------------------
if (( $(left_min) >= 30 )) && [ ! -f artifacts/fault_repro.json ]; then
  echo "$(date) == fault repro (left=$(left_min)min)"
  timeout -s KILL $(clamp 5400) python scripts/fault_repro.py \
    > /tmp/fault_repro_r5c.log 2>&1
  commit_artifacts "fault repro: Cheng2020 N=192 g_s unit batch bisect"
fi

# ---- 7. GMM (only if both prior queues dropped it) -------------------
if (( $(left_min) >= 65 )) && [ ! -f artifacts/cheng2020gmm_w8a8_rdo.json ]
then
  echo "$(date) == GMM pipeline (left=$(left_min)min)"
  timeout -s KILL $(budget_s) bash scripts/repro_gmm.sh 6000 2000 \
    >> /tmp/gmm_pipeline.log 2>&1
  commit_ckpts "Cheng2020 GMM anchor"
  commit_artifacts "Cheng2020 GMM: trained anchor + W8A8 sweep"
fi

# ---- 8. Cheng2020 ms-ssim CLIC tail ----------------------------------
if (( $(left_min) >= 25 )) && [ -f ckpts/cheng2020msssim_q5.npz ] && \
   [ -f ckpts/cheng2020msssim_q6.npz ] && \
   [ ! -f artifacts/cheng2020_msssim_clic_w8_nearest.json ]; then
  echo "$(date) == Cheng2020 ms-ssim CLIC W8 nearest (left=$(left_min)min)"
  retry 2 python -m rdoptq_tpu.cli.sweep --arch Cheng2020 --qualities 5,6 \
    --ckpt_pattern 'ckpts/cheng2020msssim_q{quality}.npz' \
    --n_bits_w 8 --n_bits_a 8 --iters_w 0 \
    --test_dir "$CLIC" --eval_pad_to 1792x2048 \
    --out artifacts/cheng2020_msssim_clic_w8_nearest.json \
    > /tmp/cheng_msssim_clic_r5c.log 2>&1
  commit_artifacts "Cheng2020 ms-ssim CLIC-30 W8 nearest"
fi

# ---- 9. q1-q8 span: whatever anchors fit -----------------------------
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
    retry 2 python -m rdoptq_tpu.cli.sweep --arch Lu2022 \
      --qualities 1,2,3,4,5,6,7,8 \
      --ckpt_pattern 'ckpts/lu2022_q{quality}.npz' \
      --n_bits_w 8 --n_bits_a 8 --iters_w 0 \
      --out artifacts/lu2022_w8_nearest_q1q8.json \
      > /tmp/lu2022_q1q8.log 2>&1
    commit_artifacts "Lu2022 q1-q8 W8 nearest (full reference quality span)"
  fi
fi

commit_artifacts "artifacts: end-of-r5c-queue snapshot"
touch /tmp/r5c_queue_done
echo "$(date) r5c queue done (left=$(left_min)min)"
