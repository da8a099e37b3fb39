#!/usr/bin/env bash
# Round-5 follow-on queue: runs the stages queue_r5.sh's serial budget
# is expected to drop (its ms-ssim block alone spans most of the budget).
# Waits for the main queue to drain (done flag or pid death), then works
# a re-prioritized leftover list: codec rows (VERDICT r4 Next #3/#4/#6,
# quick) -> GMM (Next #2, owed three rounds) -> fault repro -> serving
# refresh -> q1-q8 span (Next #7, as many anchors as fit). Every stage
# is idempotent (gates on its artifact), so whatever queue_r5 already
# finished is skipped.
#
#   BUDGET_MIN=150 bash scripts/queue_r5b.sh
set -u
cd "$(dirname "$0")/.."

BUDGET_MIN="${BUDGET_MIN:-180}"
START=$(date +%s)
HARD_END=$((START + BUDGET_MIN * 60))
REFDATA=/root/reference/task-oriented-PTQ/datasets
TECNICK=$REFDATA/tecnick100/tecnick/RGB_OR_1200x1200
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

main_queue_alive() {
  [ -f /tmp/queue_r5.pid ] || return 1
  kill -0 "$(cat /tmp/queue_r5.pid)" 2>/dev/null
}

echo "$(date) r5b queue up (budget ${BUDGET_MIN}min); waiting for queue_r5"
while main_queue_alive && [ ! -f /tmp/r5_queue_done ] && \
      (( $(NOW) < HARD_END )); do sleep 120; done
(( $(NOW) >= HARD_END )) && { echo "budget gone waiting"; exit 1; }
echo "$(date) main queue drained; left=$(left_min)min"
sleep 30  # let any in-flight device work settle

# ---- 1. codec rows --------------------------------------------------
if (( $(left_min) >= 20 )) && ! python -c "
import json,sys
d=json.load(open('artifacts/codec_small_bench.json'))
sys.exit(0 if 'wide' in json.dumps(d) and d.get('platform')!='cpu' else 1)" \
   2>/dev/null; then
  echo "$(date) == small-image wide codec bench (left=$(left_min)min)"
  retry 2 python scripts/codec_small_bench.py > /tmp/codec_small_r5b.log 2>&1
  commit_artifacts "codec: small-image bench through the wide decode path"
fi

if (( $(left_min) >= 25 )) && [ ! -f artifacts/wide_batch_bench.json ]; then
  echo "$(date) == batched wide decode throughput (left=$(left_min)min)"
  retry 2 python scripts/wide_batch_bench.py > /tmp/wide_batch_r5b.log 2>&1
  commit_artifacts "codec: batched wide decode throughput row"
fi

if (( $(left_min) >= 10 )) && ! python -c "
import json,sys
d=json.load(open('artifacts/wide_decode_profile.json'))
sys.exit(0 if d.get('device_split',{}).get('platform') not in (None,'cpu')
         else 1)" 2>/dev/null; then
  echo "$(date) == wide decode device-time split (left=$(left_min)min)"
  retry 2 python scripts/wide_decode_split.py > /tmp/wide_split_r5b.log 2>&1
  commit_artifacts "codec: wide-decode device-time component split"
fi

# ---- 2. GMM pipeline (owed three rounds) -----------------------------
if (( $(left_min) >= 65 )) && [ ! -f artifacts/cheng2020gmm_w8a8_rdo.json ]
then
  echo "$(date) == GMM pipeline (left=$(left_min)min)"
  timeout -s KILL $(budget_s) bash scripts/repro_gmm.sh 6000 2000 \
    >> /tmp/gmm_pipeline.log 2>&1
  commit_ckpts "Cheng2020 GMM anchor"
  commit_artifacts "Cheng2020 GMM: trained anchor + W8A8 sweep"
fi

# ---- 3. fault repro --------------------------------------------------
if (( $(left_min) >= 30 )) && [ ! -f artifacts/fault_repro.json ]; then
  echo "$(date) == fault repro (left=$(left_min)min)"
  timeout -s KILL $(clamp 5400) python scripts/fault_repro.py \
    > /tmp/fault_repro_r5b.log 2>&1
  commit_artifacts "fault repro: Cheng2020 N=192 g_s unit batch bisect"
fi

# ---- 4. serving bench refresh (stale codec rows, Weak #4) ------------
if (( $(left_min) >= 25 )) && ! grep -q timing_protocol \
     artifacts/serving_bench.json 2>/dev/null; then
  echo "$(date) == serving bench refresh (left=$(left_min)min)"
  timeout -s KILL $(clamp 3000) python scripts/bench_serving.py \
    > /tmp/bench_serving_r5b.log 2>&1
  commit_artifacts "serving bench: codec rows re-measured (labeled protocol)"
fi

# ---- 5. q1-q8 span: anchors then the 8-quality nearest sweep ---------
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

commit_artifacts "artifacts: end-of-r5b-queue snapshot"
touch /tmp/r5b_queue_done
echo "$(date) r5b queue done (left=$(left_min)min)"
