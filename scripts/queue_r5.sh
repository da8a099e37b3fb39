#!/usr/bin/env bash
# Round-5 measurement queue, ordered by the round-4 VERDICT's "Next"
# list: (1) finish the ms-ssim block (two qualities per model + the CLIC
# column, reference test_datasets.ipynb cells 16-18/24-26), (2) the two
# remaining wired-but-unmeasured features (GMM, fault repro), (3) codec
# rows that depend on this round's wide-decode work (gated on a
# dev-ready flag the builder touches), (4) the q1-q8 quality span.
# Every stage skips if its artifact exists and is bounded by a KILL
# timeout (tunnel faults hang clients instead of raising).
#
#   BUDGET_MIN=480 bash scripts/queue_r5.sh
set -u
cd "$(dirname "$0")/.."

BUDGET_MIN="${BUDGET_MIN:-480}"
START=$(date +%s)
HARD_END=$((START + BUDGET_MIN * 60))
REFDATA=/root/reference/task-oriented-PTQ/datasets
TECNICK=$REFDATA/tecnick100/tecnick/RGB_OR_1200x1200
CLIC=$REFDATA/clic41
# the builder touches this once wide-decode dev + its tests are done
CODEC_READY_FLAG=/tmp/r5_codec_ready
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
port_open() { (echo > /dev/tcp/127.0.0.1/8082) 2>/dev/null; }
device_ok() {
  timeout -s KILL 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
v = float(jax.jit(lambda a: (a @ a).sum())(x))
assert v == 256 * 256 * 256
EOF
}

echo "$(date) r5 queue up; waiting for TPU (budget ${BUDGET_MIN}min)"
while (( $(NOW) < HARD_END )); do
  if port_open && device_ok; then break; fi
  sleep 60
done
(( $(NOW) >= HARD_END )) && { echo "no TPU within budget"; exit 1; }
echo "$(date) TPU live; left=$(left_min)min"

# ======================================================================
# 1. ms-ssim block (VERDICT r4 Next #1): two qualities per model so a
#    BD-rate is computable, plus the CLIC column the reference has
#    (test_datasets.ipynb cell 18 for Lu2022, cells 24-26 for Cheng2020;
#    lambda table losses/losses.py:30-39 -> q5=31.73, q6=60.50).
# ======================================================================

# -- Lu2022 ms-ssim q5 anchor
if (( $(left_min) >= 35 )) && [ ! -f ckpts/lu2022msssim_q5.npz ]; then
  echo "$(date) == Lu2022 ms-ssim q5 anchor (left=$(left_min)min)"
  ATTEMPT_TIMEOUT=3600 retry 3 python -m rdoptq_tpu.cli.train \
    --arch Lu2022 --quality 5 --metric ms-ssim --lmbda 31.73 \
    --steps 8000 --data_dir "$TECNICK" \
    --out ckpts/lu2022msssim_q5.npz > /tmp/lu_msssim_q5_train.log 2>&1
  commit_ckpts "Lu2022 ms-ssim q5 anchor"
fi

# -- Lu2022 ms-ssim W8 nearest, q5+q6, Kodak+Tecnick+CLIC (re-runs q6 so
#    the table is one artifact with a consistent eval-set column set)
if (( $(left_min) >= 30 )) && [ -f ckpts/lu2022msssim_q5.npz ] && \
   ! python -c "
import json,sys
d=json.load(open('artifacts/lu2022_msssim_w8_nearest.json'))
sys.exit(0 if set(d['per_quality'])=={'5','6'} and
         'clic' in d['per_quality']['6']['extra'] else 1)" 2>/dev/null
then
  echo "$(date) == Lu2022 ms-ssim W8 nearest q5,6 (left=$(left_min)min)"
  retry 2 python -m rdoptq_tpu.cli.sweep --arch Lu2022 --qualities 5,6 \
    --ckpt_pattern 'ckpts/lu2022msssim_q{quality}.npz' \
    --n_bits_w 8 --n_bits_a 8 --iters_w 0 \
    --extra_eval "tecnick=$TECNICK,clic=$CLIC@1792x2048" \
    --out artifacts/lu2022_msssim_w8_nearest.json \
    > /tmp/lu_msssim_w8_q56.log 2>&1
  commit_artifacts "Lu2022 ms-ssim q5+q6 W8 nearest (Kodak/Tecnick/CLIC)"
fi

# -- Lu2022 ms-ssim W8A8 RDO, q5+q6, Kodak+Tecnick+CLIC
if (( $(left_min) >= 70 )) && [ -f ckpts/lu2022msssim_q5.npz ] && \
   ! python -c "
import json,sys
d=json.load(open('artifacts/lu2022_msssim_w8a8_rdo.json'))
sys.exit(0 if set(d['per_quality'])=={'5','6'} and
         'clic' in d['per_quality']['6']['extra'] else 1)" 2>/dev/null
then
  echo "$(date) == Lu2022 ms-ssim W8A8 RDO q5,6 (left=$(left_min)min)"
  ATTEMPT_TIMEOUT=3600 retry 3 python -m rdoptq_tpu.cli.sweep \
    --arch Lu2022 --qualities 5,6 \
    --ckpt_pattern 'ckpts/lu2022msssim_q{quality}.npz' \
    --n_bits_w 8 --n_bits_a 8 --act_quant --iters_w 2000 --batch_size 2 \
    --calib_dir "$CLIC" \
    --extra_eval "tecnick=$TECNICK,clic=$CLIC@1792x2048" \
    --out artifacts/lu2022_msssim_w8a8_rdo.json \
    > /tmp/lu_msssim_rdo_q56.log 2>&1
  commit_artifacts "Lu2022 ms-ssim q5+q6 W8A8 RDO (Kodak/Tecnick/CLIC)"
fi

# -- Cheng2020 ms-ssim anchors (q6 then q5)
for ql in "6 60.50" "5 31.73"; do
  set -- $ql
  if (( $(left_min) >= 35 )) && [ ! -f "ckpts/cheng2020msssim_q$1.npz" ]
  then
    echo "$(date) == Cheng2020 ms-ssim q$1 anchor (left=$(left_min)min)"
    ATTEMPT_TIMEOUT=3600 retry 3 python -m rdoptq_tpu.cli.train \
      --arch Cheng2020 --quality "$1" --metric ms-ssim --lmbda "$2" \
      --steps 8000 --data_dir "$TECNICK" \
      --out "ckpts/cheng2020msssim_q$1.npz" \
      > "/tmp/cheng_msssim_q$1_train.log" 2>&1
    commit_ckpts "Cheng2020 ms-ssim q$1 anchor"
  fi
done

# -- Cheng2020 ms-ssim W8 nearest, q5+q6, Kodak+Tecnick (CLIC for Cheng
#    runs as its own stage below: the N=192 g_s upsample fault history
#    means a 2K Cheng eval must not be able to sink this stage)
if (( $(left_min) >= 25 )) && [ -f ckpts/cheng2020msssim_q5.npz ] && \
   [ -f ckpts/cheng2020msssim_q6.npz ] && \
   [ ! -f artifacts/cheng2020_msssim_w8_nearest.json ]; then
  echo "$(date) == Cheng2020 ms-ssim W8 nearest q5,6 (left=$(left_min)min)"
  retry 2 python -m rdoptq_tpu.cli.sweep --arch Cheng2020 --qualities 5,6 \
    --ckpt_pattern 'ckpts/cheng2020msssim_q{quality}.npz' \
    --n_bits_w 8 --n_bits_a 8 --iters_w 0 \
    --extra_eval "tecnick=$TECNICK" \
    --out artifacts/cheng2020_msssim_w8_nearest.json \
    > /tmp/cheng_msssim_w8.log 2>&1
  commit_artifacts "Cheng2020 ms-ssim q5+q6 W8 nearest (Kodak/Tecnick)"
fi

# -- Cheng2020 ms-ssim W8A8 RDO, q5+q6, Kodak+Tecnick
if (( $(left_min) >= 75 )) && [ -f ckpts/cheng2020msssim_q5.npz ] && \
   [ -f ckpts/cheng2020msssim_q6.npz ] && \
   [ ! -f artifacts/cheng2020_msssim_w8a8_rdo.json ]; then
  echo "$(date) == Cheng2020 ms-ssim W8A8 RDO q5,6 (left=$(left_min)min)"
  ATTEMPT_TIMEOUT=3600 retry 3 python -m rdoptq_tpu.cli.sweep \
    --arch Cheng2020 --qualities 5,6 \
    --ckpt_pattern 'ckpts/cheng2020msssim_q{quality}.npz' \
    --n_bits_w 8 --n_bits_a 8 --act_quant --iters_w 2000 --batch_size 2 \
    --calib_dir "$CLIC" --extra_eval "tecnick=$TECNICK" \
    --out artifacts/cheng2020_msssim_w8a8_rdo.json \
    > /tmp/cheng_msssim_rdo.log 2>&1
  commit_artifacts "Cheng2020 ms-ssim q5+q6 W8A8 RDO (Kodak/Tecnick)"
fi

# ======================================================================
# 2. wired-but-unmeasured features (VERDICT r4 Next #2; bias-correct and
#    mixed-precision landed before this session)
# ======================================================================

if (( $(left_min) >= 65 )) && [ ! -f artifacts/cheng2020gmm_w8a8_rdo.json ]
then
  echo "$(date) == GMM pipeline (left=$(left_min)min)"
  timeout -s KILL $(budget_s) bash scripts/repro_gmm.sh 6000 2000 \
    >> /tmp/gmm_pipeline.log 2>&1
  commit_ckpts "Cheng2020 GMM anchor"
  commit_artifacts "Cheng2020 GMM: trained anchor + W8A8 sweep"
fi

if (( $(left_min) >= 30 )) && [ ! -f artifacts/fault_repro.json ]; then
  echo "$(date) == fault repro (left=$(left_min)min)"
  timeout -s KILL $(clamp 5400) python scripts/fault_repro.py \
    > /tmp/fault_repro_q.log 2>&1
  commit_artifacts "fault repro: Cheng2020 N=192 g_s unit batch bisect"
fi

# ======================================================================
# 3. codec rows (VERDICT r4 Next #3/#4/#6) — wait up to 30 min for the
#    builder's wide-decode dev flag, then run whatever scripts exist
# ======================================================================
WAITED=0
while [ ! -f "$CODEC_READY_FLAG" ] && (( WAITED < 30 )) && \
      (( $(left_min) > 90 )); do sleep 60; WAITED=$((WAITED+1)); done

if [ -f "$CODEC_READY_FLAG" ]; then
  # small-image decode through the wide single-dispatch path
  if (( $(left_min) >= 20 )) && ! python -c "
import json,sys
d=json.load(open('artifacts/codec_small_bench.json'))
sys.exit(0 if 'wide' in json.dumps(d) else 1)" 2>/dev/null; then
    echo "$(date) == small-image wide codec bench (left=$(left_min)min)"
    retry 2 python scripts/codec_small_bench.py > /tmp/codec_small_r5.log 2>&1
    commit_artifacts "codec: small-image bench through the wide decode path"
  fi
  # batched wide decode throughput (amortize the tunnel fetch)
  if (( $(left_min) >= 25 )) && [ -f scripts/wide_batch_bench.py ] && \
     [ ! -f artifacts/wide_batch_bench.json ]; then
    echo "$(date) == batched wide decode throughput (left=$(left_min)min)"
    retry 2 python scripts/wide_batch_bench.py > /tmp/wide_batch.log 2>&1
    commit_artifacts "codec: batched wide decode throughput row"
  fi
  # refresh the stale serving_bench codec rows under the new protocol
  if (( $(left_min) >= 25 )) && ! grep -q timing_protocol \
       artifacts/serving_bench.json 2>/dev/null; then
    echo "$(date) == serving bench refresh (left=$(left_min)min)"
    timeout -s KILL $(clamp 3000) python scripts/bench_serving.py \
      > /tmp/bench_serving_r5.log 2>&1
    commit_artifacts "serving bench: codec rows re-measured (labeled protocol)"
  fi
fi

# ======================================================================
# 4. quality span q1-q8 (VERDICT r4 Next #7)
# ======================================================================
if (( $(left_min) >= 40 )) && [ ! -f artifacts/lu2022_w8_nearest_q1q8.json ]
then
  for ql in "1 0.0018" "2 0.0035" "7 0.0932" "8 0.1800"; do
    set -- $ql
    if (( $(left_min) >= 35 )) && [ ! -f "ckpts/lu2022_q$1.npz" ]; then
      echo "$(date) == Lu2022 q$1 anchor (left=$(left_min)min)"
      ATTEMPT_TIMEOUT=3600 retry 3 python -m rdoptq_tpu.cli.train \
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
    retry 3 python -m rdoptq_tpu.cli.sweep --arch Lu2022 \
      --qualities 1,2,3,4,5,6,7,8 \
      --ckpt_pattern 'ckpts/lu2022_q{quality}.npz' \
      --n_bits_w 8 --n_bits_a 8 --iters_w 0 \
      --out artifacts/lu2022_w8_nearest_q1q8.json \
      > /tmp/lu2022_q1q8.log 2>&1
    commit_artifacts "Lu2022 q1-q8 W8 nearest (full reference quality span)"
  fi
fi

# optional tail: Cheng2020 ms-ssim CLIC column (separate artifact so a
# 2K Cheng device fault can't cost anything above)
if (( $(left_min) >= 25 )) && [ -f ckpts/cheng2020msssim_q5.npz ] && \
   [ -f ckpts/cheng2020msssim_q6.npz ] && \
   [ ! -f artifacts/cheng2020_msssim_clic_w8_nearest.json ]; then
  echo "$(date) == Cheng2020 ms-ssim CLIC W8 nearest (left=$(left_min)min)"
  retry 2 python -m rdoptq_tpu.cli.sweep --arch Cheng2020 --qualities 5,6 \
    --ckpt_pattern 'ckpts/cheng2020msssim_q{quality}.npz' \
    --n_bits_w 8 --n_bits_a 8 --iters_w 0 \
    --test_dir "$CLIC" --eval_pad_to 1792x2048 \
    --out artifacts/cheng2020_msssim_clic_w8_nearest.json \
    > /tmp/cheng_msssim_clic.log 2>&1
  commit_artifacts "Cheng2020 ms-ssim CLIC-30 W8 nearest"
fi

commit_artifacts "artifacts: end-of-r5-queue snapshot"
touch /tmp/r5_queue_done
echo "$(date) r5 queue done (left=$(left_min)min)"
