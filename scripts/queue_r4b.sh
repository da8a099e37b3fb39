#!/usr/bin/env bash
# Round-4 phase-2 queue: codec-decode profiling + ms-ssim block +
# quality-span extension.
# Run AFTER measurement_queue.sh exits (single chip — never concurrent).
#
#   BUDGET_MIN=120 bash scripts/queue_r4b.sh
set -u
cd "$(dirname "$0")/.."

BUDGET_MIN="${BUDGET_MIN:-150}"
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

# ---- wide-decode unroll profile (VERDICT r3 Next #4: dec <0.3 s or a
# measured floor; the scan-unroll change needs its A/B on real TPU)
if (( $(left_min) >= 25 )) && [ ! -f artifacts/wide_decode_profile.json ]
then
  echo "$(date) == wide decode profile"
  ATTEMPT_TIMEOUT=3600 retry 2 python scripts/wide_decode_profile.py \
    1,8,16,8:2048,16:2048,16:4096 > /tmp/wide_profile.log 2>&1
  commit_artifacts "wide codec: decode scan-unroll profile at 2K"
fi

# ---- codec breakdown re-measure (picks up the unroll=8 default; this
# is the headline 2K codec artifact RESULTS.md quotes). Skip once the
# breakdown is newer than the unroll profile — it already re-measured.
if (( $(left_min) >= 18 )) && \
   ! [ artifacts/codec_breakdown.json -nt artifacts/wide_decode_profile.json ]
then
  echo "$(date) == codec breakdown re-measure"
  timeout -s KILL $(clamp 1800) python scripts/codec_breakdown.py \
    > /tmp/codec_breakdown_r4.log 2>&1
  commit_artifacts "codec: 2K breakdown re-measured with unrolled wide-rANS decode"
fi

# ---- small-image dataset codec row (reference dataset_test.ipynb:
# Kodak24 downsampled 240x180, per-image enc/dec averages)
if (( $(left_min) >= 12 )) && [ ! -f artifacts/codec_small_bench.json ]
then
  echo "$(date) == small-image codec bench"
  retry 2 python scripts/codec_small_bench.py > /tmp/codec_small.log 2>&1
  commit_artifacts "codec: Kodak-downsampled dataset enc/dec row"
fi

# ---- ms-ssim W8 nearest row (the reference's ms-ssim block also has a
# weight-only column, test_datasets.ipynb cells 16-18) — nearly free
# once the main queue's ms-ssim anchor exists
if (( $(left_min) >= 12 )) && [ -f ckpts/lu2022msssim_q6.npz ] && \
   [ ! -f artifacts/lu2022_msssim_w8_nearest.json ]; then
  echo "$(date) == Lu2022 ms-ssim W8 nearest"
  retry 2 python -m rdoptq_tpu.cli.sweep --arch Lu2022 --qualities 6 \
    --ckpt_pattern 'ckpts/lu2022msssim_q{quality}.npz' \
    --n_bits_w 8 --n_bits_a 8 --iters_w 0 \
    --extra_eval "tecnick=$TECNICK" \
    --out artifacts/lu2022_msssim_w8_nearest.json \
    > /tmp/lu_msssim_w8.log 2>&1
  commit_artifacts "Lu2022 ms-ssim q6 W8 nearest row"
fi

# ---- second ms-ssim anchor (q5, λ=31.73) + its W8A8 row (VERDICT r3
# Next #3 asks >=2 ms-ssim anchors) — outranks the q7/q8 span
# extension below: the ms-ssim block is the larger reference gap
if (( $(left_min) >= 75 )) && \
   [ ! -f artifacts/lu2022_msssim_q5_w8a8_rdo.json ]; then
  if [ ! -f ckpts/lu2022msssim_q5.npz ]; then
    echo "$(date) == ms-ssim q5 anchor (left=$(left_min)min)"
    ATTEMPT_TIMEOUT=3600 retry 3 python -m rdoptq_tpu.cli.train \
      --arch Lu2022 --quality 5 --metric ms-ssim --lmbda 31.73 \
      --steps 8000 --data_dir "$TECNICK" \
      --out ckpts/lu2022msssim_q5.npz > /tmp/lu_msssim_q5_train.log 2>&1
    commit_ckpts "Lu2022 ms-ssim q5 anchor"
  fi
  retry 3 python -m rdoptq_tpu.cli.sweep --arch Lu2022 --qualities 5 \
    --ckpt_pattern 'ckpts/lu2022msssim_q{quality}.npz' \
    --n_bits_w 8 --n_bits_a 8 --act_quant --iters_w 2000 --batch_size 2 \
    --calib_dir "$REFDATA/clic41" --extra_eval "tecnick=$TECNICK" \
    --out artifacts/lu2022_msssim_q5_w8a8_rdo.json \
    > /tmp/lu_msssim_q5.log 2>&1
  commit_artifacts "Lu2022 ms-ssim q5: FP32 vs W8A8 rows"
fi

# ---- Cheng2020 ms-ssim q6 row (BASELINE test_datasets.ipynb cells
# 24-26: the reference's second ms-ssim model family)
if (( $(left_min) >= 70 )) && \
   [ ! -f artifacts/cheng2020_msssim_w8a8_rdo.json ]; then
  if [ ! -f ckpts/cheng2020msssim_q6.npz ]; then
    echo "$(date) == Cheng2020 ms-ssim q6 anchor (left=$(left_min)min)"
    ATTEMPT_TIMEOUT=3600 retry 3 python -m rdoptq_tpu.cli.train \
      --arch Cheng2020 --quality 6 --metric ms-ssim --lmbda 60.50 \
      --steps 8000 --data_dir "$TECNICK" \
      --out ckpts/cheng2020msssim_q6.npz \
      > /tmp/cheng_msssim_train.log 2>&1
    commit_ckpts "Cheng2020 ms-ssim q6 anchor"
  fi
  retry 3 python -m rdoptq_tpu.cli.sweep --arch Cheng2020 --qualities 6 \
    --ckpt_pattern 'ckpts/cheng2020msssim_q{quality}.npz' \
    --n_bits_w 8 --n_bits_a 8 --act_quant --iters_w 2000 --batch_size 2 \
    --calib_dir "$REFDATA/clic41" --extra_eval "tecnick=$TECNICK" \
    --out artifacts/cheng2020_msssim_w8a8_rdo.json \
    > /tmp/cheng_msssim.log 2>&1
  commit_artifacts "Cheng2020 ms-ssim q6: FP32 vs W8A8 rows"
fi

# ---- Lu2022 q7/q8 anchors + full q1-q8 W8 nearest sweep (reference
# registry spans q1-8, ckpts/image.py:47-58; q1/q2 come from the main
# queue's extension stage)
if (( $(left_min) >= 60 )) && [ ! -f artifacts/lu2022_w8_nearest_q1q8.json ]
then
  for ql in "7 0.0932" "8 0.1800"; do
    set -- $ql
    if [ ! -f "ckpts/lu2022_q$1.npz" ]; then
      echo "$(date) == Lu2022 q$1 anchor (left=$(left_min)min)"
      ATTEMPT_TIMEOUT=3600 retry 3 python -m rdoptq_tpu.cli.train \
        --arch Lu2022 --quality "$1" --lmbda "$2" --steps 8000 \
        --data_dir "$TECNICK" --out "ckpts/lu2022_q$1.npz" \
        > "/tmp/lu2022_q$1_train.log" 2>&1
      commit_ckpts "Lu2022 q$1 anchor"
    fi
  done
  if [ -f ckpts/lu2022_q1.npz ] && [ -f ckpts/lu2022_q7.npz ] && \
     [ -f ckpts/lu2022_q8.npz ]; then
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

commit_artifacts "artifacts: end-of-phase-2 snapshot"
echo "$(date) phase-2 queue done (left=$(left_min)min)"
