#!/bin/sh
# Round-5 scale rerun (VERDICT r4 item 4): same 65k-pad 256^2 recipe as
# run_oodbench_scale.sh but with a 32-scene held-out test set so the
# per-eval curve is measured against a ~0.1 dB noise floor (8 scenes gave
# +-0.2 dB, and the r4 "peak at step 1500" claim was noise-limited).
# Data generation is launched separately (scripts/make_ood_benchmark.py
# --n_test_scenes 32); this script only trains + evals.
set -e
cd "$(dirname "$0")/.."

STEPS=${STEPS:-5000}
OUT=${OUT:-output/oodbench_scale_r5}

[ -f weights/lpips_vgg.npz ] || \
    python scripts/make_synthetic_lpips_weights.py --out weights/lpips_vgg.npz

python train.py --dataset oodbench_scale --model ptv3_base \
    --output_dir "$OUT" \
    --max_steps "$STEPS" \
    --override train.total_steps="$STEPS" \
    --override train.eval_interval=750 \
    --override train.save_interval=1000 \
    --override train.log_interval=20 \
    --override train.log_image_interval=2500 \
    --override train.optimizer.warmup_steps=200 \
    --override train.optimizer.schedule=cosine \
    --override "train.optimizer.lr_dict={'base': 7e-5, 'backbone': 7e-5}"

# final eval with input comparison from the BEST checkpoint
python train.py --dataset oodbench_scale --model ptv3_base \
    --output_dir "$OUT" \
    --only_eval --compare_with_input --eval_subdir test \
    --override train.total_steps="$STEPS"

python scripts/make_refinement_report.py --run "$OUT" \
    --archive reports/oodbench_r5 || true
echo "SCALE R5 RUN COMPLETE"
