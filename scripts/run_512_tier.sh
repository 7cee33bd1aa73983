#!/bin/sh
# 512^2 resolution tier (VERDICT r4 item 6): the stepping stone from the
# 256^2 benchmark regime toward the reference's ~1 MPx real-scene
# evaluation (dataset/GS.py:128-151 loads full-res PNGs). Generates a small
# dense-scene set rendered at 512^2, auto-calibrates binning budgets at the
# new resolution (ops/calibrate.py), trains a short refinement run at the
# 65k pad, and evaluates refined-vs-input on the held-out scenes. Artifacts
# land under $OUT for SCALE.md's 512^2 row (throughput + quality +
# num_dropped).
set -e
cd "$(dirname "$0")/.."

N_TRAIN=${N_TRAIN:-8}
N_TEST=${N_TEST:-4}
STEPS=${STEPS:-1200}
OUT=${OUT:-output/oodbench_512}
DATA=${DATA:-data/oodbench_512}

if [ "${SKIP_GEN:-0}" != "1" ]; then
python scripts/make_ood_benchmark.py --out "$DATA" \
    --n_train_scenes "$N_TRAIN" --n_test_scenes "$N_TEST" --hw 512 \
    --n_gauss 98304 --capacity 65536 --fit_steps 500 \
    --seed_points 49152 --densify_budget_frac 0.08 --fit_warmup 100 \
    --max_intersects 2097152 --tiers 16,65536,48,8192
fi

python train.py --dataset oodbench_512 --model ptv3_base \
    --output_dir "$OUT" \
    --max_steps "$STEPS" \
    --override train.total_steps="$STEPS" \
    --override train.eval_interval=300 \
    --override train.save_interval=600 \
    --override train.log_interval=20 \
    --override train.log_image_interval=1000 \
    --override train.optimizer.warmup_steps=100 \
    --override train.optimizer.schedule=cosine \
    --override "train.optimizer.lr_dict={'base': 7e-5, 'backbone': 7e-5}"

python train.py --dataset oodbench_512 --model ptv3_base \
    --output_dir "$OUT" \
    --only_eval --compare_with_input --eval_subdir test \
    --override train.total_steps="$STEPS"
echo "512 TIER COMPLETE"
