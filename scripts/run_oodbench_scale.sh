#!/bin/sh
# Reference-scale refinement proof (round 4, VERDICT r3 #1): train the
# refiner on DENSE 65k-class scenes at 256^2 and evaluate refined-vs-input
# on held-out OOD scenes, with the full r3 eval protocol (periodic
# input-compare evals, best-by-held-out-PSNR checkpoint, LPIPS active,
# done-marker gating) so the proof artifacts land automatically.
#
# Differences from the round-3 scale runner:
#   * generation seeds the fit from input-visible GT points (SfM-style,
#     what splatfacto does with COLMAP points3D) — scenes carry ~50k live
#     splats instead of ~12k in a 65k pad;
#   * binning budgets auto-calibrate at training start from measured tile
#     statistics (ops/calibrate.py) — num_dropped reads ~0 throughout;
#   * same artifact set as run_oodbench_r3.sh: $OUT/{eval.csv,history.json,
#     best.json,...} -> make_refinement_report.py.
set -e
cd "$(dirname "$0")/.."

N_TRAIN=${N_TRAIN:-36}
N_TEST=${N_TEST:-8}
STEPS=${STEPS:-5000}
OUT=${OUT:-output/oodbench_scale_r4}
DATA=${DATA:-data/oodbench_scale}
MAX_WAIT_S=${MAX_WAIT_S:-21600}

if [ "${SKIP_GEN:-0}" != "1" ]; then
python scripts/make_ood_benchmark.py --out "$DATA" \
    --n_train_scenes "$N_TRAIN" --n_test_scenes "$N_TEST" --hw 256 \
    --n_gauss 98304 --capacity 65536 --fit_steps 500 \
    --seed_points 49152 --densify_budget_frac 0.08 --fit_warmup 100 \
    --max_intersects 524288 --tiers 8,32768,24,4096
fi

count_done() {
    ls "$DATA"/$1/colmap/*/sparse/0/points3D.bin 2>/dev/null | wc -l
}
waited=0
while [ "$(count_done train)" -lt "$N_TRAIN" ] || \
      [ "$(count_done test)" -lt "$N_TEST" ]; do
    if [ "$waited" -ge "$MAX_WAIT_S" ]; then
        echo "ABORT: scenes incomplete after ${MAX_WAIT_S}s" >&2
        exit 1
    fi
    echo "waiting for scenes: train $(count_done train)/$N_TRAIN," \
         "test $(count_done test)/$N_TEST"
    sleep 60
    waited=$((waited + 60))
done
echo "generation complete: $(count_done train) train + $(count_done test) test"
sleep 30   # let the generator process exit cleanly (single TPU process rule)

[ -f weights/lpips_vgg.npz ] || \
    python scripts/make_synthetic_lpips_weights.py --out weights/lpips_vgg.npz

python train.py --dataset oodbench_scale --model ptv3_base \
    --output_dir "$OUT" \
    --max_steps "$STEPS" \
    --override train.total_steps="$STEPS" \
    --override train.eval_interval=500 \
    --override train.save_interval=1000 \
    --override train.log_interval=20 \
    --override train.log_image_interval=1000 \
    --override train.optimizer.warmup_steps=200 \
    --override train.optimizer.schedule=cosine \
    --override "train.optimizer.lr_dict={'base': 7e-5, 'backbone': 7e-5}"

# final eval with input comparison from the BEST checkpoint (default)
python train.py --dataset oodbench_scale --model ptv3_base \
    --output_dir "$OUT" \
    --only_eval --compare_with_input --eval_subdir test \
    --override train.total_steps="$STEPS"
echo "SCALE RUN COMPLETE"
