#!/bin/bash
# Merge-rate sweep (reference eval.sh): eval a trained model across rates.
# Usage: sh scripts/eval_sweep.sh <algo> <output_dir_with_checkpoints>
ALGO=${1:-tome}
OUT=${2:-output/train-objaverse-base-0.0}
for RATE in 0.1 0.2 0.3 0.4 0.5 0.6 0.7 0.8 0.9; do
  python train.py \
    --model "ptv3_$ALGO" --dataset objaverse --only_eval \
    --merge_rate "$RATE" --output_dir "$OUT" \
    --eval_subdir "test-$ALGO-$RATE" --compare_with_input
done
