#!/bin/bash
# Train SplatFormer-TPU on Objaverse-OOD (reference recipe: 8x GPU, accum 4,
# effective batch 32 scenes -> here: one process, scenes data-parallel over
# all local TPU chips; accumulate_step scales the effective batch).
# Usage: sh scripts/train-on-objaverse.sh <algo> <merge_rate>
ALGO=${1:-base}
RATE=${2:-0.0}
MODEL=ptv3_base
if [ "$ALGO" != "base" ]; then MODEL=ptv3_$ALGO; fi
python train.py \
  --model "$MODEL" --dataset objaverse --train_config default \
  --merge_rate "$RATE" \
  --output_dir "output/train-objaverse-$ALGO-$RATE" \
  --override "dataset.accumulate_step=4"
