#!/bin/bash
# Train on ShapeNet-OOD (reference scripts/train-on-shapenet*).
ALGO=${1:-base}
RATE=${2:-0.0}
MODEL=ptv3_base
if [ "$ALGO" != "base" ]; then MODEL=ptv3_$ALGO; fi
python train.py \
  --model "$MODEL" --dataset shapenet --train_config default \
  --merge_rate "$RATE" \
  --output_dir "output/train-shapenet-$ALGO-$RATE"
