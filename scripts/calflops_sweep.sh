#!/bin/bash
# FLOPs sweep across compression modes x rates (reference calflops.sh).
for ALGO in base tome pitome tofu prune patch wpatch algm; do
  if [ "$ALGO" = "base" ]; then
    python calflops.py --model ptv3_base --cpu
    continue
  fi
  for RATE in 0.1 0.3 0.5 0.7 0.9; do
    python calflops.py --model "ptv3_$ALGO" --merge_rate "$RATE" --cpu
  done
done
