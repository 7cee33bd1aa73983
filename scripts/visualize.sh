#!/bin/sh
# Attention visualization sweep — reference visualize.sh equivalent:
# per-head attention replay over the merging algorithms, PLY + HTML out.
# Usage: sh scripts/visualize.sh [merge_rate] [out_dir]
RATE=${1:-0.5}
OUT=${2:-visualization}
python visualize.py --algos base tome patch important_patch \
    --merge_rate "$RATE" --out "$OUT"
