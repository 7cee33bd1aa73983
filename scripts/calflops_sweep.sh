#!/bin/bash
# FLOPs sweep across compression modes x rates (reference calflops.sh
# /root/reference/calflops.sh:22-33) -> gflops.csv with the reference
# schema 'gflops,algo,r'. Runs on the CPU backend (XLA cost analysis +
# analytic per-stage attention/MLP counts are backend-independent).
# N=16384 matches the oodbench training tier; one extra base row at the
# 65536 scale tier anchors the scale numbers.
set -e
cd "$(dirname "$0")/.."
N=${N:-16384}
SCENES=${SCENES:-2}
CSV=${CSV:-gflops.csv}

run() {
  python calflops.py --cpu --num_scenes "$SCENES" --csv "$CSV" \
    --override dataset.n_gaussians="$N" --override dataset.pad_to="$N" "$@"
}

# resumable: skip (algo, r) rows already in the CSV
have() { [ -f "$CSV" ] && grep -q ",$1,$2\$" "$CSV"; }

have base 0.0 || run --model ptv3_base
for ALGO in tome pitome tofu prune patch wpatch algm; do
  for RATE in 0.1 0.3 0.5 0.7 0.9; do
    have "$ALGO" "$RATE" || run --model "ptv3_$ALGO" --merge_rate "$RATE"
  done
done
# scale-tier anchor (65k-point scenes, the round-4 REFINEMENT_scale tier)
python calflops.py --cpu --num_scenes 1 --csv "$CSV" --model ptv3_base \
  --override dataset.n_gaussians=65536 --override dataset.pad_to=65536
echo "calflops sweep complete -> $CSV"
