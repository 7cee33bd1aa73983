#!/bin/sh
# Round-5 post-training chip sequence, ordered by VERDICT priority and
# sized for the remaining wall clock. One TPU process at a time
# (CLAUDE.md). The r4-checkpoint merge-family rows stay in eval.csv under
# the -r4ck tag (their own base/input anchors); everything below runs on
# the r5 best checkpoint + the 32-scene held-out set. The final best-ckpt
# eval + refinement report already ran inside scripts/run_scale_r5.sh.
set -e
cd "$(dirname "$0")/.."
RUN=${RUN:-output/oodbench_scale_r5}

echo "=== bench cache prewarm (protects the driver's timed bench run) ==="
sh scripts/prewarm_bench.sh || true

echo "=== sweep: corrected downsampling (VERDICT #2) ==="
python scripts/eval_sweep_r4.py --run "$RUN" --dataset oodbench_scale \
    --pad 16384 --max_scenes 8 --algos fps,voxel,drop \
    --rates 0.1,0.3,0.5,0.7,0.9

echo "=== sweep: ToMeSD analogs (VERDICT #5) ==="
python scripts/eval_sweep_r4.py --run "$RUN" --dataset oodbench_scale \
    --pad 16384 --max_scenes 8 --algos important_patch,random_patch,progressive \
    --rates 0.1,0.5,0.9

echo "=== effective tokens on the trained ckpt (VERDICT #8) ==="
for combo in "algm 0.1" "algm 0.5" "algm 0.9" \
             "tome 0.5" "pitome 0.5" "prune 0.5"; do
  set -- $combo
  python calflops.py --model ptv3_$1 --dataset oodbench_scale \
      --merge_rate $2 --num_scenes 2 --ckpt "$RUN" \
      --override dataset.max_gs_num=16384 --override dataset.pad_to=16384 \
      --csv gflops_r5.csv || true
done

echo "=== sweep: full scale 65k pad (VERDICT #5) ==="
python scripts/eval_sweep_r4.py --run "$RUN" --dataset oodbench_scale \
    --pad 65536 --max_scenes 8 --algos tome,pitome,prune,algm \
    --rates 0.5 || true

echo "=== 512^2 tier (VERDICT #6; if time remains) ==="
sh scripts/run_512_tier.sh || true
echo "R5 POST SEQUENCE COMPLETE"
