#!/bin/sh
# Round-5 post-training chip sequence (run after output/oodbench_scale_r5
# training completes). One coherent efficiency study on the r5 best
# checkpoint + 32-scene held-out set, then ALGM token measurement, the
# 512^2 tier, and the rasterizer trace. Sequential — one TPU process at a
# time (CLAUDE.md).
set -e
cd "$(dirname "$0")/.."
RUN=${RUN:-output/oodbench_scale_r5}

echo "=== final eval from best checkpoint (input comparison) ==="
python train.py --dataset oodbench_scale --model ptv3_base \
    --output_dir "$RUN" \
    --only_eval --compare_with_input --eval_subdir test \
    --override train.total_steps=10000

echo "=== sweep: downsampling (corrected fps/voxel/drop) ==="
python scripts/eval_sweep_r4.py --run "$RUN" --dataset oodbench_scale \
    --pad 16384 --algos fps,voxel,drop --rates 0.1,0.3,0.5,0.7,0.9

echo "=== sweep: merging family ==="
python scripts/eval_sweep_r4.py --run "$RUN" --dataset oodbench_scale \
    --pad 16384 --algos tome,pitome,tofu,prune,patch,wpatch,algm \
    --rates 0.1,0.3,0.5,0.7,0.9

echo "=== sweep: ToMeSD analogs ==="
python scripts/eval_sweep_r4.py --run "$RUN" --dataset oodbench_scale \
    --pad 16384 --algos random_patch,progressive,important_patch \
    --rates 0.1,0.5,0.9

echo "=== sweep: full scale (65k pad) ==="
python scripts/eval_sweep_r4.py --run "$RUN" --dataset oodbench_scale \
    --pad 65536 --max_scenes 8 --algos tome,pitome,prune,algm --rates 0.1,0.5,0.9

echo "=== effective tokens (trained ckpt; ALGM is the target, VERDICT #8) ==="
for combo in "algm 0.1" "algm 0.3" "algm 0.5" "algm 0.7" "algm 0.9" \
             "tome 0.5" "pitome 0.5" "prune 0.5"; do
  set -- $combo
  python calflops.py --model ptv3_$1 --dataset oodbench_scale \
      --merge_rate $2 --num_scenes 2 --ckpt "$RUN" \
      --override dataset.max_gs_num=16384 --override dataset.pad_to=16384 \
      --csv gflops_r5.csv || true
done

echo "=== refinement report ==="
python scripts/make_refinement_report.py --run "$RUN" \
    --archive reports/oodbench_r5 || true

echo "=== 512^2 tier ==="
sh scripts/run_512_tier.sh || true

echo "=== rasterizer trace + prewarm ==="
python tools/profile_bench.py > output/profile_bench_r5.log 2>&1 || true
sh scripts/prewarm_bench.sh || true
echo "R5 POST SEQUENCE COMPLETE"
