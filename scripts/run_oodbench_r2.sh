#!/bin/sh
# Round-2 refinement proof: wait for benchmark generation, then train the
# refiner on the real TPU and evaluate refined-vs-input on held-out OOD
# scenes. Artifacts: output/oodbench_r2/{history.json,train.log,eval/...},
# eval.csv rows (refined + input), REFINEMENT.md summary data.
set -e
cd "$(dirname "$0")/.."

# wait for the generator to finish (N_SCENES=total scenes, default 40)
N_SCENES=${N_SCENES:-40}
while [ "$(wc -l < data/oodbench/generation_summary.jsonl 2>/dev/null || echo 0)" -lt "$N_SCENES" ]; do
    sleep 60
done
echo "generation complete: $(wc -l < data/oodbench/generation_summary.jsonl) scenes"
sleep 30   # let the generator process exit cleanly (single TPU process rule)

OUT=output/oodbench_r2
python train.py --dataset oodbench --model ptv3_base --output_dir "$OUT" \
    --max_steps 12000 \
    --override train.total_steps=12000 \
    --override train.eval_interval=1000 \
    --override train.save_interval=2000 \
    --override train.log_interval=20 \
    --override train.log_image_interval=1000 \
    --override train.optimizer.warmup_steps=200 \
    --override train.optimizer.schedule=cosine \
    --override "train.optimizer.lr_dict={'base': 1e-4, 'backbone': 1e-4}"

# final eval with input comparison (writes eval.csv + metrics_input JSONs)
python train.py --dataset oodbench --model ptv3_base --output_dir "$OUT" \
    --only_eval --compare_with_input --eval_subdir test \
    --override train.total_steps=12000
echo "RUN COMPLETE"
