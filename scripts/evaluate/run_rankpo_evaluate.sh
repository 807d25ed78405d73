#!/usr/bin/env bash
# Sweep-evaluate RankPO runs across learning rates x seeds (the reference's
# scripts/evaluate/run_rankpo_evaluate.sh workflow).
set -euo pipefail

lrs=${LRS:-"5e-7 1e-6 3e-6 5e-6 7e-6 1e-5"}
seeds=${SEEDS:-"42"}
BASE=${BASE:-outputs/models}

for lr in $lrs; do
  for seed in $seeds; do
    MODEL="$BASE/rankpo-lr$lr-seed$seed"
    [ -d "$MODEL" ] || continue
    python -m rankpo_tpu.cli.evaluate \
        --model_name_or_path "$MODEL" \
        --query_data data/eval_queries.jsonl \
        --corpus_data data/eval_corpus.jsonl \
        --output_dir outputs/test_results \
        --evaluate_all_checkpoints \
        --batch_size 256 \
        --max_query_length 1280 \
        --max_passage_length 4096 \
        --k 100 \
        --cutoffs 1,5,10,20,100 \
        --bf16
  done
done
