#!/usr/bin/env bash
# Evaluate all checkpoints of a run on the FlatIP engine.
set -euo pipefail

MODEL=${MODEL:-outputs/models/contrastive-latest}

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
    --bf16 \
    --log_level info
