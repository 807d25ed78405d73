#!/usr/bin/env bash
# Generate top-prediction candidate pairs for AI-preference annotation
# (the workload the reference implies but does not ship).
set -euo pipefail

MODEL=${MODEL:-outputs/models/contrastive-latest}

python -m rankpo_tpu.cli.get_predictions \
    --model_name_or_path "$MODEL" \
    --query_data data/eval_queries.jsonl \
    --corpus_data data/eval_corpus.jsonl \
    --output_file outputs/predictions/prediction_pairs.jsonl \
    --batch_size 256 \
    --max_query_length 1280 \
    --max_passage_length 4096 \
    --search_range 0-100 \
    --method topk \
    --num_predictions 10 \
    --bf16 \
    --seed 42
