#!/usr/bin/env bash
# Mine hard negatives with the current checkpoint (topk/sample/cluster sweep).
set -euo pipefail

MODEL=${MODEL:-outputs/models/contrastive-latest}

python -m rankpo_tpu.cli.get_hard_negatives \
    --model_name_or_path "$MODEL" \
    --input_file data/train_data_raw.jsonl \
    --output_prefix outputs/hard_negatives \
    --batch_size 256 \
    --max_query_length 1280 \
    --max_passage_length 4096 \
    --search_range 0-100 \
    --num_negatives 10 \
    --num_clusters 10 \
    --bf16 \
    --seed 42
