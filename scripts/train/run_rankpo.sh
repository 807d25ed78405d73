#!/usr/bin/env bash
# Stage-2 RankPO training recipe (paper settings: reference-free sigmoid,
# beta=2.0, temperature=0.1).
set -euo pipefail

method=rankpo
run_name=$method-$(date +%Y-%m-%d)
OUTPUT_DIR=${OUTPUT_DIR:-outputs/models/$run_name}
MODEL=${MODEL:-outputs/models/contrastive-latest}   # stage-1 checkpoint

mkdir -p "$OUTPUT_DIR"

python -m rankpo_tpu.cli.run_rankpo \
    --model_name_or_path "$MODEL" \
    --train_data data/predictions/annotated_pair_data.jsonl \
    --output_dir "$OUTPUT_DIR" \
    --learning_rate 1e-5 \
    --lr_scheduler_type cosine \
    --warmup_ratio 0.1 \
    --bf16 \
    --gradient_checkpointing \
    --num_train_epochs 3 \
    --per_device_train_batch_size 8 \
    --gradient_accumulation_steps 4 \
    --reference_free \
    --disable_dropout False \
    --sft_weight 0.0 \
    --rankpo_weight 1.0 \
    --loss_type sigmoid \
    --temperature 0.1 \
    --beta 2.0 \
    --max_query_length 1280 \
    --max_passage_length 4096 \
    --logging_steps 1 \
    --log_level info \
    --save_strategy epoch \
    --save_only_model \
    --run_name "$run_name"
