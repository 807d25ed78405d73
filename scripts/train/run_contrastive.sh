#!/usr/bin/env bash
# Stage-1 contrastive training recipe (TPU analog of the reference's
# 4-GPU torchrun + DeepSpeed launch). One process drives the whole mesh;
# multi-host pods add --coordinator_address via jax.distributed.
set -euo pipefail

method=contrastive
run_name=$method-$(date +%Y-%m-%d)
OUTPUT_DIR=${OUTPUT_DIR:-outputs/models/$run_name}
MODEL=${MODEL:-meta-llama/Llama-3.2-1B}   # local HF-format checkpoint dir

mkdir -p "$OUTPUT_DIR"

python -m rankpo_tpu.cli.run_contrastive \
    --model_name_or_path "$MODEL" \
    --train_data data/train_data.jsonl \
    --output_dir "$OUTPUT_DIR" \
    --learning_rate 1e-5 \
    --lr_scheduler_type cosine \
    --warmup_ratio 0.1 \
    --bf16 \
    --gradient_checkpointing \
    --num_train_epochs 3 \
    --per_device_train_batch_size 8 \
    --gradient_accumulation_steps 4 \
    --num_negatives 5 \
    --use_inbatch_neg \
    --negatives_cross_device \
    --normalize_embeddings True \
    --temperature 0.02 \
    --max_query_length 1280 \
    --max_passage_length 4096 \
    --zero1 \
    --logging_steps 1 \
    --log_level info \
    --save_strategy epoch \
    --save_only_model \
    --run_name "$run_name"
