"""Contrastive-learning entry point (stage 1).

Capability parity with the reference launcher (src/run_contrastive.py:42-245):
output-dir guard, seed, model + tokenizer setup with the Llama pad-token fix
and the 7 domain special tokens (+ embedding resize), jsonl dataset
tokenization, then training. Instead of torchrun + DeepSpeed this builds a
device mesh and hands a jit-compiled loss to the generic Trainer.

Usage (mirrors scripts/train/run_contrastive.sh flags):
  python -m rankpo_tpu.cli.run_contrastive \
      --model_name_or_path <hf-dir> --train_data data/train.jsonl \
      --output_dir outputs/run --temperature 0.02 --num_negatives 5 \
      --negatives_cross_device --bf16 --gradient_checkpointing ...
"""

from __future__ import annotations

import json
import logging
import os
import time

import jax

from rankpo_tpu.cli.arguments import (
    DistributedArguments,
    ContrastiveArguments,
    ModelArguments,
    TrainDataArguments,
    parse_dataclasses,
    resolve_tokenizer,
)
from rankpo_tpu.core.mesh import DATA_AXIS, MeshConfig, make_mesh
from rankpo_tpu.core.precision import policy_from_flags
from rankpo_tpu.data import ContrastiveCollator, ContrastiveDataset
from rankpo_tpu.data.tokenization import prepare_tokenizer
from rankpo_tpu.models import load_pretrained, resize_token_embeddings, save_pretrained
from rankpo_tpu.train import TrainConfig, Trainer, make_contrastive_loss_fn
from rankpo_tpu.train.checkpoint import latest_checkpoint
from rankpo_tpu.utils.logging import setup_logging

logger = logging.getLogger(__name__)


def guard_output_dir(cfg: TrainConfig) -> None:
    """Refuse to clobber a non-empty output dir (reference :49-57)."""
    if (
        os.path.exists(cfg.output_dir)
        and os.listdir(cfg.output_dir)
        and not cfg.overwrite_output_dir
        and not cfg.resume_from_checkpoint
    ):
        raise ValueError(
            f"Output directory ({cfg.output_dir}) already exists and is not "
            "empty. Use --overwrite_output_dir to overcome."
        )


def setup_model_and_tokenizer(model_args: ModelArguments):
    """Load encoder + tokenizer; apply pad-token rule, add domain special
    tokens, resize embeddings (reference :101-148)."""
    config, params = load_pretrained(model_args.model_name_or_path)
    tokenizer = resolve_tokenizer(
        model_args.tokenizer_name, model_args.model_name_or_path
    )
    if hasattr(tokenizer, "add_special_tokens"):  # real HF tokenizer
        new_size = prepare_tokenizer(tokenizer)
        if new_size != config.vocab_size:
            params, config = resize_token_embeddings(params, config, new_size)
            logger.info("resized token embeddings to %d", new_size)
        if config.pad_token_id is None:
            config.pad_token_id = tokenizer.pad_token_id
    pad_id = getattr(tokenizer, "pad_token_id", None)
    if pad_id is None:
        pad_id = config.pad_token_id or 0
    return config, params, tokenizer, pad_id


def main(argv=None):
    model_args, data_args, c_args, dist_args, train_cfg = parse_dataclasses(
        [ModelArguments, TrainDataArguments, ContrastiveArguments,
         DistributedArguments, TrainConfig],
        argv,
    )
    dist_args.initialize()
    setup_logging(train_cfg.log_level)
    guard_output_dir(train_cfg)
    logger.info("model args:\n%s", model_args.to_json_string())
    logger.info("data args:\n%s", data_args.to_json_string())
    logger.info("train config:\n%s", train_cfg.to_json_string())

    mesh = make_mesh(MeshConfig(model_parallel=train_cfg.model_parallel))
    logger.info("mesh: %s over %d devices", dict(mesh.shape), mesh.devices.size)
    # under tensor parallelism the flash kernel runs in a shard_map with heads
    # sharded over the model axis (ops/attention.py handles the wrap)

    config, params, tokenizer, pad_id = setup_model_and_tokenizer(model_args)

    # resolve resume BEFORE building anything model-dependent: the trainer's
    # resume_from only restores step/optimizer state — the WEIGHTS must come
    # from the checkpoint, or training silently continues from fresh base
    # weights at a mid-schedule LR
    resume = train_cfg.resume_from_checkpoint
    if resume in ("true", "True", "latest"):
        resume = latest_checkpoint(train_cfg.output_dir)
    if resume:
        logger.info("resume: loading weights from %s", resume)
        config, params = load_pretrained(resume)

    config.normalize = c_args.normalize_embeddings

    dataset_cls = ContrastiveDataset
    if data_args.streaming:
        from rankpo_tpu.data import StreamingContrastiveDataset as dataset_cls
    dataset = dataset_cls(
        data_args.train_data,
        tokenizer,
        max_query_length=data_args.max_query_length,
        max_passage_length=data_args.max_passage_length,
    )
    if data_args.pack_sequences:
        from rankpo_tpu.data.packing import (
            PackedContrastiveCollator,
            configure_multiprocess_packing,
        )

        collator = PackedContrastiveCollator(
            pad_token_id=pad_id,
            num_negatives=data_args.num_negatives,
            max_query_length=data_args.max_query_length,
            max_passage_length=data_args.max_passage_length,
            query_max_segments=data_args.pack_max_segments,
            passage_max_segments=data_args.pack_max_segments,
            rows_multiple=mesh.shape.get(DATA_AXIS, 1),
            seed=train_cfg.seed,
        )
        if jax.process_count() > 1:
            # hosts must agree on the packed row shapes forever: one
            # startup allgather fixes both budgets to the global max need
            # (+25% slack); rare overflow truncates-to-fit locally
            q_rows, p_rows = configure_multiprocess_packing(
                collator, dataset,
                train_cfg.per_device_train_batch_size
                * jax.local_device_count(),
            )
            logger.info(
                "packed multi-process budgets: query %d rows, passage %d "
                "rows per host", q_rows, p_rows,
            )
    else:
        collator = ContrastiveCollator(
            pad_token_id=pad_id,
            num_negatives=data_args.num_negatives,
            max_query_length=data_args.max_query_length,
            max_passage_length=data_args.max_passage_length,
            pad_multiple=data_args.pad_multiple,
            seed=train_cfg.seed,
        )

    global_micro = train_cfg.per_device_train_batch_size * mesh.devices.size
    steps_per_epoch = len(dataset) // (
        global_micro * train_cfg.gradient_accumulation_steps
    )
    total_steps = (
        train_cfg.max_steps
        if train_cfg.max_steps > 0
        else steps_per_epoch * train_cfg.num_train_epochs
    )

    policy = policy_from_flags(train_cfg.bf16, train_cfg.pure_bf16)
    loss_fn = make_contrastive_loss_fn(
        config,
        temperature=c_args.temperature,
        use_inbatch_neg=c_args.use_inbatch_neg,
        negatives_cross_device=c_args.negatives_cross_device,
        normalize_embeddings=c_args.normalize_embeddings,
        num_data_shards=mesh.shape[DATA_AXIS],
        compute_dtype=policy.compute_dtype,
        remat=train_cfg.gradient_checkpointing,
        remat_policy=train_cfg.gradient_checkpointing_policy,
        attn_impl=model_args.attn_impl,
        mesh=mesh if train_cfg.model_parallel > 1 else None,
    )

    from rankpo_tpu.utils.model_card import write_model_card

    def save_params_fn(directory, host_params):
        save_pretrained(directory, config, host_params)
        if hasattr(tokenizer, "save_pretrained"):
            tokenizer.save_pretrained(directory)
        # push_to_hub tagging analog (reference rankpo_trainer.py:647-654)
        write_model_card(
            directory,
            stage="contrastive",
            tags=["rankpo_tpu", "contrastive", "dense-retrieval"],
            base_model=model_args.model_name_or_path,
            training_args={
                "temperature": c_args.temperature,
                "negatives_cross_device": c_args.negatives_cross_device,
                "learning_rate": train_cfg.learning_rate,
                "per_device_train_batch_size":
                    train_cfg.per_device_train_batch_size,
            },
        )

    grad_fn = None
    if c_args.grad_cache:
        from rankpo_tpu.train.gradcache import make_contrastive_gradcache_grad_fn

        grad_fn = make_contrastive_gradcache_grad_fn(
            config,
            temperature=c_args.temperature,
            normalize_embeddings=c_args.normalize_embeddings,
            use_inbatch_neg=c_args.use_inbatch_neg,
            compute_dtype=policy.compute_dtype,
            remat=train_cfg.gradient_checkpointing,
            remat_policy=train_cfg.gradient_checkpointing_policy,
            attn_impl=model_args.attn_impl,
            mesh=mesh if train_cfg.model_parallel > 1 else None,
        )
        logger.info("gradient-cache accumulation: negative pool spans all "
                    "%d accumulation steps", train_cfg.gradient_accumulation_steps)

    from rankpo_tpu.utils.flops import (
        contrastive_sample_flops,
        contrastive_sample_tokens,
    )
    from rankpo_tpu.utils.wandb_utils import maybe_init_wandb

    group_size = 1 + data_args.num_negatives
    trainer = Trainer(
        loss_fn=loss_fn,
        grad_fn=grad_fn,
        params=params,
        mesh=mesh,
        config=train_cfg,
        total_steps=max(total_steps, 1),
        save_params_fn=save_params_fn,
        log_fn=maybe_init_wandb(train_cfg.wandb_project, train_cfg.run_name),
        # analytic FLOPs/token accounting at the static padded lengths
        # (tokens_per_sec + mfu in the log — utils/flops.py)
        sample_flops=contrastive_sample_flops(
            config,
            query_len=data_args.max_query_length,
            passage_len=data_args.max_passage_length,
            group_size=group_size,
            causal=config.is_llama,
        ),
        sample_tokens=contrastive_sample_tokens(
            query_len=data_args.max_query_length,
            passage_len=data_args.max_passage_length,
            group_size=group_size,
        ),
    )

    if resume:
        logger.info("resuming trainer state from %s", resume)
        trainer.resume_from(resume)

    from rankpo_tpu.eval.in_training import maybe_attach_retrieval_eval

    maybe_attach_retrieval_eval(
        trainer, data_args, config, tokenizer,
        mesh=mesh, attn_impl=model_args.attn_impl,
    )

    eval_dataset = None
    if data_args.eval_data:
        eval_dataset = ContrastiveDataset(
            data_args.eval_data,
            tokenizer,
            max_query_length=data_args.max_query_length,
            max_passage_length=data_args.max_passage_length,
        )

    t0 = time.time()
    history = trainer.train(dataset, collator, eval_dataset=eval_dataset)

    # final save at output_dir root (reference trainer.save_model(), :228)
    host_params = trainer.host_state(trainer.state.params)  # collective
    if jax.process_index() == 0:
        save_params_fn(train_cfg.output_dir, host_params)
        metrics = {
            "train_samples": len(dataset),
            "train_runtime": round(time.time() - t0, 2),
            "train_steps": int(trainer.state.step),
            "final_loss": next(
                (h["loss"] for h in reversed(history) if "loss" in h), None
            ),  # last TRAIN row; eval-only rows carry no "loss"
        }
        with open(os.path.join(train_cfg.output_dir, "train_results.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        with open(
            os.path.join(train_cfg.output_dir, "trainer_history.json"), "w"
        ) as f:
            json.dump(history, f, indent=2)
        logger.info("train metrics: %s", metrics)
    return history


if __name__ == "__main__":
    main()
