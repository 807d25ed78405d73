"""RankPO preference-training entry point (stage 2).

Capability parity with src/run_rankpo.py:47-265: loads the stage-1 checkpoint,
optionally a frozen reference model (unless --reference_free), the annotated
pair jsonl, and trains with the sigmoid/hinge preference loss. Paper recipe
(scripts/train/run_rankpo.sh): --reference_free --loss_type sigmoid --beta 2.0
--temperature 0.1.
"""

from __future__ import annotations

import json
import logging
import os
import time

import jax

from rankpo_tpu.cli.arguments import (
    DistributedArguments,
    ModelArguments,
    RankPOArguments,
    TrainDataArguments,
    parse_dataclasses,
)
from rankpo_tpu.cli.run_contrastive import guard_output_dir, setup_model_and_tokenizer
from rankpo_tpu.core.mesh import MeshConfig, make_mesh
from rankpo_tpu.core.precision import policy_from_flags
from rankpo_tpu.data import PairPreferenceDataset, RankPOCollator
from rankpo_tpu.models import load_pretrained, save_pretrained
from rankpo_tpu.train import TrainConfig, Trainer, make_rankpo_loss_fn
from rankpo_tpu.train.checkpoint import latest_checkpoint
from rankpo_tpu.utils.logging import setup_logging

logger = logging.getLogger(__name__)


def main(argv=None):
    model_args, data_args, r_args, dist_args, train_cfg = parse_dataclasses(
        [ModelArguments, TrainDataArguments, RankPOArguments,
         DistributedArguments, TrainConfig], argv
    )
    dist_args.initialize()
    setup_logging(train_cfg.log_level)
    guard_output_dir(train_cfg)
    logger.info("model args:\n%s", model_args.to_json_string())
    logger.info("rankpo args:\n%s", r_args.to_json_string())

    mesh = make_mesh(MeshConfig(model_parallel=train_cfg.model_parallel))
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

    ref_params = None
    if not r_args.reference_free:
        ref_path = r_args.ref_model_name_or_path or model_args.model_name_or_path
        _ref_cfg, ref_params = load_pretrained(ref_path)
        logger.info("loaded frozen reference model from %s", ref_path)

    dataset = PairPreferenceDataset(
        data_args.train_data,
        tokenizer,
        max_query_length=data_args.max_query_length,
        max_passage_length=data_args.max_passage_length,
    )
    if data_args.pack_sequences:
        from rankpo_tpu.core.mesh import DATA_AXIS
        from rankpo_tpu.data.packing import (
            PackedRankPOCollator,
            configure_multiprocess_packing,
        )

        collator = PackedRankPOCollator(
            pad_token_id=pad_id,
            max_query_length=data_args.max_query_length,
            max_passage_length=data_args.max_passage_length,
            query_max_segments=data_args.pack_max_segments,
            passage_max_segments=data_args.pack_max_segments,
            rows_multiple=mesh.shape.get(DATA_AXIS, 1),
        )
        if jax.process_count() > 1:
            # startup allgather fixes both packed row budgets to the global
            # max (+slack); overflow truncates-to-fit (see data/packing.py)
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
        collator = RankPOCollator(
            pad_token_id=pad_id,
            max_query_length=data_args.max_query_length,
            max_passage_length=data_args.max_passage_length,
            pad_multiple=data_args.pad_multiple,
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
    inner_loss_fn = make_rankpo_loss_fn(
        config,
        beta=r_args.beta,
        gamma_beta_ratio=r_args.gamma_beta_ratio,
        temperature=r_args.temperature,
        loss_type=r_args.loss_type,
        label_smoothing=r_args.label_smoothing,
        rankpo_weight=r_args.rankpo_weight,
        sft_weight=r_args.sft_weight,
        reference_free=r_args.reference_free,
        disable_dropout=r_args.disable_dropout,
        compute_dtype=policy.compute_dtype,
        remat=train_cfg.gradient_checkpointing,
        remat_policy=train_cfg.gradient_checkpointing_policy,
        attn_impl=model_args.attn_impl,
        mesh=mesh if train_cfg.model_parallel > 1 else None,
    )

    from rankpo_tpu.utils.model_card import write_model_card

    def _write_card(directory):
        # push_to_hub tagging analog (reference rankpo_trainer.py:647-654)
        write_model_card(
            directory,
            stage="rankpo",
            tags=["rankpo_tpu", "rankpo", "preference-optimization",
                  "dense-retrieval"]
                 + (["lora"] if r_args.use_lora else []),
            base_model=model_args.model_name_or_path,
            training_args={
                "loss_type": r_args.loss_type,
                "beta": r_args.beta,
                "temperature": r_args.temperature,
                "reference_free": r_args.reference_free,
                "learning_rate": train_cfg.learning_rate,
            },
        )

    if r_args.use_lora:
        from rankpo_tpu.models.lora import (
            LoraConfig, count_params, init_lora_params, make_lora_loss_fn,
            merge_lora,
        )
        from rankpo_tpu.utils.seed import set_seed as _seed

        targets = r_args.lora_target_modules
        if targets == "auto":
            # kernel names differ by family (llama body vs bert/roberta body)
            targets = "q_proj,v_proj" if config.is_llama else "query,value"
        lora_cfg = LoraConfig(
            r=r_args.lora_r,
            alpha=r_args.lora_alpha,
            target_modules=tuple(
                m.strip() for m in targets.split(",") if m.strip()
            ),
        )
        base_params = params
        params = init_lora_params(_seed(train_cfg.seed), base_params, lora_cfg)
        loss_fn = make_lora_loss_fn(inner_loss_fn, base_params, lora_cfg)
        logger.info(
            "LoRA: training %.2fM adapter params over a frozen %.2fM base",
            count_params(params) / 1e6, count_params(base_params) / 1e6,
        )

        def save_params_fn(directory, host_params):
            merged = jax.device_get(merge_lora(base_params, host_params, lora_cfg))
            save_pretrained(directory, config, merged)
            if hasattr(tokenizer, "save_pretrained"):
                tokenizer.save_pretrained(directory)
            _write_card(directory)
    else:
        loss_fn = inner_loss_fn

        def save_params_fn(directory, host_params):
            save_pretrained(directory, config, host_params)
            if hasattr(tokenizer, "save_pretrained"):
                tokenizer.save_pretrained(directory)
            _write_card(directory)

    from rankpo_tpu.utils.wandb_utils import maybe_init_wandb

    # frozen (non-trainable) weight trees ride the jitted step as ARGUMENTS —
    # closing over them would bake full models into the HLO as constants
    frozen = {}
    if ref_params is not None:
        frozen["ref"] = ref_params
    if r_args.use_lora:
        frozen["base"] = base_params

    from rankpo_tpu.utils.flops import (
        rankpo_sample_flops,
        rankpo_sample_tokens,
    )

    trainer = Trainer(
        loss_fn=loss_fn,
        params=params,
        mesh=mesh,
        config=train_cfg,
        total_steps=max(total_steps, 1),
        save_params_fn=save_params_fn,
        log_fn=maybe_init_wandb(train_cfg.wandb_project, train_cfg.run_name),
        frozen_params=frozen or None,
        # analytic FLOPs/token accounting at the static padded lengths
        # (tokens_per_sec + mfu in the log — utils/flops.py)
        sample_flops=rankpo_sample_flops(
            config,
            query_len=data_args.max_query_length,
            passage_len=data_args.max_passage_length,
            reference_free=ref_params is None,
            causal=config.is_llama,
        ),
        sample_tokens=rankpo_sample_tokens(
            query_len=data_args.max_query_length,
            passage_len=data_args.max_passage_length,
        ),
    )

    if resume:
        logger.info("resuming trainer state from %s", resume)
        trainer.resume_from(resume)

    from rankpo_tpu.eval.in_training import maybe_attach_retrieval_eval

    attached = maybe_attach_retrieval_eval(
        trainer, data_args, config, tokenizer,
        mesh=mesh, attn_impl=model_args.attn_impl,
    )
    if attached and r_args.use_lora:
        # the trainable tree is adapters only: merge with the frozen base
        # ON DEVICE (replicated out) before each retrieval encode
        from jax.sharding import NamedSharding, PartitionSpec as P

        hook = trainer.retrieval_eval_fn
        merge_fn = jax.jit(
            lambda base, lp: merge_lora(base, lp, lora_cfg),
            out_shardings=NamedSharding(mesh, P()),
        )
        trainer.retrieval_eval_fn = lambda p: hook(
            merge_fn(trainer.frozen_params["base"], p)
        )

    eval_dataset = None
    if data_args.eval_data:
        eval_dataset = PairPreferenceDataset(
            data_args.eval_data,
            tokenizer,
            max_query_length=data_args.max_query_length,
            max_passage_length=data_args.max_passage_length,
        )

    t0 = time.time()
    history = trainer.train(dataset, collator, eval_dataset=eval_dataset)

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
        logger.info("train metrics: %s", metrics)
    return history


if __name__ == "__main__":
    main()
