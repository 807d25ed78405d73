"""Retrieval evaluation entry point (reference src/evaluate.py CLI surface)."""

from __future__ import annotations

import logging

import jax.numpy as jnp

from rankpo_tpu.cli.arguments import (
    DistributedArguments,
    EvaluateArguments,
    parse_dataclasses,
    parse_index_kwargs,
    resolve_tokenizer,
)
from rankpo_tpu.core.mesh import local_mesh
from rankpo_tpu.eval import evaluate_path
from rankpo_tpu.utils.logging import setup_logging

logger = logging.getLogger(__name__)


def main(argv=None):
    args, dist_args = parse_dataclasses(
        [EvaluateArguments, DistributedArguments], argv
    )
    dist_args.initialize()  # multi-host: local_mesh() then spans all hosts
    setup_logging(args.log_level)
    logger.info("evaluation arguments:\n%s", args.to_json_string())

    tokenizer = resolve_tokenizer(args.tokenizer_name, args.model_name_or_path)
    cutoffs = [int(c.strip()) for c in args.cutoffs.split(",")]
    # optional wandb metric logging (reference evaluate.py:269-274)
    from rankpo_tpu.utils.wandb_utils import maybe_init_wandb
    wandb_log = maybe_init_wandb(getattr(args, "wandb_project", ""), "auto")
    results = evaluate_path(
        args.model_name_or_path,
        args.query_data,
        args.corpus_data,
        args.output_dir,
        evaluate_all_checkpoints=args.evaluate_all_checkpoints,
        overwrite_output_dir=args.overwrite_output_dir,
        tokenizer=tokenizer,
        mesh=local_mesh(),
        batch_size=args.batch_size,
        max_query_length=args.max_query_length,
        max_passage_length=args.max_passage_length,
        k=args.k,
        cutoffs=cutoffs,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        index_type=args.index_type,
        index_recall_target=args.index_recall_target,
        index_kwargs=parse_index_kwargs(args.index_kwargs),
    )
    for name, metrics in results.items():
        print(f"== {name} ==")
        print("\n".join(f"    {k:15} {v}" for k, v in metrics.items()))
        if wandb_log is not None:
            wandb_log({f"{name}/{k}": v for k, v in metrics.items()})
            # per-checkpoint metric bar chart (reference evaluate.py:269-274)
            from rankpo_tpu.utils.wandb_utils import log_metric_bar_chart

            log_metric_bar_chart(metrics, name)
    return results


if __name__ == "__main__":
    main()
