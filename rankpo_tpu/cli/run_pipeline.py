"""End-to-end stage-1 iteration driver.

The reference's README pipeline ("Stage 1 iterated n times", imgs/overview.png:
rule-labeled data → contrastive learning → hard-negative mining → retrain) is
run by hand through separate scripts upstream; this orchestrator automates it:

  iteration 0: random-negative bootstrap (get_random_negatives)
  each iteration: contrastive training → hard-negative mining with the fresh
                  checkpoint → next iteration trains on the mined negatives
  finally: prediction pairs for AI annotation (stage-2 input)

Input: mining-format jsonl ({"query": {"text"}, "positives": {"text": [...]}}).
"""

from __future__ import annotations

import argparse
import logging
import os

import jax.numpy as jnp

from rankpo_tpu.cli.arguments import resolve_tokenizer
from rankpo_tpu.utils.logging import setup_logging

logger = logging.getLogger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name_or_path", required=True)
    parser.add_argument("--tokenizer_name", default=None)
    parser.add_argument("--raw_data", required=True,
                        help="mining-format jsonl (query/positives text)")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--iterations", type=int, default=2)
    parser.add_argument("--num_negatives", type=int, default=8)
    parser.add_argument("--mining_method", default="topk")
    parser.add_argument("--search_range", default="0-50")
    parser.add_argument("--num_train_epochs", type=int, default=1)
    parser.add_argument("--per_device_train_batch_size", type=int, default=8)
    parser.add_argument("--learning_rate", type=float, default=1e-5)
    parser.add_argument("--temperature", type=float, default=0.02)
    parser.add_argument("--max_query_length", type=int, default=32)
    parser.add_argument("--max_passage_length", type=int, default=128)
    parser.add_argument("--batch_size", type=int, default=64,
                        help="inference batch size for mining")
    parser.add_argument("--query_data", default=None,
                        help="optional eval-format queries: generate stage-2 "
                             "prediction pairs with the final model")
    parser.add_argument("--corpus_data", default=None)
    parser.add_argument("--num_predictions", type=int, default=5)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--gradient_checkpointing", action="store_true",
                        help="remat the training steps (a fresh Trainer is "
                             "built every iteration while the previous "
                             "iteration's encoder/index buffers are still "
                             "draining — remat keeps the peak in budget at "
                             "100M+ params on one chip)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--log_level", default="info")
    args = parser.parse_args(argv)

    setup_logging(args.log_level)
    os.makedirs(args.output_dir, exist_ok=True)

    from rankpo_tpu.cli.run_contrastive import main as run_contrastive
    from rankpo_tpu.core.mesh import local_mesh
    from rankpo_tpu.index import InferenceEncoder
    from rankpo_tpu.models import load_pretrained
    from rankpo_tpu.tools import find_hard_negatives, find_random_negatives

    # iteration 0: random-negative bootstrap
    train_file = os.path.join(args.output_dir, "train_iter0.jsonl")
    find_random_negatives(
        args.raw_data, train_file,
        num_negatives=max(args.num_negatives * 2, args.num_negatives + 2),
        seed=args.seed,
    )

    model_path = args.model_name_or_path
    mesh = local_mesh()
    for it in range(args.iterations):
        run_dir = os.path.join(args.output_dir, f"iter{it}")
        logger.info("=== iteration %d: training from %s ===", it, model_path)
        run_contrastive([
            "--model_name_or_path", model_path,
            *(["--tokenizer_name", args.tokenizer_name]
              if args.tokenizer_name else []),
            "--train_data", train_file,
            "--output_dir", run_dir,
            "--learning_rate", str(args.learning_rate),
            "--num_train_epochs", str(args.num_train_epochs),
            "--per_device_train_batch_size",
            str(args.per_device_train_batch_size),
            "--num_negatives", str(args.num_negatives),
            "--temperature", str(args.temperature),
            "--max_query_length", str(args.max_query_length),
            "--max_passage_length", str(args.max_passage_length),
            "--bf16", "True" if args.bf16 else "False",
            "--gradient_checkpointing",
            "True" if args.gradient_checkpointing else "False",
            "--seed", str(args.seed),
            "--save_strategy", "no",
            "--overwrite_output_dir",
        ])
        model_path = run_dir

        if it + 1 < args.iterations:
            logger.info("=== iteration %d: mining hard negatives ===", it)
            config, params = load_pretrained(model_path)
            tokenizer = resolve_tokenizer(args.tokenizer_name, model_path)
            encoder = InferenceEncoder(
                config, params, tokenizer, mesh=mesh,
                compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            )
            mined_dir = os.path.join(args.output_dir, f"mined_iter{it}")
            outputs = find_hard_negatives(
                encoder, args.raw_data, mined_dir,
                max_query_length=args.max_query_length,
                max_passage_length=args.max_passage_length,
                num_negatives=max(args.num_negatives * 2,
                                  args.num_negatives + 2),
                search_range=args.search_range,
                method=args.mining_method,
                batch_size=args.batch_size,
                lambda_=0.5,
                seed=args.seed,
                mesh=mesh,
            )
            train_file = next(iter(outputs.values()))
            # free the mining encoder's device params/programs BEFORE the
            # next iteration's Trainer allocates its own state — at 100M+
            # params both don't fit one chip alongside activations
            del encoder, params
            import gc

            gc.collect()

    if args.query_data and args.corpus_data:
        from rankpo_tpu.tools import generate_predictions

        config, params = load_pretrained(model_path)
        tokenizer = resolve_tokenizer(args.tokenizer_name, model_path)
        encoder = InferenceEncoder(
            config, params, tokenizer, mesh=mesh,
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        )
        preds_file = os.path.join(args.output_dir, "prediction_pairs.jsonl")
        generate_predictions(
            encoder, args.query_data, args.corpus_data, preds_file,
            max_query_length=args.max_query_length,
            max_passage_length=args.max_passage_length,
            search_range=args.search_range,
            num_predictions=args.num_predictions,
            batch_size=args.batch_size,
            seed=args.seed,
            mesh=mesh,
        )
        logger.info("stage-2 prediction pairs at %s", preds_file)

    logger.info("pipeline finished; final model at %s", model_path)
    return model_path


if __name__ == "__main__":
    main()
