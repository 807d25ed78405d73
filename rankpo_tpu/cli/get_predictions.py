"""Prediction-pair generation entry point — the script the reference implies
via PredictionDataArguments (src/arguments.py:546-666) but does not ship."""

from __future__ import annotations

import logging

import jax.numpy as jnp

from rankpo_tpu.cli.arguments import (
    DistributedArguments,
    PredictionArguments,
    parse_dataclasses,
    parse_index_kwargs,
    resolve_tokenizer,
)
from rankpo_tpu.core.mesh import local_mesh
from rankpo_tpu.index import InferenceEncoder
from rankpo_tpu.models import load_pretrained
from rankpo_tpu.tools import generate_predictions
from rankpo_tpu.utils.logging import setup_logging
from rankpo_tpu.utils.seed import set_seed

logger = logging.getLogger(__name__)


def main(argv=None):
    args, dist_args = parse_dataclasses(
        [PredictionArguments, DistributedArguments], argv
    )
    dist_args.initialize()  # multi-host: local_mesh() then spans all hosts
    setup_logging(args.log_level)
    logger.info("prediction arguments:\n%s", args.to_json_string())
    set_seed(args.seed)

    mesh = local_mesh()
    config, params = load_pretrained(args.model_name_or_path)
    tokenizer = resolve_tokenizer(args.tokenizer_name, args.model_name_or_path)
    encoder = InferenceEncoder(
        config, params, tokenizer, mesh=mesh,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    return generate_predictions(
        encoder,
        args.query_data,
        args.corpus_data,
        args.output_file,
        max_query_length=args.max_query_length,
        max_passage_length=args.max_passage_length,
        search_range=args.search_range,
        method=args.method,
        num_predictions=args.num_predictions,
        batch_size=args.batch_size,
        seed=args.seed,
        mesh=mesh,
        index_type=args.index_type,
        index_recall_target=args.index_recall_target,
        index_kwargs=parse_index_kwargs(args.index_kwargs),
    )


if __name__ == "__main__":
    main()
