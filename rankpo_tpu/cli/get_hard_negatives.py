"""Hard-negative mining entry point (reference src/get_hard_negatives.py CLI)."""

from __future__ import annotations

import logging
import os

import jax.numpy as jnp

from rankpo_tpu.cli.arguments import (
    DistributedArguments,
    HardNegativeArguments,
    parse_dataclasses,
    parse_index_kwargs,
    resolve_tokenizer,
)
from rankpo_tpu.core.mesh import local_mesh
from rankpo_tpu.index import InferenceEncoder
from rankpo_tpu.models import load_pretrained
from rankpo_tpu.tools import find_hard_negatives
from rankpo_tpu.utils.logging import setup_logging
from rankpo_tpu.utils.seed import set_seed

logger = logging.getLogger(__name__)


def main(argv=None):
    args, dist_args = parse_dataclasses(
        [HardNegativeArguments, DistributedArguments], argv
    )
    dist_args.initialize()  # multi-host: local_mesh() then spans all hosts
    setup_logging(args.log_level)
    logger.info("hard-negative arguments:\n%s", args.to_json_string())
    set_seed(args.seed)

    os.makedirs(args.output_prefix, exist_ok=True)
    with open(os.path.join(args.output_prefix, "config.json"), "w") as f:
        f.write(args.to_json_string())

    mesh = local_mesh()
    config, params = load_pretrained(args.model_name_or_path)
    tokenizer = resolve_tokenizer(args.tokenizer_name, args.model_name_or_path)
    encoder = InferenceEncoder(
        config, params, tokenizer, mesh=mesh,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    return find_hard_negatives(
        encoder,
        args.input_file,
        args.output_prefix,
        max_query_length=args.max_query_length,
        max_passage_length=args.max_passage_length,
        num_negatives=args.num_negatives,
        search_range=args.search_range,
        method=args.method,
        batch_size=args.batch_size,
        num_clusters=args.num_clusters,
        lambda_=args.lambda_,
        seed=args.seed,
        mesh=mesh,
        index_type=args.index_type,
        index_recall_target=args.index_recall_target,
        index_kwargs=parse_index_kwargs(args.index_kwargs),
    )


if __name__ == "__main__":
    main()
