"""Index auto-tune entry point — the FAISS ParameterSpace/autotune analog
(tools/autotune.py). Given corpus embeddings (a .npy file, a jsonl corpus
to encode, or a synthetic benchmark corpus), benchmark the candidate
factory-spec ladder and print one JSON report with the recommended spec.

Examples:
  # real corpus through a trained encoder
  python -m rankpo_tpu.cli.autotune --model_name_or_path out/model \
      --corpus_data corpus.jsonl --recall_target 0.95 --k 100

  # pre-computed embeddings
  python -m rankpo_tpu.cli.autotune --embeddings corpus_emb.npy

  # synthetic sweep (power-law spectrum, the realistic regime)
  python -m rankpo_tpu.cli.autotune --synthetic_rows 100000 \
      --synthetic_dim 1024 --memory_budget_gb 2
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

import numpy as np

from rankpo_tpu.utils.logging import setup_logging

logger = logging.getLogger(__name__)


def _synthetic(n: int, dim: int, seed: int) -> np.ndarray:
    """Blobby power-law corpus (the spectrum real embedding matrices show —
    cf. benchmarks/ivf_probe.py): cluster centers + scaled noise, unit rows."""
    rng = np.random.default_rng(seed)
    n_clusters = max(8, int(4 * np.sqrt(n)))
    scale = (np.arange(1, dim + 1, dtype=np.float32)) ** -0.5
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * scale
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n)
    noise = rng.standard_normal((n, dim)).astype(np.float32) * scale
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    rows = centers[assign] + 0.5 * noise
    return rows / np.linalg.norm(rows, axis=1, keepdims=True)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    src = parser.add_argument_group("embedding source (pick one)")
    src.add_argument("--embeddings", default=None,
                     help=".npy [N, D] fp32 embedding matrix")
    src.add_argument("--corpus_data", default=None,
                     help="jsonl corpus to encode (needs --model_name_or_path)")
    src.add_argument("--synthetic_rows", type=int, default=0,
                     help="> 0: synthesize a power-law blob corpus")
    parser.add_argument("--synthetic_dim", type=int, default=1024)
    parser.add_argument("--model_name_or_path", default=None)
    parser.add_argument("--tokenizer_name", default=None)
    parser.add_argument("--max_passage_length", type=int, default=512)
    parser.add_argument("--encode_batch_size", type=int, default=256)
    parser.add_argument("--k", type=int, default=100)
    parser.add_argument("--recall_target", type=float, default=0.95)
    parser.add_argument("--memory_budget_gb", type=float, default=None)
    parser.add_argument("--specs", default=None,
                        help="comma-of-specs override, ';'-separated (factory "
                             "strings contain commas), e.g. "
                             "'Flat;IVF4096,SQ8;OPQ64,IVF4096,PQ64'")
    parser.add_argument("--n_queries", type=int, default=256)
    parser.add_argument("--search_batch_size", type=int, default=1024)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output_file", default=None,
                        help="also write the JSON report here")
    parser.add_argument("--log_level", default="info")
    args = parser.parse_args(argv)

    setup_logging(args.log_level)
    sources = [bool(args.embeddings), bool(args.corpus_data),
               args.synthetic_rows > 0]
    if sum(sources) != 1:
        parser.error("pick exactly one of --embeddings / --corpus_data / "
                     "--synthetic_rows")

    from rankpo_tpu.core.mesh import local_mesh

    mesh = local_mesh()
    if args.embeddings:
        emb = np.asarray(np.load(args.embeddings), np.float32)
    elif args.synthetic_rows:
        emb = _synthetic(args.synthetic_rows, args.synthetic_dim, args.seed)
    else:
        if not args.model_name_or_path:
            parser.error("--corpus_data needs --model_name_or_path")
        import jax.numpy as jnp

        from rankpo_tpu.cli.arguments import resolve_tokenizer
        from rankpo_tpu.data.datasets import load_eval_corpus
        from rankpo_tpu.index import InferenceEncoder
        from rankpo_tpu.models import load_pretrained

        config, params = load_pretrained(args.model_name_or_path)
        tokenizer = resolve_tokenizer(
            args.tokenizer_name, args.model_name_or_path
        )
        encoder = InferenceEncoder(
            config, params, tokenizer, mesh=mesh,
            compute_dtype=jnp.bfloat16,
        )
        corpus = load_eval_corpus(args.corpus_data)
        emb = encoder.encode(
            corpus, batch_size=args.encode_batch_size,
            max_length=args.max_passage_length,
            description="Embedding corpus",
        )

    from rankpo_tpu.tools.autotune import autotune_index

    specs = None
    if args.specs:
        specs = [s.strip() for s in args.specs.split(";") if s.strip()]
    report = autotune_index(
        emb,
        k=args.k,
        recall_target=args.recall_target,
        memory_budget_gb=args.memory_budget_gb,
        mesh=mesh,
        specs=specs,
        n_queries=args.n_queries,
        batch_size=args.search_batch_size,
        seed=args.seed,
    )
    for row in report["results"]:
        if "error" in row:
            logger.info("%-24s FAILED: %s", row["spec"], row["error"])
        else:
            logger.info(
                "%-24s recall %.4f  %10.1f qps  %9.2f MB  build %6.2fs%s",
                row["spec"], row["recall"], row["qps"], row["memory_mb"],
                row["build_s"], "  <- feasible" if row["feasible"] else "",
            )
    logger.info("recommended spec: %s", report["best"])
    line = json.dumps(report)
    print(line)
    if args.output_file:
        with open(args.output_file, "w", encoding="utf-8") as f:
            f.write(line + "\n")
    return report


if __name__ == "__main__":
    # nonzero when no spec met the target/budget so `autotune && deploy`
    # pipelines can't proceed with a null recommendation
    sys.exit(0 if main()["best"] is not None else 1)
