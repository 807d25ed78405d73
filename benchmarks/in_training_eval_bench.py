"""In-training retrieval eval: what an eval point costs the training run.

The hook (eval/in_training.py) pauses training to encode eval queries + the
eval corpus with the live params, search, and compute metrics — the price of
having the paper's nDCG-retention curve live instead of offline. This probe
measures that pause at a realistic setting: the 133M train-bench model, a
mixed-length 10k-passage eval corpus (encode_bench's corpus model), 256
queries. Reported:

  - cold: first call — includes the embed-bucket compiles (per-process,
    shared with nothing at a fresh training start; through the remote compile
    server this dominates the first eval point)
  - warm x2: every later eval point (compiled programs reused — the reason
    the hook keeps ONE encoder for the run)

Run on the real chip:  python benchmarks/in_training_eval_bench.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.encode_bench import make_corpus  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_corpus", type=int, default=10000)
    ap.add_argument("--n_queries", type=int, default=256)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--max_query_length", type=int, default=128)
    ap.add_argument("--max_passage_length", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--k", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()}", flush=True)

    from rankpo_tpu.core.mesh import MeshConfig, make_mesh
    from rankpo_tpu.data import HashTokenizer
    from rankpo_tpu.eval.in_training import RetrievalEvalHook
    from rankpo_tpu.models import EncoderConfig, init_params

    cfg = EncoderConfig(
        model_type="llama",
        vocab_size=32000,
        hidden_size=args.hidden,
        intermediate_size=args.hidden * 3,
        num_hidden_layers=args.layers,
        num_attention_heads=16,
        num_key_value_heads=8,
        max_position_embeddings=8192,
        rope_theta=500000.0,
        pad_token_id=0,
        architectures=("LlamaModel",),
        pooling="last_token",
    )
    mesh = make_mesh(MeshConfig(data_parallel=jax.device_count()))
    params = init_params(jax.random.key(0), cfg)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    print(f"model: {n_params/1e6:.0f}M params, corpus {args.n_corpus}, "
          f"queries {args.n_queries}", flush=True)

    corpus = make_corpus(args.n_corpus, seed=0)
    pos = np.random.default_rng(1).choice(
        args.n_corpus, size=args.n_queries, replace=False
    )
    tmp = "/tmp/in_training_eval_bench"
    os.makedirs(tmp, exist_ok=True)
    with open(f"{tmp}/q.jsonl", "w") as f:
        f.write("\n".join(
            json.dumps({"query": {"text": corpus[i]},
                        "positives": {"index": [int(i)]}})
            for i in pos
        ))
    with open(f"{tmp}/c.jsonl", "w") as f:
        f.write("\n".join(json.dumps({"text": t}) for t in corpus))

    hook = RetrievalEvalHook(
        cfg, HashTokenizer(vocab_size=32000), f"{tmp}/q.jsonl", f"{tmp}/c.jsonl",
        mesh=mesh, max_query_length=args.max_query_length,
        max_passage_length=args.max_passage_length, k=args.k,
        batch_size=args.batch, compute_dtype=jnp.bfloat16,
    )

    t0 = time.perf_counter()
    metrics = hook(params)
    cold = time.perf_counter() - t0
    print(f"cold (incl. compiles): {cold:.1f}s  "
          f"MRR@1={metrics['retrieval_MRR@1']:.3f}", flush=True)
    for i in range(2):
        t0 = time.perf_counter()
        hook(params)
        print(f"warm run {i + 1}: {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
