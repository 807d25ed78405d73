"""Corpus-encode throughput: input-order vs length-sorted vs packed batching.

The offline corpus encode dominates evaluation/mining/index-build cost
(reference: ModelForInference.encode, src/modeling.py:473-554, pads each
batch to ITS longest text). Our encoder pads each chunk to a compiled
length bucket, so in input order one long text drags its whole chunk to
the long bucket; ``sort_by_length=True`` reorders texts into
length-homogeneous chunks (order restored on output) so most chunks ride
short buckets.

Corpus model: a mixed length distribution typical of passage corpora —
70% short (10-40 words), 20% medium (60-150), 10% long (250-480) — with
word-level HashTokenizer so token length is exactly controlled. Model is
the 133M train-bench config. Each mode is run twice; the second run is
reported (compiles cached per process; the sorted path compiles up to
max_length/64 buckets instead of 1 — a one-time cost for a long-lived
encode job).

Run on the real chip:  python benchmarks/encode_bench.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    kinds = rng.choice(3, size=n, p=[0.7, 0.2, 0.1])
    lo = np.array([10, 60, 250])[kinds]
    hi = np.array([40, 150, 480])[kinds]
    counts = rng.integers(lo, hi + 1)
    return [
        " ".join(f"w{rng.integers(0, 50000)}" for _ in range(c))
        for c in counts
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--max_length", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--tokens_per_batch", type=int, default=131072,
                    help="packed mode: tokens per dispatch (rows x capacity)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rankpo_tpu.core.mesh import local_mesh
    from rankpo_tpu.data.tokenization import HashTokenizer
    from rankpo_tpu.index import InferenceEncoder
    from rankpo_tpu.models import EncoderConfig, init_params

    print(f"backend={jax.default_backend()}", flush=True)
    config = EncoderConfig(
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
    params = init_params(jax.random.key(0), config)
    tok = HashTokenizer(vocab_size=32000)
    encoder = InferenceEncoder(config, params, tok, mesh=local_mesh())

    texts = make_corpus(args.n)
    mean_words = np.mean([len(t.split()) for t in texts])
    print(f"n={args.n} mean_words={mean_words:.0f} "
          f"batch={args.batch} max_length={args.max_length}", flush=True)

    results = {}
    out = {}
    modes = {
        "input-order": lambda: encoder.encode(
            texts, batch_size=args.batch, max_length=args.max_length,
            sort_by_length=False,
        ),
        "sorted": lambda: encoder.encode(
            texts, batch_size=args.batch, max_length=args.max_length,
            sort_by_length=True,
        ),
        # sequence packing: several texts per row, block-diagonal flash
        # attention — pad waste ~0 in EVERY op (MLP/norms too), vs sorted
        # batching which still pads each chunk to its bucket
        "packed": lambda: encoder.encode_packed(
            texts, max_length=args.max_length,
            tokens_per_batch=args.tokens_per_batch,
        ),
    }
    for name, run in modes.items():
        for attempt in range(2):  # second run: compiles cached
            t0 = time.perf_counter()
            emb = run()
            dt = time.perf_counter() - t0
            print(f"  {name} run{attempt}: {dt:.1f}s "
                  f"({args.n / dt:,.0f} texts/s)", flush=True)
        results[name] = args.n / dt
        out[name] = emb
    np.testing.assert_allclose(
        out["sorted"], out["input-order"], atol=2e-2
    )  # same rows, independent of batching order (bf16 bucket jitter)
    np.testing.assert_allclose(out["packed"], out["sorted"], atol=2e-2)
    print(f"sorted speedup: {results['sorted'] / results['input-order']:.2f}x",
          flush=True)
    print(f"packed speedup: {results['packed'] / results['input-order']:.2f}x "
          f"(vs sorted: {results['packed'] / results['sorted']:.2f}x)",
          flush=True)


if __name__ == "__main__":
    main()
