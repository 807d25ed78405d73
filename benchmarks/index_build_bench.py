"""Index build throughput: host-numpy path vs device-resident path.

The host path fetches every embed batch to numpy and re-uploads the full
matrix into the index (2 full-corpus transfers + O(N*D) host RAM); the
device-resident path (encode_sharded -> from_sharded) keeps the matrix in
HBM end to end. Through the dev harness's remote tunnel the transfer tax
is enormous (8-85 MB/s); on a production PCIe host it is still 2 full
copies of the matrix.

Uses the tiny hash-tokenizer encoder (the model cost is identical on both
paths — the delta IS the transfer/placement machinery). Run on the real
chip for the headline; CPU gives the machinery-overhead-only view.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--n_corpus", type=int, default=50_000)
parser.add_argument("--hidden", type=int, default=512)
parser.add_argument("--layers", type=int, default=4)
parser.add_argument("--batch_size", type=int, default=256)
parser.add_argument("--max_length", type=int, default=64)
parser.add_argument("--index_dtype", default="float32",
                    choices=["float32", "bfloat16", "int8"])
args = parser.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rankpo_tpu.core.mesh import local_mesh
    from rankpo_tpu.data import HashTokenizer
    from rankpo_tpu.index import FlatIPIndex, InferenceEncoder
    from rankpo_tpu.models import EncoderConfig, init_params

    print(f"backend={jax.default_backend()}", flush=True)
    cfg = EncoderConfig(
        model_type="llama", vocab_size=32000, hidden_size=args.hidden,
        intermediate_size=args.hidden * 3, num_hidden_layers=args.layers,
        num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=4096, rope_theta=10000.0, pad_token_id=0,
        architectures=("LlamaModel",), pooling="last_token",
    )
    params = init_params(jax.random.key(0), cfg)
    mesh = local_mesh()
    encoder = InferenceEncoder(
        cfg, params, HashTokenizer(vocab_size=32000), mesh=mesh,
        length_multiple=64,
    )
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
             "int8": jnp.int8}[args.index_dtype]
    corpus = [
        f"document {i} with some padding words here {i % 13}"
        for i in range(args.n_corpus)
    ]

    # warm both encode programs (compile once outside the timed region)
    encoder.encode(corpus[: args.batch_size * 2], batch_size=args.batch_size,
                   max_length=args.max_length)
    warm_dev, _ = encoder.encode_sharded(
        corpus[: args.batch_size * 2], batch_size=args.batch_size,
        max_length=args.max_length,
    )
    jax.block_until_ready(warm_dev)

    t0 = time.perf_counter()
    emb = encoder.encode(corpus, batch_size=args.batch_size,
                         max_length=args.max_length)
    host_index = FlatIPIndex(emb, mesh=mesh, dtype=dtype)
    jax.block_until_ready(host_index.corpus)
    t_host = time.perf_counter() - t0

    t0 = time.perf_counter()
    emb_dev, n_total = encoder.encode_sharded(
        corpus, batch_size=args.batch_size, max_length=args.max_length
    )
    dev_index = FlatIPIndex.from_sharded(emb_dev, n_total, mesh, dtype=dtype)
    jax.block_until_ready(dev_index.corpus)
    t_dev = time.perf_counter() - t0

    # identical results (probe a few queries)
    q = np.asarray(emb[:8], np.float32)
    hs, hi = host_index.search(q, k=10)
    ds, di = dev_index.search(q, k=10)
    assert np.array_equal(hi, di), "device build diverges from host build"

    print(
        f"  n={args.n_corpus} d={args.hidden} dtype={args.index_dtype}\n"
        f"  host-numpy build:      {t_host:7.2f} s "
        f"({args.n_corpus / t_host:8.0f} passages/s)\n"
        f"  device-resident build: {t_dev:7.2f} s "
        f"({args.n_corpus / t_dev:8.0f} passages/s)  "
        f"speedup {t_host / t_dev:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
