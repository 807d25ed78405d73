"""Serving latency under concurrent load: direct threaded dispatch vs the
dynamic micro-batcher (rankpo_tpu/serve/batching.py).

T client threads each issue N sequential single-query requests; we report
per-request latency percentiles and aggregate QPS. "direct" is what a naive
threaded HTTP server does (every request thread dispatches its own encode +
search); "microbatch" groups requests arriving within the wait window into
one device dispatch.

Run on the real TPU (default env) or CPU-forced for a smoke test.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pct(xs, p):
    return float(np.percentile(np.asarray(xs), p))


def make_query_text(tid: int, i: int, max_words: int = 0) -> str:
    base = f"document {(tid * 131 + i * 17) % 10000} on some topic"
    if max_words <= 0:
        return base
    # mixed-length load: lengths spread over [1, max_words] words, so most
    # micro-batch groups contain at least one near-max query and the
    # unpacked path pays the long length bucket for the whole group
    n = 1 + (tid * 37 + i * 101) % max_words
    return base + " filler" * n


def run_load(fn, n_threads: int, n_per_thread: int, max_words: int = 0):
    lat = []
    lock = threading.Lock()

    def client(tid):
        mine = []
        for i in range(n_per_thread):
            text = make_query_text(tid, i, max_words)
            t0 = time.perf_counter()
            fn(text, 10)
            mine.append(time.perf_counter() - t0)
        with lock:
            lat.extend(mine)

    threads = [threading.Thread(target=client, args=(t,)) for t in range(n_threads)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return {
        "p50_ms": round(pct(lat, 50) * 1e3, 1),
        "p95_ms": round(pct(lat, 95) * 1e3, 1),
        "p99_ms": round(pct(lat, 99) * 1e3, 1),
        "qps": round(len(lat) / wall, 1),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_corpus", type=int, default=10000)
    parser.add_argument("--threads", type=int, default=16)
    parser.add_argument("--per_thread", type=int, default=20)
    parser.add_argument("--wait_ms", type=float, default=3.0)
    parser.add_argument("--hidden", type=int, default=512)
    parser.add_argument("--layers", type=int, default=4)
    parser.add_argument("--index_type", default="flat",
                        choices=["flat", "refine", "ivf"])
    parser.add_argument("--refine_dim", type=int, default=128)
    parser.add_argument("--refine_candidates", type=int, default=None,
                        help="None = build-time auto-tune at 0.95")
    parser.add_argument("--ivf_clusters", type=int, default=None,
                        help="None = auto (~4*sqrt(N))")
    parser.add_argument("--ivf_nprobe", type=int, default=None,
                        help="None = build-time auto-tune at 0.95")
    parser.add_argument("--ivf_pq_m", type=int, default=0,
                        help="> 0 serves the IVF+PQ codec (m uint8 "
                             "codes/row)")
    parser.add_argument("--ivf_pq_rotate", default="none",
                        choices=["none", "random", "opq"],
                        help="orthogonal pre-rotation for the PQ codec")
    parser.add_argument("--ivf_reduced_dim", type=int, default=0,
                        help="> 0 = IVF+PCA hybrid stage-1 dimension")
    parser.add_argument("--max_query_length", type=int, default=64)
    parser.add_argument("--mixed_len_words", type=int, default=0,
                        help="> 0: query lengths spread over [1, N] words "
                             "(the regime sequence packing targets)")
    parser.add_argument("--pack_queries", action="store_true",
                        help="sequence-pack micro-batch groups")
    parser.add_argument("--mutation_load", action="store_true",
                        help="repeat the microbatch load while a background "
                             "client streams /add + /remove batches; reports "
                             "search percentiles under mutation and the "
                             "sustained mutation throughput")
    parser.add_argument("--mutation_batch", type=int, default=32,
                        help="rows per add/remove call under --mutation_load")
    parser.add_argument("--autosave_file", default="",
                        help="with --mutation_load: save_index() here after "
                             "every mutation (the cli/serve.py --autosave "
                             "behavior), so the measured p99 includes "
                             "serving-while-persisting")
    parser.add_argument("--synthetic_index_n", type=int, default=0,
                        help="> 0: skip the corpus encode and serve a "
                             "chunk-streamed synthetic index of this many "
                             "rows (the 10M one-chip tier — no host fp32 "
                             "matrix ever exists). Uses --index_type ivf "
                             "knobs; queries still go through the real "
                             "encoder, so latency/QPS timing is faithful "
                             "(recall is meaningless on this corpus and "
                             "not measured here — docs/BENCHMARKS.md 10M "
                             "rows carry the oracle-gated recall)")
    parser.add_argument("--synthetic_store", default="int8",
                        choices=("int8", "bfloat16", "float32"))
    parser.add_argument("--capacity_slack", type=float, default=1.22)
    parser.add_argument("--balance_eta", type=float, default=0.0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from rankpo_tpu.core.mesh import local_mesh
    from rankpo_tpu.data import HashTokenizer
    from rankpo_tpu.index import InferenceEncoder
    from rankpo_tpu.models import EncoderConfig, init_params
    from rankpo_tpu.serve import MicroBatcher, RetrievalService

    cfg = EncoderConfig(
        model_type="llama", vocab_size=32000, hidden_size=args.hidden,
        intermediate_size=args.hidden * 3, num_hidden_layers=args.layers,
        num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=4096, rope_theta=10000.0, pad_token_id=0,
        architectures=("LlamaModel",), pooling="last_token",
    )
    params = init_params(jax.random.key(0), cfg)
    mesh = local_mesh()
    tok = HashTokenizer(vocab_size=32000)
    encoder = InferenceEncoder(cfg, params, tok, mesh=mesh, length_multiple=64)
    index_kwargs = {}
    if args.index_type == "refine":
        index_kwargs["reduced_dim"] = min(args.refine_dim, args.hidden)
        if args.refine_candidates is not None:
            index_kwargs["candidates"] = args.refine_candidates
    elif args.index_type == "ivf":
        if args.ivf_clusters is not None:
            index_kwargs["n_clusters"] = args.ivf_clusters
        if args.ivf_nprobe is not None:
            index_kwargs["nprobe"] = args.ivf_nprobe
        if args.ivf_reduced_dim > 0:
            index_kwargs["reduced_dim"] = min(args.ivf_reduced_dim, args.hidden)
        if args.ivf_pq_m > 0:
            index_kwargs["pq_m"] = args.ivf_pq_m
            if args.ivf_pq_rotate != "none":
                index_kwargs["pq_rotate"] = args.ivf_pq_rotate
        elif args.ivf_pq_rotate != "none":
            parser.error("--ivf_pq_rotate requires --ivf_pq_m")
    service = RetrievalService(encoder, mesh=mesh,
                               max_query_length=args.max_query_length,
                               query_batch_size=64,
                               index_type=args.index_type,
                               index_kwargs=index_kwargs,
                               pack_queries=args.pack_queries)
    if args.synthetic_index_n > 0:
        import functools

        from rankpo_tpu.index import IVFIPIndex

        n = args.synthetic_index_n
        d = args.hidden
        chunk_rows = 262144
        base_key = jax.random.key(7)

        @functools.partial(jax.jit, static_argnums=(1,))
        def gen_rows(key, m):
            rows = jax.random.normal(key, (m, d), jnp.float32)
            return rows / jnp.linalg.norm(rows, axis=-1, keepdims=True)

        def get_chunk(lo, hi):
            return gen_rows(jax.random.fold_in(base_key, lo), hi - lo)

        t0 = time.perf_counter()
        index = IVFIPIndex.from_chunk_fn(
            get_chunk, n, d, chunk_rows=chunk_rows,
            n_clusters=args.ivf_clusters or 8192,
            nprobe=args.ivf_nprobe or 8,
            store_dtype={"int8": jnp.int8, "bfloat16": jnp.bfloat16,
                         "float32": jnp.float32}[args.synthetic_store],
            capacity_slack=args.capacity_slack,
            balance_eta=args.balance_eta,
        )
        print(f"synthetic {n}-row {args.synthetic_store} index built in "
              f"{time.perf_counter() - t0:.1f}s "
              f"(capacity={index.capacity})", flush=True)
        corpus = [f"synthetic passage {i}" for i in range(n)]
        service.adopt_index(index, corpus)
    else:
        corpus = [
            f"document {i} on some topic number {i}"
            for i in range(args.n_corpus)
        ]
        service.build_index(corpus, max_passage_length=64, batch_size=256)

    # warm every batch bucket (each distinct batch shape is an XLA compile);
    # k_max matches the direct path's k so the two share the search program.
    # Uniform short queries land in the shortest length bucket -> (64,);
    # mixed-length load needs the full grid (packed mode ignores lengths and
    # warms its row buckets instead)
    if args.mixed_len_words > 0 or args.pack_queries:
        service.warmup(k=10)
    else:
        service.warmup(k=10, lengths=(64,))
    mb = MicroBatcher(service, max_batch=64, max_wait_ms=args.wait_ms, k_max=10)
    mb.query("warmup", k=10)
    mb.n_dispatches = mb.n_queries = 0  # don't count warmup in grouping stats

    direct = run_load(
        lambda q, k: service.query(q, k=k), args.threads, args.per_thread,
        args.mixed_len_words,
    )
    batched = run_load(lambda q, k: mb.query(q, k=k), args.threads,
                       args.per_thread, args.mixed_len_words)
    out = {
        "metric": "serve_latency_concurrent",
        "threads": args.threads,
        "n_corpus": args.synthetic_index_n or args.n_corpus,
        "index_type": args.index_type,
        "pack_queries": args.pack_queries,
        "mixed_len_words": args.mixed_len_words,
        "direct": direct,
        "microbatch": batched,
        "dispatches_microbatch": mb.n_dispatches,
        "queries_microbatch": mb.n_queries,
        "backend": jax.default_backend(),
    }

    if args.mutation_load:
        # search load again, now with a background mutator streaming
        # add/remove batches (and optionally autosaving after each commit —
        # the cli/serve.py --autosave semantics). The mutator adds a batch,
        # then removes exactly the rows it just appended, so corpus size
        # stays bounded and every cycle exercises both paths + rewarm.
        stop = threading.Event()
        mut_stats = {"adds": 0, "removes": 0, "saves": 0, "errors": 0,
                     "op_lat": []}

        def mutator():
            i = 0
            while not stop.is_set():
                texts = [f"new passage {i} batch row {j} streaming update"
                         for j in range(args.mutation_batch)]
                try:
                    t0 = time.perf_counter()
                    service.add_passages(texts, max_passage_length=64)
                    mut_stats["adds"] += 1
                    n = service.ntotal
                    service.remove_passages(
                        list(range(n - args.mutation_batch, n)))
                    mut_stats["removes"] += 1
                    if args.autosave_file:
                        service.save_index(args.autosave_file)
                        mut_stats["saves"] += 1
                    mut_stats["op_lat"].append(time.perf_counter() - t0)
                except Exception as e:  # count, keep streaming
                    mut_stats["errors"] += 1
                    print(f"mutator error: {e}", file=sys.stderr)
                i += 1

        mt = threading.Thread(target=mutator, daemon=True)
        t0 = time.perf_counter()
        mt.start()
        under_mutation = run_load(lambda q, k: mb.query(q, k=k), args.threads,
                                  args.per_thread, args.mixed_len_words)
        stop.set()
        mt.join(timeout=60)
        wall = time.perf_counter() - t0
        lat = mut_stats.pop("op_lat")
        out["microbatch_under_mutation"] = under_mutation
        out["mutation"] = {
            **mut_stats,
            "cycles_per_sec": round(mut_stats["adds"] / wall, 2),
            "rows_per_sec": round(
                2 * args.mutation_batch * mut_stats["adds"] / wall, 1),
            "cycle_p50_ms": round(1e3 * pct(lat, 50), 1) if lat else None,
            "cycle_p99_ms": round(1e3 * pct(lat, 99), 1) if lat else None,
            "autosave": bool(args.autosave_file),
        }

    mb.close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
