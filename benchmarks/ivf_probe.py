"""IVF (inverted-file) index probe: QPS/recall vs the single-stage approx
path and the fp32 oracle, on synthetic clusterable corpora.

IVF's cost model is sublinear in N: per query it scores K_c centroids
(tiny), gathers nprobe*capacity rows (HBM-bound) and reranks them exactly
(negligible FLOPs). The full-scan paths — flat approx (N*D MACs/query) and
the PCA two-stage (N*d' MACs/query, benchmarks/lowd_rerank_probe.py) —
scale linearly, so IVF's crossover is expected in the multi-million-row
regime. Recall is DATA-DEPENDENT: blobby corpora (the real-embedding
regime k-means exploits) vs --isotropic (worst case, clusters are
arbitrary Voronoi cells) — sweep both before trusting a config.

Build cost is reported too (k-means is ~2*iters*N*K_c*D MACs on the MXU +
one [N, 2] assignment fetch for the host greedy fill).

Run on the real chip: `python benchmarks/ivf_probe.py --n 1000000`.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=1_000_000)
parser.add_argument("--d", type=int, default=1024)
parser.add_argument("--q", type=int, default=256,
                    help="query batch per dispatch (the probed-row gather "
                    "is the memory peak: Q*nprobe*capacity*D*2B)")
parser.add_argument("--k", type=int, default=100)
parser.add_argument("--clusters", type=int, nargs="+", default=[4096])
parser.add_argument("--nprobes", type=int, nargs="+", default=[8, 16, 32, 64])
parser.add_argument("--reduced_dims", type=int, nargs="+", default=[],
                    help="also bench the IVF+PCA hybrid at these projected "
                    "dims (gathers d'/D of the bytes + a top-C full-row "
                    "rerank)")
parser.add_argument("--candidates", type=int, default=512,
                    help="hybrid rerank pool size")
parser.add_argument("--pq_m", type=int, default=0,
                    help="bench residual product quantization at this "
                    "subvector count (m uint8 codes/row: 32x below bf16 "
                    "rows at m=64/D=1024 — the 100M-rows-on-one-chip tier; "
                    "ADC-approximate scores, recall reported vs the fp32 "
                    "oracle). In the default mode this is an ADDITIONAL "
                    "index next to the flat-storage ones; with "
                    "--chunked_build it REPLACES the storage codec "
                    "(--store / --reduced_dims are ignored)")
parser.add_argument("--pq_rotate", default="none",
                    choices=("none", "random", "opq"),
                    help="orthogonal pre-rotation for the PQ codec "
                    "('random' seeded QR / 'opq' trained, FAISS OPQMatrix "
                    "analog); requires --pq_m")
parser.add_argument("--pq_only", action="store_true",
                    help="skip the flat-scan baseline and plain-IVF/hybrid "
                    "sections (codec A/B runs: oracle + pq index only)")
parser.add_argument("--fp32_oracle_queries", type=int, default=0,
                    help="chunked mode only: ALSO compute a true fp32 "
                    "oracle for this many queries by re-streaming the "
                    "deterministic chunks (running top-k merge — the fp32 "
                    "matrix still never exists whole) and report recall "
                    "against it. The default chunked oracle is "
                    "exact_search over the STORED rows, which for pq_m "
                    "measures probing loss only (it decodes the same "
                    "codes) — this knob is how codec quality itself is "
                    "measured at no-fp32-matrix scales")
parser.add_argument("--capacity_slack", type=float, default=1.3,
                    help="per-cluster slot headroom; 1.3 inflates storage "
                    "30%% — at 10M int8 that is 13.4 GB vs 10.3, the "
                    "difference between fitting a 16 GB chip or not")
parser.add_argument("--store", default="bfloat16",
                    choices=["float32", "bfloat16", "int8"],
                    help="row storage (int8 = 4x memory vs fp32, dequant "
                    "fused into the rerank)")
parser.add_argument("--kmeans_iters", type=int, default=10)
parser.add_argument("--chunked_build", action="store_true",
                    help="build via from_chunk_fn: the fp32 corpus never "
                    "exists whole (the 10M-x-1024-int8-on-one-chip path); "
                    "recall is measured against index.exact_search (the "
                    "streamed storage-precision scan) since no fp32 "
                    "oracle can be materialized")
parser.add_argument("--chunk_rows", type=int, default=262144)
parser.add_argument("--train_rows", type=int, default=0,
                    help="chunked mode: cap the k-means training sample "
                    "(0 = the from_chunk_fn default, ~64 rows/cluster — "
                    "8.6 GB of device fp32 at 100M/K_c=32k; 16/cluster "
                    "keeps the 100M build on one 16 GB chip)")
parser.add_argument("--blobs", type=int, default=2048,
                    help="synthetic blob count (clusterable structure)")
parser.add_argument("--spread", type=float, default=1.0,
                    help="noise-NORM to center-norm ratio (per-dim std is "
                    "spread/sqrt(D)). Decision record: an earlier version "
                    "used spread as the per-dim std, so at D=1024 the "
                    "default 0.3 made noise norm ~9.6x the unit centers — "
                    "cos(row, center) ~ 0.10, effectively isotropic data — "
                    "and IVF recall degenerated to ~nprobe/K_c on BOTH "
                    "backends. spread=1.0 gives cos ~ 0.71 within a blob "
                    "(realistic embedding-neighborhood structure)")
parser.add_argument("--gather_budget_gb", type=float, default=3.0,
                    help="cap on the probed-row gather per dispatch; the "
                    "query batch shrinks per config to fit (a 256-query x "
                    "nprobe=64 x cap=320 x 1024D bf16 gather is 10.7 GB — "
                    "OOM on a 16 GB chip)")
parser.add_argument("--kmeans_split", type=int, default=0,
                    help="centroid redistribution per Lloyd iteration: up "
                    "to this many emptiest clusters split the fullest "
                    "(index/ivf.py _lloyd_body split_r)")
parser.add_argument("--balance_eta", type=float, default=0.0,
                    help="balanced k-means assignment-bias step (0 = off); "
                    "evens Zipf cluster fills against the fixed capacity "
                    "(index/ivf.py _lloyd_body)")
parser.add_argument("--pq_layout", default="auto",
                    choices=("auto", "rows", "cols"),
                    help="PQ code layout; cols = transposed [m, slots] "
                    "(no lane-padding relayout — the 100M tier)")
parser.add_argument("--isotropic", action="store_true",
                    help="pure gaussian corpus — IVF's worst case")
parser.add_argument("--anisotropic_decay", type=float, default=0.0,
                    help="> 0 scales dimension i by (1+i)^-decay before "
                    "normalization (power-law spectrum — real text-"
                    "embedding matrices decay like this; isotropic "
                    "residuals are PQ's worst case, cf. the refine "
                    "index's --anisotropic rationale)")
_args = parser.parse_args()
if _args.pq_rotate != "none" and not _args.pq_m:
    parser.error("--pq_rotate requires --pq_m")
N, D, Q, K = _args.n, _args.d, _args.q, _args.k


def _spectrum():
    if _args.anisotropic_decay <= 0.0:
        return None
    return (1.0 + jnp.arange(D, dtype=jnp.float32)) ** -_args.anisotropic_decay


def make_data(key):
    kc, ka, kn, kq, kqa, kqn = jax.random.split(key, 6)
    noise = _args.spread / math.sqrt(D)  # spread = noise NORM ratio
    if _args.isotropic:
        c = jax.random.normal(kn, (N, D), jnp.float32)
        q = jax.random.normal(kqn, (Q, D), jnp.float32)
    else:
        centers = jax.random.normal(kc, (_args.blobs, D), jnp.float32)
        centers = centers / jnp.linalg.norm(centers, axis=-1, keepdims=True)
        c = (
            jnp.take(centers, jax.random.randint(ka, (N,), 0, _args.blobs), 0)
            + noise * jax.random.normal(kn, (N, D), jnp.float32)
        )
        q = (
            jnp.take(centers, jax.random.randint(kqa, (Q,), 0, _args.blobs), 0)
            + noise * jax.random.normal(kqn, (Q, D), jnp.float32)
        )
    w = _spectrum()
    if w is not None:
        c, q = c * w, q * w
    c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return c, q


def main():
    global STORE
    STORE = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
             "int8": jnp.int8}[_args.store]
    print(
        f"backend={jax.default_backend()} N={N} D={D} Q={Q} K={K} "
        f"store={_args.store} "
        f"{'isotropic' if _args.isotropic else f'blobs={_args.blobs}'}",
        flush=True,
    )
    from rankpo_tpu.index.ivf import IVFIPIndex
    from rankpo_tpu.ops.topk import exact_topk_blockmax

    if _args.chunked_build:
        return chunked_main(IVFIPIndex)

    corpus, queries = jax.jit(make_data)(jax.random.key(0))
    jax.block_until_ready(corpus)

    def oracle_topk(q, c):
        s = jnp.einsum(
            "qd,nd->qn", q, c,
            preferred_element_type=jnp.float32, precision="float32",
        )
        return exact_topk_blockmax(s, K)[1]

    oracle = np.asarray(jax.jit(oracle_topk)(queries, corpus))
    print("  oracle ready", flush=True)

    def recall_of(idx):
        return float(np.mean([
            len(set(idx[r].tolist()) & set(oracle[r].tolist())) / K
            for r in range(Q)
        ]))

    # small query batches need more in-jit repetitions or the ~25-30ms
    # tunnel dispatch floor (CLAUDE.md) leaks into the per-rep time
    REPS = 4 if Q >= 64 else 32
    budget = int(_args.gather_budget_gb * (1 << 30))

    def q_fit(per_query_bytes):
        """Largest query batch whose probed-row gather fits the budget."""
        q = Q
        while q > 8 and q * per_query_bytes > budget:
            q //= 2
        return q

    def bench(fn, args, label, recall, n_queries):
        def loop(q, *rest):
            def body(i, carry):
                # data-dependent carry: the query input must depend on the
                # loop state or XLA hoists the whole search out of the loop
                # (LICM) and the timing is REPS x optimistic (CLAUDE.md)
                s, _ = fn(q + carry * 0.0, *rest)
                return carry + s[0, 0].astype(jnp.float32) * 1e-20
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        loop_fn = jax.jit(loop)
        float(loop_fn(*args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(loop_fn(*args))
            best = min(best, (time.perf_counter() - t0) / REPS)
        qnote = f" (q={n_queries})" if n_queries != Q else ""
        print(
            f"  {label:32} {best*1e3:7.1f} ms -> {n_queries/best:7.0f} QPS  "
            f"recall={recall:.4f}{qnote}",
            flush=True,
        )

    # single-stage approx baseline (current bf16 serving mode)
    corpus_bf16 = None if _args.pq_only else jax.jit(
        lambda c: c.astype(jnp.bfloat16)
    )(corpus)

    def approx_base(q, c):
        s = jnp.einsum(
            "qd,nd->qn", q.astype(jnp.bfloat16), c,
            preferred_element_type=jnp.bfloat16,
        )
        ts, i = jax.lax.approx_max_k(
            s, K, recall_target=0.95, aggregate_to_topk=True
        )
        return ts.astype(jnp.float32), i

    if corpus_bf16 is not None:
        base_idx = np.asarray(jax.jit(approx_base)(queries, corpus_bf16)[1])
        bench(
            approx_base, (queries, corpus_bf16), "approx bf16 full scan",
            recall_of(base_idx), Q,
        )
    del corpus_bf16  # free 2 GB at 1M before the index builds

    queries_np = np.asarray(queries, np.float32)
    row_bytes = np.dtype(STORE).itemsize

    for k_c in _args.clusters:
        if not _args.pq_only:
            t0 = time.perf_counter()
            index = IVFIPIndex.from_sharded(
                corpus, N, mesh=None, n_clusters=k_c,
                nprobe=max(_args.nprobes),
                kmeans_iters=_args.kmeans_iters, store_dtype=STORE,
                capacity_slack=_args.capacity_slack,
                balance_eta=_args.balance_eta,
                kmeans_split=_args.kmeans_split,
            )
            build_s = time.perf_counter() - t0
            print(
                f"  build K={k_c}: {build_s:.1f}s "
                f"(capacity={index.capacity}, iters={_args.kmeans_iters})",
                flush=True,
            )
            for p in _args.nprobes:
                q_eff = q_fit(p * index.capacity * D * row_bytes)
                _, idx = index.search(
                    queries_np, k=K, nprobe=p, batch_size=q_eff
                )
                fn = index.search_callable(K, nprobe=p)
                bench(
                    # bench perturbs its FIRST arg (the queries) per
                    # iteration
                    lambda q, *arrs, fn=fn: fn(*arrs, q),
                    (queries[:q_eff],) + index.search_arrays,
                    f"ivf K={k_c} nprobe={p}",
                    recall_of(idx), q_eff,
                )
            # free plain-index HBM before the hybrid build (1M: ~3GB)
            del index
        for rd in ([] if _args.pq_only else _args.reduced_dims):
            t0 = time.perf_counter()
            hyb = IVFIPIndex.from_sharded(
                corpus, N, mesh=None, n_clusters=k_c,
                nprobe=max(_args.nprobes), kmeans_iters=_args.kmeans_iters,
                store_dtype=STORE, reduced_dim=rd,
                candidates=_args.candidates,
                capacity_slack=_args.capacity_slack,
            )
            print(
                f"  hybrid build K={k_c} d'={rd}: "
                f"{time.perf_counter() - t0:.1f}s",
                flush=True,
            )
            for p in _args.nprobes:
                q_eff = q_fit(
                    p * hyb.capacity * rd * 2
                    + _args.candidates * D * row_bytes
                )
                _, idx = hyb.search(
                    queries_np, k=K, nprobe=p, batch_size=q_eff
                )
                fn = hyb.search_callable(K, nprobe=p)
                bench(
                    lambda q, *arrs, fn=fn: fn(*arrs, q),
                    (queries[:q_eff],) + hyb.search_arrays,
                    f"ivf+pca K={k_c} d'={rd} p={p} C={_args.candidates}",
                    recall_of(idx), q_eff,
                )
            del hyb
        if _args.pq_m:
            t0 = time.perf_counter()
            pqi = IVFIPIndex.from_sharded(
                corpus, N, mesh=None, n_clusters=k_c,
                nprobe=max(_args.nprobes), kmeans_iters=_args.kmeans_iters,
                pq_m=_args.pq_m, pq_rotate=_args.pq_rotate,
                capacity_slack=_args.capacity_slack,
            )
            rot_tag = (
                "" if _args.pq_rotate == "none" else f" rot={_args.pq_rotate}"
            )
            print(
                f"  pq build K={k_c} m={_args.pq_m}{rot_tag}: "
                f"{time.perf_counter() - t0:.1f}s "
                f"(storage {k_c * pqi.capacity * _args.pq_m / 1e6:.0f} MB "
                f"vs bf16 {k_c * pqi.capacity * D * 2 / 1e9:.1f} GB)",
                flush=True,
            )
            for p in _args.nprobes:
                # the reconstruction transient is bf16-row-sized: budget as
                # if gathering full bf16 rows
                q_eff = q_fit(p * pqi.capacity * D * 2)
                _, idx = pqi.search(
                    queries_np, k=K, nprobe=p, batch_size=q_eff
                )
                fn = pqi.search_callable(K, nprobe=p)
                bench(
                    lambda q, *arrs, fn=fn: fn(*arrs, q),
                    (queries[:q_eff],) + pqi.search_arrays,
                    f"ivf+pq K={k_c} m={_args.pq_m}{rot_tag} p={p}",
                    recall_of(idx), q_eff,
                )


def chunked_main(IVFIPIndex):
    """Streamed-build path for corpora whose fp32 matrix cannot exist on
    the chip. Recall oracle = index.exact_search (storage-precision
    streamed scan), which is also timed — it is the honest 'flat exact at
    this storage width' baseline at this scale."""
    import functools

    base_key = jax.random.key(0)
    centers = None
    if not _args.isotropic:
        centers = jax.jit(
            lambda k: (
                lambda c: c / jnp.linalg.norm(c, axis=-1, keepdims=True)
            )(jax.random.normal(k, (_args.blobs, D), jnp.float32))
        )(base_key)
        jax.block_until_ready(centers)

    noise = _args.spread / math.sqrt(D)  # spread = noise NORM ratio

    @functools.partial(jax.jit, static_argnums=(1,))
    def gen_rows(key, m):
        ka, kn = jax.random.split(key)
        if _args.isotropic:
            rows = jax.random.normal(kn, (m, D), jnp.float32)
        else:
            rows = (
                jnp.take(
                    centers, jax.random.randint(ka, (m,), 0, _args.blobs), 0
                )
                + noise * jax.random.normal(kn, (m, D), jnp.float32)
            )
        w = _spectrum()
        if w is not None:  # same power-law shaping as main()'s make_data
            rows = rows * w
        return rows / jnp.linalg.norm(rows, axis=-1, keepdims=True)

    def get_chunk(lo, hi):
        return gen_rows(jax.random.fold_in(base_key, lo), hi - lo)

    queries = np.asarray(
        gen_rows(jax.random.fold_in(base_key, N + 1), Q), np.float32
    )

    REPS = 4

    def bench(fn, args, label, recall):
        def loop(q, *rest):
            def body(i, carry):
                s, _ = fn(q + carry * 0.0, *rest)
                return carry + s[0, 0].astype(jnp.float32) * 1e-20
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        loop_fn = jax.jit(loop)
        float(loop_fn(*args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(loop_fn(*args))
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(
            f"  {label:32} {best*1e3:7.1f} ms -> {Q/best:7.0f} QPS  "
            f"recall={recall:.4f}",
            flush=True,
        )

    # true fp32 oracle by re-streaming the deterministic chunks: a running
    # top-k merge — scores one [n_fq, chunk] fp32 block at a time, the full
    # matrix never exists. Depends only on the data and queries, so it is
    # computed ONCE outside the cluster-config loop (at 10M a pass is
    # seconds of matmul but minutes of chunk regeneration)
    fp32_sets = None
    n_fq = min(_args.fp32_oracle_queries, Q)
    if n_fq > 0:
        @jax.jit
        def merge(rows, lo, q, bs, bi):
            s = jnp.einsum(
                "qd,nd->qn", q, rows,
                preferred_element_type=jnp.float32, precision="float32",
            )
            ids = lo + jax.lax.iota(jnp.int32, rows.shape[0])
            cat_s = jnp.concatenate([bs, s], axis=1)
            cat_i = jnp.concatenate(
                [bi, jnp.broadcast_to(ids, s.shape)], axis=1
            )
            # ids enter in ascending global order (carry first, then this
            # chunk ascending) and lax.top_k keeps the FIRST of equal
            # scores — the FAISS lowest-index-first tie rule holds across
            # the stream for free
            top_s, pos = jax.lax.top_k(cat_s, K)
            return top_s, jnp.take_along_axis(cat_i, pos, axis=1)

        q_f = jnp.asarray(queries[:n_fq])
        bs = jnp.full((n_fq, K), -jnp.inf, jnp.float32)
        bi = jnp.full((n_fq, K), -1, jnp.int32)
        t0 = time.perf_counter()
        for lo in range(0, N, _args.chunk_rows):
            hi = min(lo + _args.chunk_rows, N)
            rows = jnp.asarray(get_chunk(lo, hi), jnp.float32)
            bs, bi = merge(rows, lo, q_f, bs, bi)
        fp32_idx = np.asarray(bi)
        print(
            f"  fp32 streamed oracle ({n_fq} queries): "
            f"{time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        fp32_sets = [set(row.tolist()) for row in fp32_idx]

    for k_c in _args.clusters:
        t0 = time.perf_counter()
        pq = bool(_args.pq_m)
        index = IVFIPIndex.from_chunk_fn(
            get_chunk, N, D, chunk_rows=_args.chunk_rows,
            n_clusters=k_c, nprobe=max(_args.nprobes),
            kmeans_iters=_args.kmeans_iters,
            train_rows=(_args.train_rows or None),
            # pq REPLACES the storage codec: int8/reduced_dim conflict
            # with it by contract
            store_dtype=jnp.bfloat16 if pq else STORE,
            reduced_dim=(
                None if pq
                else (_args.reduced_dims[0] if _args.reduced_dims else None)
            ),
            candidates=_args.candidates,
            pq_m=(_args.pq_m or None),
            pq_rotate=(_args.pq_rotate if _args.pq_m else "none"),
            pq_layout=_args.pq_layout,
            capacity_slack=_args.capacity_slack,
            balance_eta=_args.balance_eta,
            kmeans_split=_args.kmeans_split,
        )
        print(
            f"  chunked build K={k_c}: {time.perf_counter() - t0:.1f}s "
            f"(capacity={index.capacity}, store={_args.store})",
            flush=True,
        )
        t0 = time.perf_counter()
        _, ref_idx = index.exact_search(queries, k=K, batch_size=Q)
        exact_s = time.perf_counter() - t0
        print(
            f"  exact_search (streamed scan oracle): {exact_s*1e3:.0f} ms "
            f"for {Q} queries -> {Q/exact_s:.0f} QPS",
            flush=True,
        )
        ref_sets = [set(row.tolist()) for row in ref_idx]

        for p in _args.nprobes:
            _, idx = index.search(queries, k=K, nprobe=p)
            recall = float(np.mean([
                len(set(idx[r].tolist()) & ref_sets[r]) / K
                for r in range(Q)
            ]))
            tag = ""
            if fp32_sets is not None:
                r32 = float(np.mean([
                    len(set(idx[r].tolist()) & fp32_sets[r]) / K
                    for r in range(n_fq)
                ]))
                tag = f" [recall_fp32={r32:.4f}]"
            fn = index.search_callable(K, nprobe=p)
            q_dev = jnp.asarray(queries)
            bench(
                lambda q, *arrs, fn=fn: fn(*arrs, q),
                (q_dev,) + index.search_arrays,
                f"ivf[chunked] K={k_c} nprobe={p}{tag}",
                recall,
            )


if __name__ == "__main__":
    main()
