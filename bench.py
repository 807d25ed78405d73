"""Headline benchmark: exact brute-force top-k QPS vs CPU baseline.

Targets BASELINE.json's north star: the FlatIP engine (replacing FAISS
IndexFlatIP, reference src/utils.py:38-80) must deliver >=10x FAISS-CPU QPS at
equal index memory. FAISS is not installed in this image, so the CPU baseline
is a numpy BLAS matmul + argpartition brute-force search — the same exact
algorithm class (and typically at least as fast as single-thread FAISS flat).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


N_CORPUS = 100_000
DIM = 1024
N_QUERIES = 4096
K = 100
BATCH = 4096  # engine-only measurement: one dispatch, dense path
# e2e dispatch granularity: FlatIPIndex.search dispatches batches async, so
# chunking pipelines H2D/compute/D2H (measured: 4 x 1024 beats one 4096
# dispatch by ~35% through the remote tunnel, docs/BENCHMARKS.md)
E2E_BATCH = 1024
CPU_QUERY_SAMPLE = 64  # measure CPU on a subset, scale QPS


def _make_data():
    rng = np.random.RandomState(0)
    corpus = rng.randn(N_CORPUS, DIM).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = rng.randn(N_QUERIES, DIM).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
    return corpus, queries


def _cpu_qps(corpus: np.ndarray, queries: np.ndarray) -> float:
    """Best of: C++ multithreaded heap top-k (FAISS-flat class) and numpy BLAS
    matmul + argpartition. Take the faster as the honest baseline."""
    sub = queries[:CPU_QUERY_SAMPLE]

    def numpy_path():
        scores = sub @ corpus.T
        part = np.argpartition(-scores, kth=K - 1, axis=1)[:, :K]
        ps = np.take_along_axis(scores, part, axis=1)
        order = np.argsort(-ps, axis=1, kind="stable")
        np.take_along_axis(part, order, axis=1)

    # best-of-3 per path: the honest baseline is the CPU at its FASTEST
    # (thread scheduling makes single-shot numbers swing several x)
    qps_numpy = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        numpy_path()
        qps_numpy = max(qps_numpy, len(sub) / (time.perf_counter() - t0))

    qps_native = 0.0
    try:
        from rankpo_tpu.native import native_topk_ip

        native_topk_ip(corpus[:1000], sub[:4], K)  # warm build
        for _ in range(3):
            t0 = time.perf_counter()
            native_topk_ip(corpus, sub, K)
            qps_native = max(qps_native, len(sub) / (time.perf_counter() - t0))
    except Exception:
        pass
    return max(qps_numpy, qps_native)


def _device_qps(corpus: np.ndarray, queries: np.ndarray) -> tuple:
    import jax
    import jax.numpy as jnp

    from rankpo_tpu.index import FlatIPIndex

    index = FlatIPIndex(corpus)
    # warmup + correctness gate: the headline number is only meaningful if
    # results match FAISS IndexFlatIP semantics (fp32 scores, lowest-index
    # ties) — check a row sample against the numpy oracle
    from rankpo_tpu.index.flat import numpy_search

    s, i = index.search(queries[:E2E_BATCH], k=K, batch_size=E2E_BATCH)
    assert np.all(np.isfinite(s))
    ref_s, ref_i = numpy_search(corpus, queries[:64], K)
    mismatch = i[:64] != ref_i
    n_bad = int(mismatch.sum())
    # fp32-faithful (bf16x3) matmul reorders accumulation vs numpy, so a
    # handful of exact near-ties may swap (documented residual: ~2e-7 score
    # error, docs/BENCHMARKS.md). Divergences must BE near-ties — the scores
    # at every mismatched position must agree to fp32 noise — and rare.
    if n_bad > 64 * K // 200 or not np.allclose(
        s[:64][mismatch], ref_s[mismatch], atol=2e-5
    ):
        raise AssertionError(
            f"top-k diverges from the fp32 oracle beyond near-tie noise "
            f"({n_bad}/{64 * K} entries) — refusing to report a throughput "
            "number for wrong results"
        )
    np.testing.assert_allclose(s[:64], ref_s, atol=2e-5)
    # best-of-7: e2e includes host<->device transfers, which through the
    # remote-TPU tunnel have multi-x run-to-run variance (measured 85 MB/s to
    # 8 MB/s for the same H2D within one day); the minimum is the honest
    # steady-state figure, and on_device_qps below isolates the engine
    dt = float("inf")
    for _ in range(7):
        t0 = time.perf_counter()
        index.search(queries, k=K, batch_size=E2E_BATCH)
        dt = min(dt, time.perf_counter() - t0)

    # engine-only throughput: queries pre-staged, scalar-sync (through the
    # remote tunnel, host<->device transfers dominate e2e — ~300ms H2D +
    # ~90ms D2H for this workload — which a real v5e host pays over PCIe at
    # GB/s instead; see docs/BENCHMARKS.md)
    q_dev = jax.device_put(jnp.asarray(queries[:BATCH]))
    search_fn = index._search_fns[K]
    REPS = 4  # amortize the ~25-30ms tunnel dispatch floor inside jit

    @jax.jit
    def loop(corpus_arg, scale, q):
        def body(i, carry):
            s, _ = search_fn(corpus_arg, scale, q + carry * 0.0)
            return carry + s[0, 0] * 1e-20
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    float(loop(index.corpus, index.row_scale, q_dev))  # compile
    t0 = time.perf_counter()
    float(loop(index.corpus, index.row_scale, q_dev))
    dt_dev = (time.perf_counter() - t0) / REPS
    return len(queries) / dt, BATCH / dt_dev, jax.default_backend()


def main():
    corpus, queries = _make_data()
    qps, qps_on_device, backend = _device_qps(corpus, queries)
    cpu_qps = _cpu_qps(corpus, queries)
    print(
        json.dumps(
            {
                "metric": f"exact_topk_qps_{N_CORPUS // 1000}k_corpus_d{DIM}_k{K}",
                "value": round(qps, 2),
                "unit": "queries/sec",
                "vs_baseline": round(qps / cpu_qps, 2),
                "baseline_cpu_qps": round(cpu_qps, 2),
                "on_device_qps": round(qps_on_device, 2),
                "backend": backend,
            }
        )
    )


if __name__ == "__main__":
    main()
