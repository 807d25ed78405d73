"""Filtered-search (IDSelector analog) cost probe.

Measures exact FlatIP search QPS with and without a row filter at a
realistic shape. The filter is one where-select on the [Q, N] score matrix
before top-k (ops/topk.py row_mask) — expectation: ~free next to the score
matmul. FAISS pays a per-row branch in its scan loop instead (its docs
recommend selectivity-aware fallbacks); on TPU the mask is data-parallel.

Run on real TPU:  python benchmarks/selector_probe.py --n 1000000
CPU smoke:        PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
                      python benchmarks/selector_probe.py --n 100000 --q 64
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--keep_frac", type=float, default=0.5,
                    help="fraction of rows eligible under the filter")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rankpo_tpu.index.flat import FlatIPIndex

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(args.n, args.d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.normal(size=(args.q, args.d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    keep = rng.random(args.n) < args.keep_frac

    index = FlatIPIndex(corpus)
    print(f"backend={jax.default_backend()} n={args.n} d={args.d} "
          f"q={args.q} k={args.k} keep={args.keep_frac}")

    def timed(label, **kw):
        # warm (compile)
        index.search(queries, k=args.k, batch_size=args.q, **kw)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            s, i = index.search(queries, k=args.k, batch_size=args.q, **kw)
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:<12} {best * 1e3:8.1f} ms  "
              f"{args.q / best:10.0f} QPS")
        return best, i

    t_plain, i_plain = timed("unfiltered")
    t_sel, i_sel = timed("filtered", selector=keep)
    # correctness spot check: filtered hits all eligible
    hits = i_sel[i_sel >= 0]
    assert keep[hits].all(), "filtered search returned an ineligible row"
    print(f"  filtered/unfiltered e2e ratio: {t_sel / t_plain:.3f}x")

    # separate the mask H2D (N bool bytes per call — a dev-tunnel tax, a
    # rounding error over real PCIe) from the on-device where-select:
    # time the compiled programs directly with pre-placed inputs
    kk = min(args.k, args.n)
    with index._search_lock:
        fn_plain = index._search_fns[kk]
        fn_sel = index._search_fns[("sel", kk)]
    q_dev = jnp.asarray(queries)
    sel_dev = index._place_selector(keep)
    args_plain = (index.corpus, index.row_scale, index._n_valid_dev, q_dev)

    def timed_dev(label, fn, *extra):
        jax.block_until_ready(fn(*args_plain, *extra))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*args_plain, *extra)
            # scalar fetch to synchronize (CLAUDE.md: fetching [Q, k]
            # through the tunnel measures D2H, not compute)
            float(out[0][0, 0])
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:<12} {best * 1e3:8.1f} ms  "
              f"{args.q / best:10.0f} QPS (on-device, pre-placed)")
        return best

    td_plain = timed_dev("dev-plain", fn_plain)
    td_sel = timed_dev("dev-filtered", fn_sel, sel_dev)
    print(f"  on-device where-select cost: {td_sel / td_plain:.3f}x")


if __name__ == "__main__":
    main()
