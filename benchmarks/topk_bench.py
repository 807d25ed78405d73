"""On-device exact top-k benchmark: plain-sort vs two-pass blockmax vs approx.

Timing through the remote-TPU tunnel fetches only a SCALAR to synchronize
(fetching the [Q, k] outputs would measure D2H, not compute — see CLAUDE.md).
Run with the default env on the real chip:

    python benchmarks/topk_bench.py [--q 4096] [--n 100000] [--d 1024] [--k 100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=4096)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rankpo_tpu.ops import topk as topk_mod

    rng = np.random.RandomState(0)
    corpus = rng.randn(args.n, args.d).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = rng.randn(args.q, args.d).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)

    c_dev = jax.device_put(jnp.asarray(corpus))
    q_dev = jax.device_put(jnp.asarray(queries))

    def scores_of(q, c):
        return jnp.einsum("qd,nd->qn", q, c, preferred_element_type=jnp.float32)

    variants = {
        "matmul_only": jax.jit(lambda q, c: jnp.sum(scores_of(q, c))),
        "plain_sort": jax.jit(
            lambda q, c: jnp.sum(jax.lax.top_k(scores_of(q, c), args.k)[0])
        ),
        "blockmax_2pass": jax.jit(
            lambda q, c: jnp.sum(
                topk_mod.exact_topk_blockmax(scores_of(q, c), args.k)[0]
            )
        ),
        "approx_r095": jax.jit(
            lambda q, c: jnp.sum(
                jax.lax.approx_max_k(
                    scores_of(q, c), args.k, recall_target=0.95,
                    aggregate_to_topk=True,
                )[0]
            )
        ),
    }

    print(f"[Q={args.q}, N={args.n}, D={args.d}, k={args.k}] "
          f"backend={jax.default_backend()}")
    results = {}
    REPS = 8  # amortize the ~25-30ms tunnel dispatch floor inside jit
    for name, fn in variants.items():

        def loop(q, c, fn=fn):
            def body(i, carry):
                # data-dependent carry so XLA cannot hoist the op out
                return carry + fn(q + carry * 0.0, c) * 1e-20
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        loop_fn = jax.jit(loop)
        float(loop_fn(q_dev, c_dev))  # compile + sync via scalar
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(loop_fn(q_dev, c_dev))
            times.append((time.perf_counter() - t0) / REPS)
        best = min(times)
        results[name] = best
        print(f"  {name:15} {best*1e3:8.2f} ms   "
              f"{args.q/best:10.0f} QPS on-device")
    if "plain_sort" in results and "blockmax_2pass" in results:
        print(f"  blockmax speedup vs plain sort: "
              f"{results['plain_sort']/results['blockmax_2pass']:.2f}x")


if __name__ == "__main__":
    main()
