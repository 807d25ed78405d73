"""Full-search A/B: 1-level vs 2-level blockmax at [1024, 1M, d1024].

hier_blockmax_probe measured select-only: 60.6 -> 56.1 ms (1.08x) at 1M.
This measures the number that matters — the whole exact search (fp32
storage, fp32-faithful matmul) with each selection — since XLA fusion
against the matmul producer can change the delta.

Run on the real chip: python benchmarks/hier_full_search_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.hier_blockmax_probe import hier_topk
from rankpo_tpu.ops import topk as topk_mod

N, D, Q, K = 1_000_000, 1024, 1024, 100


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.key(0)
    corpus = jax.random.normal(jax.random.fold_in(key, 0), (N, D), jnp.float32)
    queries = jax.random.normal(jax.random.fold_in(key, 1), (Q, D), jnp.float32)

    def scores_of(q, c):
        return jnp.einsum("qd,nd->qn", q, c,
                          preferred_element_type=jnp.float32,
                          precision="float32")

    variants = {
        "full_1level": lambda q, c: topk_mod.exact_topk_blockmax(
            scores_of(q, c), K),
        "full_2level": lambda q, c: hier_topk(scores_of(q, c), K),
    }
    REPS = 4
    outs = {}
    for name, fn in variants.items():
        def loop(q, c, fn=fn):
            def body(i, carry):
                out = fn(q + carry * 0.0, c)
                return carry + jnp.sum(out[0][0]) * 1e-20
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        loop_fn = jax.jit(loop)
        float(loop_fn(queries, corpus))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(loop_fn(queries, corpus))
            best = min(best, (time.perf_counter() - t0) / REPS)
        outs[name] = best
        print(f"  {name}: {best*1e3:7.1f} ms/dispatch -> {Q/best:8.0f} QPS",
              flush=True)
    print(f"  speedup: {outs['full_1level']/outs['full_2level']:.3f}x",
          flush=True)
    # result parity on the real shapes
    a = jax.jit(variants["full_1level"])(queries, corpus)
    b = jax.jit(variants["full_2level"])(queries, corpus)
    print(f"  parity: scores={bool(jnp.all(a[0]==b[0]))} "
          f"idx={bool(jnp.all(a[1]==b[1]))}", flush=True)


if __name__ == "__main__":
    main()
