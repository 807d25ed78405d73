"""Phase decomposition of the blockmax selection at large N.

hier_blockmax_probe measured that replacing the [Q, N/32]-wide block top_k
with a two-level sort saves only ~4.5 ms of the ~60 ms selection at
[1024, 1M] — so the wide sort is NOT the bottleneck. This probe times each
phase of exact_topk_blockmax in isolation to find what is:

  reduce   : m = max over [Q, B, 32] reshape of the scores
  reduce_rw: same via lax.reduce_window (no reshape copy)
  topk_m   : lax.top_k(m, k+16) on a precomputed m
  gather   : candidate-block gather + column ids on precomputed indices
  candsort : lax.top_k over the gathered [Q, (k+16)*32] candidates
  verify   : the exactness check reductions

Run on the real chip: python benchmarks/select_phase_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BLOCK = 32
K = 100
C = K + 16


def timeit(fn, *args, reps=8, iters=5):
    def loop(*a):
        def body(i, carry):
            out = fn(*(x + carry * 0.0 if x.dtype == jnp.float32 else x
                       for x in a))
            return carry + jnp.sum(jax.tree.leaves(out)[0][0]) * 1e-20
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    loop_fn = jax.jit(loop)
    float(loop_fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(loop_fn(*args))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.key(0)
    for q, n in [(1024, 1_000_000), (4096, 100_000)]:
        b = n // BLOCK
        scores = jax.random.normal(jax.random.fold_in(key, n), (q, n), jnp.float32)
        m0 = jax.jit(lambda s: jnp.max(s.reshape(q, b, BLOCK), axis=-1))(scores)
        bi = jnp.sort(
            jax.lax.top_k(m0, C)[1], axis=1
        )  # [Q, C] sorted block ids
        cand0 = jax.vmap(lambda s3, idx: jnp.take(s3, idx, axis=0))(
            scores.reshape(q, b, BLOCK), bi
        ).reshape(q, C * BLOCK)

        def reduce_reshape(s):
            return jnp.max(s.reshape(q, b, BLOCK), axis=-1)

        def reduce_rw(s):
            return jax.lax.reduce_window(
                s, -jnp.inf, jax.lax.max,
                window_dimensions=(1, BLOCK), window_strides=(1, BLOCK),
                padding="VALID",
            )

        def topk_m(m):
            return jax.lax.top_k(m, C)

        def gather(s, idx):
            c3 = jax.vmap(lambda s3, i: jnp.take(s3, i, axis=0))(
                s.reshape(q, b, BLOCK), idx
            )
            return c3.reshape(q, C * BLOCK)

        def candsort(c):
            return jax.lax.top_k(c, K)

        def verify(m, cand):
            theta = cand[:, :1]  # any [Q, 1] threshold: timing only
            return jnp.sum(m >= theta, axis=1).astype(jnp.float32)

        rows = [
            ("reduce(reshape)", reduce_reshape, (scores,)),
            ("reduce(window)", reduce_rw, (scores,)),
            ("topk_m", topk_m, (m0,)),
            ("gather", gather, (scores, bi)),
            ("candsort", candsort, (cand0,)),
            ("verify", verify, (m0, cand0)),
        ]
        print(f"[{q}, {n}] k={K}:", flush=True)
        for name, fn, args in rows:
            t = timeit(jax.jit(fn), *args)
            print(f"  {name:16} {t*1e3:7.2f} ms", flush=True)
        del scores, m0, bi, cand0


if __name__ == "__main__":
    main()
