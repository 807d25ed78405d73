"""Alternative formulations for the two slow blockmax-selection phases.

select_phase_probe measured (v5e, [1024, 1M] fp32 scores, block=32):
reduce 22.5 ms (~180 GB/s effective vs 819 peak), gather 20.6 ms,
topk_m 39 ms. This probe races formulations:

reduce m[Q, B] = max over 32-column groups:
  r_reshape : jnp.max(scores.reshape(q, b, 32), -1)       (current)
  r_window  : lax.reduce_window (1,32)/(1,32)
  r_strided : 32-ary jnp.maximum over scores[:, g::32]    (one fused read)
  r_pallas  : tiled Pallas kernel (max over lane groups)

gather cand[Q, C*32] from scores given sorted block ids bi[Q, C]:
  g_take    : vmap take on [Q, B, 32] view                (current)
  g_dynslice: vmap over C of dynamic_slice on [Q, N]
  g_cols    : take_along_axis with expanded column ids

Run on the real chip: python benchmarks/reduce_gather_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK = 32
C = 116


def timeit(fn, *args, reps=8, iters=5):
    def loop(*a):
        def body(i, carry):
            out = fn(*(x + carry * 0.0 if x.dtype == jnp.float32 else x
                       for x in a))
            return carry + jnp.sum(jax.tree.leaves(out)[0][0]) * 1e-20
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    loop_fn = jax.jit(loop)
    out = float(loop_fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(loop_fn(*args))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def _pallas_blockmax(scores, q, n):
    BQ, BN = 256, 16384  # [BQ, BN] fp32 tile = 16 MB? no: 256*16384*4 = 16MB
    # keep tiles at 4 MB: 256 x 4096
    BQ, BN = 256, 4096

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jnp.max(x.reshape(BQ, BN // BLOCK, BLOCK), axis=-1)

    return pl.pallas_call(
        kernel,
        grid=(q // BQ, n // BN),
        in_specs=[pl.BlockSpec((BQ, BN), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((BQ, BN // BLOCK), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((q, n // BLOCK), jnp.float32),
    )(scores)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.key(0)
    for q, n in [(1024, 1_000_000), (4096, 100_000)]:
        b = n // BLOCK
        n32 = b * BLOCK
        scores = jax.random.normal(jax.random.fold_in(key, n), (q, n32), jnp.float32)
        m0 = jax.jit(lambda s: jnp.max(s.reshape(q, b, BLOCK), axis=-1))(scores)
        bi = jnp.sort(jax.lax.top_k(m0, C)[1], axis=1)

        def r_reshape(s):
            return jnp.max(s.reshape(q, b, BLOCK), axis=-1)

        def r_window(s):
            return jax.lax.reduce_window(
                s, -jnp.inf, jax.lax.max,
                window_dimensions=(1, BLOCK), window_strides=(1, BLOCK),
                padding="VALID")

        def r_strided(s):
            return functools.reduce(
                jnp.maximum, [s[:, g::BLOCK] for g in range(BLOCK)])

        def r_pallas(s):
            return _pallas_blockmax(s, q, n32)

        def g_take(s, idx):
            return jax.vmap(lambda s3, i: jnp.take(s3, i, axis=0))(
                s.reshape(q, b, BLOCK), idx).reshape(q, C * BLOCK)

        def g_dynslice(s, idx):
            def per_query(row, ids):
                return jax.vmap(
                    lambda j: jax.lax.dynamic_slice(row, (j * BLOCK,), (BLOCK,))
                )(ids).reshape(C * BLOCK)
            return jax.vmap(per_query)(s, idx)

        def g_cols(s, idx):
            cols = (idx[:, :, None] * BLOCK
                    + jnp.arange(BLOCK, dtype=jnp.int32)[None, None, :]
                    ).reshape(q, C * BLOCK)
            return jnp.take_along_axis(s, cols, axis=1)

        print(f"[{q}, {n32}]:", flush=True)
        ref_m = None
        for name, fn, args in [
            ("r_reshape", r_reshape, (scores,)),
            ("r_window", r_window, (scores,)),
            ("r_strided", r_strided, (scores,)),
            ("r_pallas", r_pallas, (scores,)),
        ]:
            try:
                out = jax.jit(fn)(*args)
                if ref_m is None:
                    ref_m = out
                ok = bool(jnp.all(out == ref_m))
                t = timeit(jax.jit(fn), *args)
                print(f"  {name:10} {t*1e3:7.2f} ms  match={ok}", flush=True)
            except Exception as e:
                print(f"  {name:10} FAILED: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
        ref_g = None
        for name, fn in [("g_take", g_take), ("g_dynslice", g_dynslice),
                         ("g_cols", g_cols)]:
            try:
                out = jax.jit(fn)(scores, bi)
                if ref_g is None:
                    ref_g = out
                ok = bool(jnp.all(out == ref_g))
                t = timeit(jax.jit(fn), scores, bi)
                print(f"  {name:10} {t*1e3:7.2f} ms  match={ok}", flush=True)
            except Exception as e:
                print(f"  {name:10} FAILED: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
        del scores, m0, bi


if __name__ == "__main__":
    main()
