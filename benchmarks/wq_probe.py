"""Probe: is weight-only int8 worth it on TPU through plain XLA?

Serving-shaped matmuls (small batch M, big weights) are HBM-bandwidth-bound
on the WEIGHT read. Question: does XLA fuse the int8->bf16 convert into the
dot's operand stream (int8 bytes from HBM -> ~2x), or does it materialize a
bf16 copy (no win)? Also times the full-int8 MXU path (activations quantized
too) as the upper bound. Run on the real TPU (default env).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    M, K, N = 16, 2048, 8192
    L = 16  # simulate L layers' worth of distinct weights (defeat caching)
    rng = np.random.RandomState(0)
    w = rng.randn(L, K, N).astype(np.float32) * 0.02
    x = rng.randn(M, K).astype(np.float32)

    w_bf16 = jax.device_put(jnp.asarray(w, jnp.bfloat16))
    scale = np.abs(w).max(axis=1, keepdims=True) / 127.0  # [L,1,N] per-out-ch
    w_int8 = jax.device_put(
        jnp.asarray(np.clip(np.round(w / scale), -127, 127), jnp.int8)
    )
    s_dev = jax.device_put(jnp.asarray(scale[:, 0, :], jnp.float32))  # [L,N]
    x_dev = jax.device_put(jnp.asarray(x, jnp.bfloat16))

    REPS = 8

    def timeit(fn, *args):
        jfn = jax.jit(fn)
        float(jfn(*args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(jfn(*args))
            best = min(best, (time.perf_counter() - t0) / REPS / L)
        return best

    def loop(body):
        # UNROLLED over layers (a fori + dynamic-slice gather of w[l] costs a
        # [K,N] copy per layer that swamps the dtype effect being measured);
        # only the REPS amortization loop is dynamic
        def f(*args):
            def it(i, carry):
                c = carry
                for l in range(L):
                    # feed the carry into the activation input so no dot is
                    # loop-invariant (LICM would otherwise be free to hoist
                    # the unrolled bodies out of the REPS loop and deflate
                    # the timing by REPS — CLAUDE.md benchmarking rule)
                    x = args[0] + (c * 0).astype(args[0].dtype)
                    c = c + body(l, x, *args[1:]) * 1e-20
                return c
            return jax.lax.fori_loop(0, REPS, it, jnp.float32(0.0))
        return f

    print("staged inputs", flush=True)
    t_bf16 = timeit(
        loop(lambda l, xv, wv: jnp.sum(xv @ wv[l])), x_dev, w_bf16
    )
    print("bf16 done", flush=True)
    t_wq = timeit(
        loop(
            lambda l, xv, wv, sv: jnp.sum(
                (xv @ wv[l].astype(jnp.bfloat16)) * sv[l]
            )
        ),
        x_dev, w_int8, s_dev,
    )

    def full_int8(l, xv, wv, sv):
        # dynamic per-row activation quant + int8 MXU dot
        xs = jnp.max(jnp.abs(xv), axis=1, keepdims=True) / 127.0
        xq = jnp.clip(jnp.round(xv / xs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wv[l], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return jnp.sum(acc.astype(jnp.float32) * xs * sv[l])

    print("wq done", flush=True)
    t_int8 = timeit(loop(full_int8), x_dev.astype(jnp.float32), w_int8, s_dev)

    bytes_bf16 = K * N * 2
    print(f"[M={M}, K={K}, N={N}] per-matmul, amortized over {L} layers x {REPS} reps")
    print(f"  bf16 weights:            {t_bf16*1e6:8.1f} us  "
          f"({bytes_bf16/t_bf16/1e9:.0f} GB/s effective)")
    print(f"  int8 weights, bf16 dot:  {t_wq*1e6:8.1f} us  ({t_bf16/t_wq:.2f}x)")
    print(f"  int8 weights+acts, MXU:  {t_int8*1e6:8.1f} us  ({t_bf16/t_int8:.2f}x)")


if __name__ == "__main__":
    main()
