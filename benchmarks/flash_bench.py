"""Flash-attention kernel benchmark (fwd and fwd+bwd), real-TPU amortized.

The docs/BENCHMARKS.md flash numbers come from this harness: B4 S4096
H16/KV8 D128 causal bf16, full-length mask plus a ~1k-real-length padded
variant, and sliding-window rows. Timing amortizes the ~25-30 ms tunnel
dispatch floor inside jit and fetches one scalar to sync (CLAUDE.md).

    python benchmarks/flash_bench.py [--bwd]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from rankpo_tpu.ops.flash_attention import flash_attention

B, S, HQ, HKV, D = 4, 4096, 16, 8, 128
REPS = 8


def timed(fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, carry):
            out = fn(a[0] + carry.astype(a[0].dtype) * 0, *a[1:])
            return carry + out.reshape(-1)[0].astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    float(loop(*args))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bwd", action="store_true")
    args = ap.parse_args()

    print(f"backend={jax.default_backend()} B{B} S{S} H{HQ}/KV{HKV} D{D}",
          flush=True)
    rng = np.random.RandomState(0)
    q = jax.device_put(jnp.asarray(rng.randn(B, S, HQ, D), jnp.bfloat16))
    k = jax.device_put(jnp.asarray(rng.randn(B, S, HKV, D), jnp.bfloat16))
    v = jax.device_put(jnp.asarray(rng.randn(B, S, HKV, D), jnp.bfloat16))
    full = jax.device_put(jnp.ones((B, S), jnp.int32))
    pad = np.zeros((B, S), np.int32)
    pad[:, :1024] = 1  # ~1k real tokens: the training-shaped case
    padded = jax.device_put(jnp.asarray(pad))

    cases = [
        ("causal full-len", dict(mask=full, causal=True)),
        ("causal padded-1k skip_pad_q", dict(mask=padded, causal=True,
                                             skip_pad_q=True)),
        ("causal window=512", dict(mask=full, causal=True, window=512)),
        ("non-causal full-len", dict(mask=full, causal=False)),
    ]
    for name, kw in cases:
        if args.bwd:
            def fn(q_, k_=k, v_=v, kw=kw):
                def f(qq, kk, vv):
                    return jnp.sum(
                        flash_attention(qq, kk, vv, **kw).astype(jnp.float32)
                        ** 2
                    )
                g = jax.grad(f, argnums=(0, 1, 2))(q_, k_, v_)
                return g[0]
            t = timed(fn, q)
            print(f"  fwd+bwd {name:28} {t*1e3:7.2f} ms", flush=True)
        else:
            def fn(q_, k_=k, v_=v, kw=kw):
                return flash_attention(q_, k_, v_, **kw)
            t = timed(fn, q)
            print(f"  fwd     {name:28} {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
