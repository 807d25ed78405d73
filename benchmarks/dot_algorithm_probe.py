"""Dot-algorithm race for the fp32-faithful score matmul.

The exact engine pays precision="float32" for FAISS score parity
(docs/BENCHMARKS.md: 31 ms vs 8 ms default at [4096, 100k, d1024]) — but a
bf16x3 roofline is ~13 ms, suggesting that string lowers to SIX passes on
this toolchain. XLA exposes explicit algorithms (lax.DotAlgorithmPreset):
race BF16_BF16_F32 / _X3 / _X6 / _X9 and the string spellings for time AND
max |error| vs a float64 host reference on real data shapes.

Run on the real chip: python -u benchmarks/dot_algorithm_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

Q, N, D = 4096, 100_000, 1024
REPS = 8


def main():
    print(f"backend={jax.default_backend()} [{Q}, {N}, {D}]", flush=True)
    rng = np.random.RandomState(0)
    q_np = rng.randn(Q, D).astype(np.float32)
    c_np = rng.randn(N, D).astype(np.float32)
    q_np /= np.linalg.norm(q_np, axis=-1, keepdims=True)
    c_np /= np.linalg.norm(c_np, axis=-1, keepdims=True)
    # float64 host reference on a probe slice
    ref = q_np[:64].astype(np.float64) @ c_np[:4096].astype(np.float64).T

    q_dev = jax.device_put(jnp.asarray(q_np))
    c_dev = jax.device_put(jnp.asarray(c_np))

    P = lax.DotAlgorithmPreset
    variants = [
        ("default", None),
        ("str float32", "float32"),
        ("BF16_BF16_F32", P.BF16_BF16_F32),
        ("BF16_BF16_F32_X3", P.BF16_BF16_F32_X3),
        ("BF16_BF16_F32_X6", P.BF16_BF16_F32_X6),
        ("BF16_BF16_F32_X9", P.BF16_BF16_F32_X9),
    ]
    for name, prec in variants:
        try:
            kw = {} if prec is None else {"precision": prec}

            def mm(q, c, kw=kw):
                return jnp.einsum(
                    "qd,nd->qn", q, c,
                    preferred_element_type=jnp.float32, **kw
                )

            fn = jax.jit(mm)
            probe = np.asarray(fn(q_dev[:64], c_dev[:4096]))
            err = float(np.abs(probe.astype(np.float64) - ref).max())

            def loop(q, c):
                def body(i, carry):
                    s = mm(q + carry * 0.0, c)
                    return carry + s[0, 0] * 1e-20
                return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

            loop_fn = jax.jit(loop)
            float(loop_fn(q_dev, c_dev))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(loop_fn(q_dev, c_dev))
                best = min(best, (time.perf_counter() - t0) / REPS)
            print(f"  {name:18} {best*1e3:7.2f} ms   max|err| {err:.3e}",
                  flush=True)
        except Exception as e:
            print(f"  {name:18} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
