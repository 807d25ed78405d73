"""Dot-algorithm race measured through the FULL exact search engine.

dot_algorithm_probe.py's bare-einsum timing was invalid: consuming the
score matrix via s[0,0] lets XLA slice the whole matmul to one dot product
(all algorithms measured ~4.4 ms — a one-row computation). The engine's
top-k custom calls are not sliceable, so this probe times the real thing:
matmul_topk (fp32 corpus, exact selection) with the matmul precision set
to the string "float32" (current default) vs explicit
lax.DotAlgorithmPreset members, plus index-level parity vs the fp32 numpy
oracle. If "float32" lowers to X6, X3 may halve the matmul passes while
keeping near-tie divergence within the documented gate.

Run on the real chip: python -u benchmarks/dot_algorithm_engine_probe.py
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

from rankpo_tpu.ops.topk import matmul_topk

Q, N, D, K = 4096, 100_000, 1024, 100
REPS = 4


def main():
    print(f"backend={jax.default_backend()} [{Q}, {N}, {D}] k={K}", flush=True)
    rng = np.random.RandomState(0)
    q_np = rng.randn(Q, D).astype(np.float32)
    c_np = rng.randn(N, D).astype(np.float32)
    q_np /= np.linalg.norm(q_np, axis=-1, keepdims=True)
    c_np /= np.linalg.norm(c_np, axis=-1, keepdims=True)

    # fp32 numpy oracle on a 64-query probe (FAISS tie rule)
    scores_ref = q_np[:64] @ c_np.T
    ref_i = np.argsort(-scores_ref, axis=1, kind="stable")[:, :K]
    ref_s = np.take_along_axis(scores_ref, ref_i, axis=1)

    q_dev = jax.device_put(jnp.asarray(q_np))
    c_dev = jax.device_put(jnp.asarray(c_np))

    P = lax.DotAlgorithmPreset
    variants = [
        ("str float32 (current)", "float32"),
        ("BF16_BF16_F32_X3", P.BF16_BF16_F32_X3),
        ("BF16_BF16_F32_X6", P.BF16_BF16_F32_X6),
        ("default (1 pass)", "default"),
    ]
    for name, prec in variants:
        try:
            def search(q, c, prec=prec):
                return matmul_topk(q, c, k=K, precision=prec)

            fn = jax.jit(search)
            s, i = jax.device_get(fn(q_dev, c_dev))
            mism = int((i[:64] != ref_i).sum())
            serr = float(np.abs(s[:64] - ref_s).max())

            def loop(q, c):
                def body(_, carry):
                    ss, _ii = search(q + carry * 0.0, c)
                    return carry + ss[0, 0] * 1e-20
                return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

            loop_fn = jax.jit(loop)
            float(loop_fn(q_dev, c_dev))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(loop_fn(q_dev, c_dev))
                best = min(best, (time.perf_counter() - t0) / REPS)
            print(
                f"  {name:22} {best*1e3:7.2f} ms -> {Q/best:7.0f} QPS  "
                f"idx mism {mism}/{64*K}  max|s err| {serr:.2e}",
                flush=True,
            )
        except Exception as e:
            print(f"  {name:22} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
