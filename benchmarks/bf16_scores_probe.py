"""bf16 score matrix for the approx (recall_target) search path.

The approx path's cost at [1024, 1M] is dominated by lax.approx_max_k
scanning the materialized score matrix, which dense_matmul_topk always
produces in fp32 (preferred_element_type). In approx mode the scores are
already bf16-rounded products of a default-precision matmul, so storing
the matrix in bf16 halves the scan's HBM traffic (4 GB -> 2 GB at 1M)
at zero additional score error beyond one final rounding.

Measures QPS and recall-vs-fp32-oracle for fp32 vs bf16 score matrices,
int8 and bf16 corpus storage. Run on the real chip.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N, D, Q, K = 1_000_000, 1024, 1024, 100
RT = 0.95


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.key(0)
    corpus = jax.random.normal(jax.random.fold_in(key, 0), (N, D), jnp.bfloat16)
    queries = jax.random.normal(jax.random.fold_in(key, 1), (Q, D), jnp.bfloat16)

    # int8 symmetric per-row quantization (mirrors index/flat.py storage)
    absmax = jnp.max(jnp.abs(corpus.astype(jnp.float32)), axis=1)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    corpus_i8 = jnp.clip(
        jnp.round(corpus.astype(jnp.float32) / scale[:, None]), -127, 127
    ).astype(jnp.int8)

    def search(q, c, col_scale, acc_dtype):
        scores = jnp.einsum(
            "qd,nd->qn", q, c.astype(q.dtype),
            preferred_element_type=acc_dtype,
        )
        if col_scale is not None:
            scores = scores * col_scale[None, :].astype(acc_dtype)
        s, i = jax.lax.approx_max_k(
            scores, K, recall_target=RT, aggregate_to_topk=True
        )
        return s.astype(jnp.float32), i

    # fp32 oracle top-k sets for recall (blockmax exact engine — the 1M-wide
    # plain sort compiles for many minutes through the remote toolchain)
    import functools

    from rankpo_tpu.ops.topk import exact_topk_blockmax

    def oracle_topk(q, c):
        # arrays ride as ARGUMENTS: closed-over device arrays become HLO
        # constants and blow up the remote compile (CLAUDE.md)
        qf = q.astype(jnp.float32)
        cf = c.astype(jnp.float32)
        s = jnp.einsum("qd,nd->qn", qf, cf, preferred_element_type=jnp.float32,
                       precision="float32")
        return exact_topk_blockmax(s, K)[1]
    oracle = np.asarray(jax.jit(oracle_topk)(queries, corpus))
    print("  oracle ready", flush=True)

    REPS = 4
    for name, c, cs in [
        ("bf16-corpus", corpus, None),
        ("int8-corpus", corpus_i8, scale),
    ]:
        for acc in (jnp.float32, jnp.bfloat16):
            fn = jax.jit(functools.partial(search, acc_dtype=acc))

            def loop(q, c_, cs_):
                def body(i, carry):
                    s, _ = fn(q, c_, cs_)
                    return carry + s[0, 0].astype(jnp.float32) * 1e-20
                return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

            loop_fn = jax.jit(loop)
            float(loop_fn(queries, c, cs))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(loop_fn(queries, c, cs))
                best = min(best, (time.perf_counter() - t0) / REPS)
            idx = np.asarray(fn(queries, c, cs)[1])
            recall = np.mean([
                len(set(idx[r]) & set(oracle[r])) / K for r in range(Q)
            ])
            print(
                f"  {name:12} scores={np.dtype(acc).name:8} "
                f"{best*1e3:7.1f} ms -> {Q/best:7.0f} QPS  recall={recall:.4f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
