"""True int8xint8->int32 MXU matmul for int8-storage search.

The current int8 path (ops/topk.py dense_matmul_topk) upcasts the int8
corpus to the query dtype (bf16) so the dequant fuses into the matmul —
i.e. it runs a BF16 matmul and the int8 MXU path (2x bf16 peak on v5e,
~394 TOPS) is never used. This probe quantizes the QUERIES too (symmetric
per-row int8) and issues einsum(int8, int8 -> int32).

Order-preservation trick: a per-QUERY scale multiplies its whole score row
uniformly, so top-k ORDER is invariant to it — only the per-corpus-row
col_scale must be applied before selection; the final [Q, K] scores are
rescaled by q_scale afterwards. So the int32 score matrix needs one
elementwise multiply (col_scale), same traffic as today's fp32 path.

Measures QPS + recall vs the fp32 oracle at [1024, 1M, d1024] k=100 for:
  - current path: int8 corpus upcast to bf16, bf16 queries (baseline)
  - true int8: int8 x int8 -> int32, exact blockmax selection
  - true int8: int8 x int8 -> int32, approx_max_k (recall_target) selection
Run on the real chip.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=1_000_000)
parser.add_argument("--d", type=int, default=1024)
parser.add_argument("--q", type=int, default=1024)
parser.add_argument("--k", type=int, default=100)
_args = parser.parse_args()
N, D, Q, K = _args.n, _args.d, _args.q, _args.k
RT = 0.95


def quantize_rows(x):
    """Symmetric per-row max-abs int8 (mirrors index/flat.py storage)."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=1), 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.key(0)
    corpus = jax.random.normal(jax.random.fold_in(key, 0), (N, D), jnp.bfloat16)
    queries = jax.random.normal(jax.random.fold_in(key, 1), (Q, D), jnp.bfloat16)
    corpus_i8, col_scale = jax.jit(quantize_rows)(corpus)
    queries_i8, q_scale = jax.jit(quantize_rows)(queries)
    jax.block_until_ready((corpus_i8, queries_i8))

    from rankpo_tpu.ops.topk import exact_topk_blockmax

    # fp32 oracle (blockmax over an fp32-faithful matmul)
    def oracle_topk(q, c):
        s = jnp.einsum(
            "qd,nd->qn", q.astype(jnp.float32), c.astype(jnp.float32),
            preferred_element_type=jnp.float32, precision="float32",
        )
        return exact_topk_blockmax(s, K)[1]

    oracle = np.asarray(jax.jit(oracle_topk)(queries, corpus))
    print("  oracle ready", flush=True)

    # --- current path: dequant fused into a bf16 matmul ---------------------
    def bf16_path(q, c, cs):
        s = jnp.einsum(
            "qd,nd->qn", q, c.astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
        s = s * cs[None, :]
        return exact_topk_blockmax(s, K)

    # --- true int8 path ------------------------------------------------------
    def int8_path(q8, c8, cs, qs, selector):
        s32 = jnp.einsum(
            "qd,nd->qn", q8, c8, preferred_element_type=jnp.int32
        )
        # col_scale before selection (per-row q_scale is order-invariant)
        s = s32.astype(jnp.float32) * cs[None, :]
        top_s, idx = selector(s)
        return top_s * qs[:, None], idx

    def sel_exact(s):
        return exact_topk_blockmax(s, K)

    def sel_approx(s):
        ts, i = jax.lax.approx_max_k(
            s, K, recall_target=RT, aggregate_to_topk=True
        )
        return ts, i

    REPS = 4
    cases = [
        ("bf16-dequant exact", jax.jit(bf16_path),
         (queries, corpus_i8, col_scale)),
        ("int8-mxu    exact", jax.jit(functools.partial(
            int8_path, selector=sel_exact)),
         (queries_i8, corpus_i8, col_scale, q_scale)),
        ("int8-mxu    approx", jax.jit(functools.partial(
            int8_path, selector=sel_approx)),
         (queries_i8, corpus_i8, col_scale, q_scale)),
    ]
    for name, fn, args in cases:
        def loop(*a, _fn=fn):
            def body(i, carry):
                s, _ = _fn(*a)
                return carry + s[0, 0].astype(jnp.float32) * 1e-20
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        loop_fn = jax.jit(loop)
        float(loop_fn(*args))  # compile + warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(loop_fn(*args))
            best = min(best, (time.perf_counter() - t0) / REPS)
        idx = np.asarray(fn(*args)[1])
        recall = np.mean([
            len(set(idx[r]) & set(oracle[r])) / K for r in range(Q)
        ])
        print(
            f"  {name:20} {best*1e3:7.1f} ms -> {Q/best:7.0f} QPS  "
            f"recall={recall:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
