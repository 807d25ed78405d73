"""Reduced-dimension prefilter + exact rerank (FAISS IndexRefineFlat analog).

The 1M approx path (bf16 matmul + approx_max_k) measured ~81% MXU-bound —
further QPS needs FEWER FLOPs, not better scheduling. Classic two-stage
retrieval does exactly that: stage 1 scores all N rows in a PCA-projected
d' << D space (d'/D of the FLOPs and HBM bytes), keeps top-C candidates,
stage 2 gathers those C full-precision rows per query (contiguous D-sized
rows, well above the gather-efficiency floor) and reranks exactly.

Cost model at [Q=1024, N=1M, D=1024, d'=256, C=512, bf16]:
  stage1 matmul  Q*N*d'*2 = 0.54 TFLOP (vs 2.1 full-D) + N*d'*2B = 0.5 GB read
  gather         Q*C*D*2B = 1.1 GB read
  rerank         Q*C*D*2 = 1.1 GFLOP (negligible)
so ~2-3x over the single-stage approx path if recall holds.

Projection: top-d' eigenvectors of the corpus covariance (PCA), computed
on device (one [D, D] eigh). Recall vs the fp32 oracle is the gate; sweep
d' x C. Run on the real chip.
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
parser.add_argument("--dims", type=int, nargs="+", default=[128, 256])
parser.add_argument("--cands", type=int, nargs="+", default=[256, 512, 1024])
parser.add_argument(
    "--anisotropic", action="store_true",
    help="give the synthetic corpus a decaying spectrum (real embedding "
    "matrices are strongly anisotropic; isotropic gaussians are PCA's "
    "worst case)",
)
_args = parser.parse_args()
N, D, Q, K = _args.n, _args.d, _args.q, _args.k
RT = 0.95


def make_data(key):
    kc, kq = jax.random.split(key)
    c = jax.random.normal(kc, (N, D), jnp.float32)
    q = jax.random.normal(kq, (Q, D), jnp.float32)
    if _args.anisotropic:
        # power-law spectrum ~ i^-0.5: mild vs real text embeddings
        spec = (jnp.arange(1, D + 1, dtype=jnp.float32)) ** -0.5
        c = c * spec[None, :]
        q = q * spec[None, :]
    c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return c.astype(jnp.bfloat16), q.astype(jnp.bfloat16)


def pca_projection(corpus, d_red):
    """Top-d_red eigenvectors of the (uncentered) corpus second-moment
    matrix. Uncentered: inner-product search cares about the raw score
    q.x = q.P P^T x + residual; centering would shift scores."""
    cf = corpus.astype(jnp.float32)
    cov = jnp.einsum("nd,ne->de", cf, cf, preferred_element_type=jnp.float32)
    w, v = jnp.linalg.eigh(cov)  # ascending
    return v[:, -d_red:]  # [D, d_red]


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    corpus, queries = jax.jit(make_data)(jax.random.key(0))
    jax.block_until_ready(corpus)

    from rankpo_tpu.ops.topk import exact_topk_blockmax

    def oracle_topk(q, c):
        s = jnp.einsum(
            "qd,nd->qn", q.astype(jnp.float32), c.astype(jnp.float32),
            preferred_element_type=jnp.float32, precision="float32",
        )
        return exact_topk_blockmax(s, K)[1]

    oracle = np.asarray(jax.jit(oracle_topk)(queries, corpus))
    print("  oracle ready", flush=True)

    # single-stage approx baseline (current serving mode)
    def approx_base(q, c):
        s = jnp.einsum("qd,nd->qn", q, c, preferred_element_type=jnp.bfloat16)
        ts, i = jax.lax.approx_max_k(
            s, K, recall_target=RT, aggregate_to_topk=True
        )
        return ts.astype(jnp.float32), i

    def two_stage(q, c, c_low, proj, n_cand):
        q_low = (q @ proj.astype(q.dtype))
        s1 = jnp.einsum(
            "qd,nd->qn", q_low, c_low, preferred_element_type=jnp.bfloat16
        )
        _, cand = jax.lax.approx_max_k(
            s1, n_cand, recall_target=RT, aggregate_to_topk=True
        )
        rows = jnp.take(c, cand, axis=0)  # [Q, C, D]
        s2 = jnp.einsum(
            "qd,qcd->qc", q, rows, preferred_element_type=jnp.float32
        )
        ts, pos = jax.lax.top_k(s2, K)
        return ts, jnp.take_along_axis(cand, pos, axis=1)

    REPS = 4

    def bench(fn, args, label):
        def loop(*a):
            def body(i, carry):
                s, _ = fn(*a)
                return carry + s[0, 0].astype(jnp.float32) * 1e-20
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        loop_fn = jax.jit(loop)
        float(loop_fn(*args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(loop_fn(*args))
            best = min(best, (time.perf_counter() - t0) / REPS)
        idx = np.asarray(jax.jit(fn)(*args)[1])
        recall = np.mean([
            len(set(idx[r]) & set(oracle[r])) / K for r in range(Q)
        ])
        print(
            f"  {label:28} {best*1e3:7.1f} ms -> {Q/best:7.0f} QPS  "
            f"recall={recall:.4f}",
            flush=True,
        )

    bench(approx_base, (queries, corpus), "approx bf16 (baseline)")

    for d_red in _args.dims:
        proj = jax.jit(pca_projection, static_argnums=1)(corpus, d_red)
        c_low = jax.jit(
            lambda c, p: (c.astype(jnp.float32) @ p).astype(jnp.bfloat16)
        )(corpus, proj)
        jax.block_until_ready(c_low)
        for n_cand in _args.cands:
            bench(
                jax.jit(functools.partial(two_stage, n_cand=n_cand)),
                (queries, corpus, c_low, proj),
                f"pca d'={d_red} C={n_cand}",
            )


if __name__ == "__main__":
    main()
