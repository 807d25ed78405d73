"""Streaming fused matmul + running top-k.

The compute core of the FlatIP index (replaces FAISS's C++ scan loops,
reference src/utils.py:58-80): corpus blocks stream through the score matmul
and a running top-k merge, so the full [Q, N] score matrix never exists in
HBM — peak memory is O(Q·(k + block)). Expressed with ``lax.scan`` so XLA
pipelines block matmuls on the MXU; a Pallas kernel can replace the body
without changing the contract.

Contract (FAISS parity): fp32 scores, descending; ties broken by LOWEST global
index. The merge keeps candidates ordered (previous best, then current block in
ascending index), and ``lax.top_k``'s earliest-position tie-break preserves the
invariant inductively.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)

# below this score-matrix footprint (bytes) the dense path wins: one big MXU
# matmul + a single top_k beats the sequential block scan (profiled on v5e:
# dense 14.5ms vs scan 26ms for [256, 100k]); above it, stream blocks.
DENSE_SCORE_BUDGET = 1 << 31  # 2 GB


def dense_matmul_topk(
    queries: jax.Array,
    corpus: jax.Array,
    *,
    k: int,
    n_valid: int | jax.Array | None = None,
    index_offset: int | jax.Array = 0,
    recall_target: float = 1.0,
    col_scale: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Full [Q, N] score matrix + top_k. Fastest when it fits HBM.

    ``recall_target < 1.0`` switches to the TPU-native PartialReduce path
    (``lax.approx_max_k``) — profiled on v5e at [1024, 100k] k=100:
    exact 37ms, recall 0.99 → 14ms, recall 0.95 → 4.5ms (matmul-bound).
    Exact mode keeps FAISS tie semantics; approx mode is for serving."""
    n = corpus.shape[0]
    k = min(k, n)
    if corpus.dtype == jnp.int8:
        # symmetric per-row quantized storage: dequant fuses into the matmul
        corpus = corpus.astype(queries.dtype)
    scores = jnp.einsum(
        "qd,nd->qn", queries, corpus, preferred_element_type=jnp.float32
    )
    if col_scale is not None:
        scores = scores * col_scale[None, :]
    if n_valid is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
        scores = jnp.where(col < n_valid, scores, NEG_INF)
    if recall_target < 1.0:
        top_scores, idx = jax.lax.approx_max_k(
            scores, k, recall_target=recall_target, aggregate_to_topk=True
        )
    else:
        top_scores, idx = jax.lax.top_k(scores, k)
    return top_scores, idx + jnp.int32(index_offset)


def matmul_topk(
    queries: jax.Array,
    corpus: jax.Array,
    *,
    k: int,
    n_valid: int | jax.Array | None = None,
    index_offset: int | jax.Array = 0,
    block_size: int = 4096,
    use_pallas: bool = False,
    vary_axes: tuple = (),
    allow_dense: bool = True,
    recall_target: float = 1.0,
    col_scale: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """queries [Q, D], corpus [N, D] -> (scores [Q, k] fp32, indices [Q, k] int32).

    ``n_valid``: number of real corpus rows (rows >= n_valid are padding and
    score -inf). ``index_offset``: added to returned indices (shard offset).
    ``use_pallas`` selects the fused TPU kernel when shapes permit; the scan
    path below is the portable fallback and correctness oracle.
    """
    if use_pallas:
        from rankpo_tpu.ops.topk_pallas import pallas_matmul_topk, pallas_supported

        if pallas_supported(queries.shape, corpus.shape, k):
            return pallas_matmul_topk(
                queries,
                corpus,
                k=k,
                n_valid=n_valid,
                index_offset=index_offset,
            )

    n, d = corpus.shape
    q = queries.shape[0]
    k = min(k, n)

    # dense fast path when the score matrix fits the budget
    if allow_dense and q * n * 4 <= DENSE_SCORE_BUDGET:
        return dense_matmul_topk(
            queries, corpus, k=k, n_valid=n_valid, index_offset=index_offset,
            recall_target=recall_target, col_scale=col_scale,
        )

    # beyond the budget: python-unrolled loop over budget-sized column CHUNKS,
    # each handled by the dense kernel, merged pairwise. Unrolling (vs
    # lax.scan) matters: at [1024 q, 1M n] the scan paid ~245 tiny iterations
    # of loop+merge overhead (~1k QPS on v5e); two unrolled dense chunks keep
    # the MXU busy. Compile time stays bounded (few chunks by construction).
    chunk = max(
        min(block_size, n),
        min(n, DENSE_SCORE_BUDGET // max(4 * q, 1)),
    )
    if n_valid is None:
        n_valid = n

    best_scores = jnp.full((q, k), NEG_INF, jnp.float32)
    # sentinel index: large (real ties win the lowest-index rule) but safe
    # against overflow when a shard offset is added
    best_idx = jnp.full((q, k), jnp.int32(2**30), jnp.int32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        blk = corpus[lo:hi]  # static slice: lo/hi are python ints
        n_valid_local = jnp.clip(n_valid - lo, 0, hi - lo)
        blk_scores, blk_idx = dense_matmul_topk(
            queries,
            blk,
            k=min(k, hi - lo),
            n_valid=n_valid_local,
            index_offset=lo,
            recall_target=recall_target,
            col_scale=None if col_scale is None else col_scale[lo:hi],
        )
        # chunks ascend in index; (previous best, current chunk) concat order
        # preserves lowest-index-first tie-breaking
        cat_scores = jnp.concatenate([best_scores, blk_scores], axis=1)
        cat_idx = jnp.concatenate([best_idx, blk_idx], axis=1)
        best_scores, pos = jax.lax.top_k(cat_scores, k)
        best_idx = jnp.take_along_axis(cat_idx, pos, axis=1)
    return best_scores, best_idx + jnp.int32(index_offset)
