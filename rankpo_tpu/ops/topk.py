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

NEG_INF = float("-inf")  # plain python: a module-level jnp scalar would initialize
# the XLA backend at import time, breaking jax.distributed.initialize in CLIs

# below this score-matrix footprint (bytes) the dense path wins: one big MXU
# matmul + a single top_k beats the sequential block scan (profiled on v5e:
# dense 14.5ms vs scan 26ms for [256, 100k]); above it, stream blocks.
# 4 GB (not 2): at [1024 x 1M] the single dense pass (one blockmax, no merge)
# measured 76.1 ms vs 93.4 ms for 2 x 500k chunks; 8 GB gains nothing more
# and risks OOM next to an fp32-resident corpus on a 16 GB chip.
DENSE_SCORE_BUDGET = 1 << 32  # 4 GB

# slack kept free next to the corpus when auto-shrinking the budget
# (queries, outputs, merge temps)
_BUDGET_SLACK = 256 << 20


def _tpu_hbm_bytes() -> int:
    """Per-chip HBM capacity; memory_stats when the backend exposes it
    (the axon tunnel may not), 15.75 GB v5e fallback (the capacity XLA's
    own OOM report states for a 16 GB chip)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return int(stats.get("bytes_limit") or (63 << 28))
    except Exception:
        return 63 << 28


def _auto_score_budget(corpus_bytes: int) -> int:
    """Shrink the per-chunk score budget when a big resident corpus makes
    the default plan OOM-certain. The engine's true per-chunk HBM peak is
    ~3x the fp32 score chunk (measured 2M-fp32 OOM dump: the dot fusion,
    a transposed where-select copy, and the blockmax reshape copy each
    materialize [Q, chunk] fp32), so a 2M x d1024 fp32 corpus (8 GB) with
    4 GB chunks asks for ~20 GB on a 16 GB chip. Only engage when even
    corpus + 2 chunks cannot fit — the measured-good 1M single-dense-pass
    plan (4 GB corpus + 4 GB scores, 76.1 ms) must stay untouched."""
    budget = DENSE_SCORE_BUDGET
    if jax.default_backend() != "tpu":
        return budget
    hbm = _tpu_hbm_bytes()
    if corpus_bytes + 2 * budget + _BUDGET_SLACK > hbm:
        budget = max((hbm - corpus_bytes - _BUDGET_SLACK) // 3, 256 << 20)
    return budget

# two-pass exact top-k (block-max prefilter): the candidate pool keeps
# k + slack blocks so benign near-boundary ties stay on the fast path (mass
# ties are caught by the exactness check and fall back)
BLOCKMAX_SLACK = 16

# two-LEVEL block selection above this many blocks: the [Q, B]-wide
# lax.top_k that picks candidate blocks stops being cheap at B ~ 31k
# (measured 39 ms of the 98 ms 1M-key exact dispatch), so select
# top-(k+slack) SUPERBLOCKS of HIER_GROUP blocks first ([Q, ~1k]-wide sort),
# then blocks within them ([Q, ~3.7k]-wide). Measured v5e full fp32-exact
# search [1024, 1M, d1024] k=100: 100.9 -> 96.5 ms (1.046x), bit-exact; at
# [4096, 100k] two-level LOSES (0.86x select-only: the extra block-maxima
# gather outweighs the small sort it replaces), hence the gate
# (benchmarks/hier_blockmax_probe.py, benchmarks/hier_full_search_ab.py).
HIER_GROUP = 32
HIER_MIN_BLOCKS = 8192


def _pick_block(n: int, c: int) -> int:
    """Block = 32, always — the sqrt(n/c) cost model this used in rounds 1-2
    ("blockmax top_k ~B=n/block, candidate sort ~c*block, balance them") is
    WRONG at large n: the block-max custom TopK over [Q, B] is not linear in
    B, so shrinking B by doubling the block buys nothing while the wider
    candidate sort and the lane-padded [Q, B, block] reshape copy (block < 128
    pads to 128 lanes) cost plenty. Measured on real v5e, engine e2e:

      [4096, 100k] k=100:  block 32 = 48ms, 64 = 62, 128 = 90 (round 2)
      [1024, 500k] k=100:  block 32 = 54.4ms, 64 = 70.0, 128 = 72.0, 256 = 92.3
      [1024, 1M]   k=10:   block 32 = 84.0ms, 64 = 106.9
      [1024, 1M]   k=100:  block 32 = 98.2ms (10.4k QPS), 64 = 115.3 (8.9k)
      [1024, 1M]   k=1000: block 32 = 192.3ms, 64 fails to compile (HBM)

    32 wins every profiled config; the old rule returned 64 exactly where it
    hurt most (n/c >= 4096, i.e. the 0.5-1M corpora). 16 is worse again
    (1M k=100: 107.0ms) — gather slices fall under 128 bytes."""
    del n, c
    return 32


def exact_topk_blockmax(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over [Q, N] fp32 scores without sorting all N columns.

    The full sort is what makes exact brute-force search slow on TPU (profiled
    v5e, [1024, 100k] k=100: matmul 4.9ms vs matmul+lax.top_k 37ms — see
    ops/topk_pallas.py's decision record). Two passes fix it:

      1. block maxes M[Q, N/block] (one cheap VPU reduction over the scores);
         top-(k+slack) blocks by max. Every block containing a true top-k
         element has max >= the k-th value, and at most k blocks can (one per
         element), so the selected blocks cover the true top-k.
      2. gather the selected blocks' columns (ascending global index) and
         lax.top_k over the ~(k+slack)*block candidates instead of N.

    Block size is fixed at 32 (the measured optimum at every profiled shape —
    decision record in _pick_block); at [4096, 100k] k=100 this is 48ms vs
    141ms for the plain full sort (2.9x), on top of the score matmul. Above
    HIER_MIN_BLOCKS blocks the block selection itself goes two-level
    (superblocks of HIER_GROUP blocks first — decision record at the
    constants; 1.046x full-search at [1024, 1M], bit-exact).

    Exactness under ties is VERIFIED, not assumed: with theta = the k-th
    candidate score, the result is exact iff every block with max >= theta was
    selected (an unselected one could hold a tied element with a lower global
    index, which FAISS tie order must prefer). On mismatch — only mass
    duplicate scores can cause it — fall back to the full sort via lax.cond.
    Candidate columns are laid out in ascending global-index order and
    lax.top_k breaks ties by earliest position, so FAISS's lowest-index tie
    rule (reference src/utils.py:58-80) is preserved bit-exactly.
    """
    q, n = scores.shape
    c = k + BLOCKMAX_SLACK
    block = _pick_block(n, c)
    b_full = n // block
    c = min(b_full, c)
    # not enough blocks for the prefilter to pay for itself
    if b_full < 32 or c * block * 2 >= n:
        return jax.lax.top_k(scores, k)
    tail = n - b_full * block

    main = scores[:, : b_full * block].reshape(q, b_full, block)
    m = jnp.max(main, axis=-1)  # [Q, B]

    if b_full >= HIER_MIN_BLOCKS and 2 * c <= b_full // HIER_GROUP:
        # Two-level selection (decision record at HIER_MIN_BLOCKS). Coverage
        # argument recurses: every superblock holding a true top-k column has
        # max >= theta_k and at most k can, so the top-(k+slack) superblocks
        # cover the top-k; blocks are then selected only within them. The
        # exactness check extends to both levels below.
        s_full = -(-b_full // HIER_GROUP)
        pad = s_full * HIER_GROUP - b_full
        m3 = jnp.pad(
            m, ((0, 0), (0, pad)), constant_values=NEG_INF
        ).reshape(q, s_full, HIER_GROUP)
        sm = jnp.max(m3, axis=-1)  # [Q, S] superblock maxima
        sv, si = jax.lax.top_k(sm, c)
        si_sorted = jnp.sort(si, axis=1)
        m_sel = jax.vmap(lambda g, idx: jnp.take(g, idx, axis=0))(
            m3, si_sorted
        ).reshape(q, c * HIER_GROUP)
        bid = (
            si_sorted[:, :, None] * HIER_GROUP
            + jnp.arange(HIER_GROUP, dtype=jnp.int32)[None, None, :]
        ).reshape(q, c * HIER_GROUP)
        bv, bpos = jax.lax.top_k(m_sel, c)
        bi_sorted = jnp.sort(jnp.take_along_axis(bid, bpos, axis=1), axis=1)
        # -inf padding block ids (>= b_full) can only win in degenerate
        # all--inf cases where theta = -inf; clamp for the gather — the
        # exactness check then necessarily fails and the full sort runs
        bi_sorted = jnp.minimum(bi_sorted, b_full - 1)

        def _exact(theta):
            return jnp.all(
                (jnp.sum(sm >= theta, axis=1) == jnp.sum(sv >= theta, axis=1))
                & (
                    jnp.sum(m_sel >= theta, axis=1)
                    == jnp.sum(bv >= theta, axis=1)
                )
            )

    else:
        bm, bi = jax.lax.top_k(m, c)
        bi_sorted = jnp.sort(bi, axis=1)  # ascending block index: FAISS tie order

        def _exact(theta):
            return jnp.all(
                jnp.sum(m >= theta, axis=1) == jnp.sum(bm >= theta, axis=1)
            )
    # gather whole blocks (contiguous 32-col slices = 128-byte fp32 minor
    # dim, the gather-efficiency floor — see _pick_block)
    cand = jax.vmap(lambda s3, idx: jnp.take(s3, idx, axis=0))(
        main, bi_sorted
    ).reshape(q, c * block)
    cols = (
        bi_sorted[:, :, None] * block
        + jnp.arange(block, dtype=jnp.int32)[None, None, :]
    ).reshape(q, c * block)
    if tail:
        # the ragged tail (< 1 block) is always a candidate; its indices are
        # the largest, so appending keeps ascending order
        cand = jnp.concatenate([cand, scores[:, b_full * block :]], axis=1)
        tail_cols = jnp.broadcast_to(
            jnp.arange(b_full * block, n, dtype=jnp.int32)[None, :], (q, tail)
        )
        cols = jnp.concatenate([cols, tail_cols], axis=1)

    top_scores, pos = jax.lax.top_k(cand, k)
    top_idx = jnp.take_along_axis(cols, pos, axis=1)

    theta = top_scores[:, k - 1 : k]  # [Q, 1] k-th candidate score
    exact = _exact(theta)
    return jax.lax.cond(
        exact,
        lambda _: (top_scores, top_idx),
        lambda s: tuple(jax.lax.top_k(s, k)),
        scores,
    )


def storage_exact_precision(dtype):
    """Matmul precision for fp32-faithful scores over rows stored in
    ``dtype`` — the rerank stage of the two-stage indexes (refine/ivf),
    whose contract is "true inner products at storage precision". For fp32
    storage the TPU DEFAULT einsum would round inputs to bf16 (CLAUDE.md);
    X3 restores fp32-class scores at half the passes of "float32"=X6 (the
    dense_matmul_topk decision record below). bf16 storage is already
    rounded, so the single default pass IS storage precision."""
    if jnp.dtype(dtype) != jnp.float32:
        return "default"
    if jax.default_backend() == "tpu":
        return jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3
    return "float32"


def dense_matmul_topk(
    queries: jax.Array,
    corpus: jax.Array,
    *,
    k: int,
    n_valid: int | jax.Array | None = None,
    index_offset: int | jax.Array = 0,
    recall_target: float = 1.0,
    col_scale: jax.Array | None = None,
    precision: str | None = None,
    int8_mxu: bool | None = None,
    row_mask: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Full [Q, N] score matrix + top_k. Fastest when it fits HBM.

    ``recall_target < 1.0`` switches to the TPU-native PartialReduce path
    (``lax.approx_max_k``); exact mode keeps FAISS tie semantics via the
    two-pass blockmax selection.

    ``precision``: matmul precision. None means fp32-faithful for exact
    mode (TPU: bf16x3 — see the decision record at the default below; CPU:
    native fp32) and "default" (single bf16 pass) for the approx serving
    mode — on TPU the DEFAULT einsum rounds fp32 inputs to bf16 for the
    MXU, which perturbs near-tie score ORDER vs the fp32 reference (FAISS
    computes fp32). Measured v5e engine e2e [4096, 100k, d1024] k=100:
    default 46.1ms (2068/6400 oracle mismatches), X3 52.1ms (14/6400
    near-ties, 2e-6), "float32"=X6 65.7ms (0/6400, 8e-8).

    ``int8_mxu``: for int8 storage, quantize the QUERIES per-row too and
    issue a TRUE int8 x int8 -> int32 einsum (2x bf16 MXU peak on v5e)
    instead of fusing a dequant into a bf16 matmul. A per-query scale
    multiplies its whole score row uniformly, so top-k ORDER only needs
    the per-corpus-row ``col_scale`` applied before selection; the final
    scores are rescaled by q_scale after. None = auto (on for int8 storage
    on TPU). Measured v5e [1024, 1M, d1024] k=100
    (benchmarks/int8_mxu_probe.py): exact 29.3 -> 25.5 ms (recall 0.9885
    -> 0.9842 — query quantization costs ~0.4% on top of the storage
    trade), approx r0.95 12.6 ms = 81k QPS (the dequant path measured no
    bf16-score gain; int8-MXU removes the dequant entirely).

    ``row_mask``: optional bool [N] aligned with corpus rows; rows where
    False score -inf before selection (the FAISS IDSelector analog — one
    where-select on the score matrix, exactly like the ``n_valid`` pad
    mask it composes with)."""
    n = corpus.shape[0]
    k = min(k, n)
    quantized = corpus.dtype == jnp.int8
    if int8_mxu is None:
        int8_mxu = quantized and jax.default_backend() == "tpu"
    int8_mxu = int8_mxu and quantized
    if int8_mxu:
        return _dense_matmul_topk_int8(
            queries, corpus, k=k, n_valid=n_valid,
            index_offset=index_offset, recall_target=recall_target,
            col_scale=col_scale, row_mask=row_mask,
        )
    if quantized:
        # symmetric per-row quantized storage: dequant fuses into the matmul
        corpus = corpus.astype(queries.dtype)
    if precision is None:
        if recall_target >= 1.0:
            # fp32-faithful scores for FAISS parity. On TPU the string
            # "float32" lowers to SIX bf16 passes (measured identical to
            # BF16_BF16_F32_X6: 65.7 vs 66.1 ms at [4096, 100k, d1024]);
            # X3 halves the MXU passes — 52.1 ms (+26% engine QPS) with
            # near-tie divergence 14/6400 indices at max 2e-6 score error,
            # 10x inside the documented near-tie gate
            # (benchmarks/dot_algorithm_engine_probe.py). On CPU "float32"
            # is native fp32 — bit-exact vs the numpy oracle, which the
            # test suite asserts. Callers wanting X6 on TPU pass
            # precision="float32" explicitly.
            if jax.default_backend() == "tpu":
                precision = jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3
            else:
                precision = "float32"
        else:
            precision = "default"
    if queries.dtype != jnp.float32 or corpus.dtype != jnp.float32:
        precision = "default"  # bf16/int8 storage: inputs are already rounded
    # approx mode: materialize the score matrix in bf16 — the approx_max_k
    # scan is HBM-bound and the default-precision matmul's products are
    # bf16-rounded anyway. Measured v5e [1024, 1M, d1024] k=100 r0.95:
    # 18.9 -> 13.1 ms (1.45x), recall 0.9752 -> 0.9709 (still >= target;
    # benchmarks/bf16_scores_probe.py). int8 storage measured NO gain (the
    # int8->bf16 dequant dominates, cf. the wq_probe finding) and the
    # col_scale multiply is better in fp32, so it keeps fp32 scores.
    acc_dtype = (
        jnp.bfloat16 if recall_target < 1.0 and not quantized else jnp.float32
    )
    scores = jnp.einsum(
        "qd,nd->qn",
        queries,
        corpus,
        preferred_element_type=acc_dtype,
        precision=precision,
    )
    if col_scale is not None:
        scores = scores * col_scale[None, :].astype(acc_dtype)
    if n_valid is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
        scores = jnp.where(col < n_valid, scores, jnp.asarray(NEG_INF, acc_dtype))
    if row_mask is not None:
        scores = jnp.where(
            row_mask[None, :], scores, jnp.asarray(NEG_INF, acc_dtype)
        )
    if recall_target < 1.0:
        top_scores, idx = jax.lax.approx_max_k(
            scores, k, recall_target=recall_target, aggregate_to_topk=True
        )
        top_scores = top_scores.astype(jnp.float32)
    else:
        top_scores, idx = exact_topk_blockmax(scores, k)
    return top_scores, idx + jnp.int32(index_offset)


def _dense_matmul_topk_int8(
    queries: jax.Array,
    corpus: jax.Array,
    *,
    k: int,
    n_valid: int | jax.Array | None,
    index_offset: int | jax.Array,
    recall_target: float,
    col_scale: jax.Array | None,
    row_mask: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """True int8 x int8 -> int32 search over int8 storage (see the
    ``int8_mxu`` decision record on ``dense_matmul_topk``). Scores are
    ``q_scale * col_scale * (q8 . c8)`` — the same symmetric-quantization
    contract as the dequant path, with the query now quantized too."""
    qf = queries.astype(jnp.float32)
    q_scale = jnp.maximum(jnp.max(jnp.abs(qf), axis=1), 1e-12) / 127.0
    q8 = jnp.clip(
        jnp.round(qf / q_scale[:, None]), -127, 127
    ).astype(jnp.int8)
    s32 = jnp.einsum("qd,nd->qn", q8, corpus, preferred_element_type=jnp.int32)
    scores = s32.astype(jnp.float32)
    if col_scale is not None:
        scores = scores * col_scale[None, :]
    if n_valid is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
        scores = jnp.where(col < n_valid, scores, NEG_INF)
    if row_mask is not None:
        scores = jnp.where(row_mask[None, :], scores, NEG_INF)
    if recall_target < 1.0:
        top_scores, idx = jax.lax.approx_max_k(
            scores, k, recall_target=recall_target, aggregate_to_topk=True
        )
    else:
        top_scores, idx = exact_topk_blockmax(scores, k)
    return top_scores * q_scale[:, None], idx + jnp.int32(index_offset)


def matmul_topk(
    queries: jax.Array,
    corpus: jax.Array,
    *,
    k: int,
    n_valid: int | jax.Array | None = None,
    index_offset: int | jax.Array = 0,
    block_size: int = 4096,
    allow_dense: bool = True,
    recall_target: float = 1.0,
    col_scale: jax.Array | None = None,
    precision: str | None = None,
    int8_mxu: bool | None = None,
    score_budget: int | None = None,
    row_mask: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """queries [Q, D], corpus [N, D] -> (scores [Q, k] fp32, indices [Q, k] int32).

    ``n_valid``: number of real corpus rows (rows >= n_valid are padding and
    score -inf). ``index_offset``: added to returned indices (shard offset).
    ``row_mask``: optional bool [N] eligibility mask (IDSelector analog,
    see ``dense_matmul_topk``).
    ``score_budget``: per-chunk fp32 score-matrix byte cap (None = the 4 GB
    default, auto-shrunk on TPU when the resident corpus makes that plan
    OOM-certain — see ``_auto_score_budget``).
    The engine deliberately stays on XLA — a fused Pallas kernel was profiled
    and rejected (decision record: rankpo_tpu/ops/topk_pallas.py).
    """
    n, d = corpus.shape
    q = queries.shape[0]
    k = min(k, n)
    if score_budget is None:
        score_budget = _auto_score_budget(n * d * corpus.dtype.itemsize)

    # dense fast path when the score matrix fits the budget
    if allow_dense and q * n * 4 <= score_budget:
        return dense_matmul_topk(
            queries, corpus, k=k, n_valid=n_valid, index_offset=index_offset,
            recall_target=recall_target, col_scale=col_scale,
            precision=precision, int8_mxu=int8_mxu, row_mask=row_mask,
        )

    # beyond the budget: python-unrolled loop over budget-sized column CHUNKS,
    # each handled by the dense kernel, merged pairwise. Unrolling (vs
    # lax.scan) matters: at [1024 q, 1M n] the scan paid ~245 tiny iterations
    # of loop+merge overhead (~1k QPS on v5e); two unrolled dense chunks keep
    # the MXU busy. Compile time stays bounded (few chunks by construction).
    chunk = max(
        min(block_size, n),
        min(n, score_budget // max(4 * q, 1)),
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
        # serialize chunks: without a data dependency XLA schedules the
        # next chunk's [Q, chunk] fp32 dot+select temps while this chunk's
        # are still alive (measured 2M-fp32 OOM: three chunk temps resident
        # at once, 10.4 GB next to an 8 GB corpus). The isfinite guard makes
        # the term exactly 0.0 even against the -inf sentinel, while the
        # data dependency survives (XLA cannot fold a float select on
        # runtime data); float x*0.0 is never folded either (NaN semantics).
        dep = best_scores[:, :1]
        dep = jnp.where(jnp.isfinite(dep), dep * 0.0, 0.0)
        chained_queries = queries + dep.astype(queries.dtype)
        blk_scores, blk_idx = dense_matmul_topk(
            chained_queries,
            blk,
            k=min(k, hi - lo),
            n_valid=n_valid_local,
            index_offset=lo,
            recall_target=recall_target,
            col_scale=None if col_scale is None else col_scale[lo:hi],
            precision=precision,
            int8_mxu=int8_mxu,
            row_mask=None if row_mask is None else row_mask[lo:hi],
        )
        # chunks ascend in index; (previous best, current chunk) concat order
        # preserves lowest-index-first tie-breaking
        cat_scores = jnp.concatenate([best_scores, blk_scores], axis=1)
        cat_idx = jnp.concatenate([best_idx, blk_idx], axis=1)
        best_scores, pos = jax.lax.top_k(cat_scores, k)
        best_idx = jnp.take_along_axis(cat_idx, pos, axis=1)
    return best_scores, best_idx + jnp.int32(index_offset)
