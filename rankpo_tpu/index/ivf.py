"""Inverted-file (clustered) approximate inner-product index.

TPU-native analog of FAISS ``IndexIVFFlat`` with ``METRIC_INNER_PRODUCT``
(the reference only ever builds the brute-force ``IndexFlatIP``,
src/utils.py:38-56 — like ``RefineIPIndex`` this is a designed upgrade path,
here for the multi-million-row regime where even a PCA-reduced full scan's
O(N) FLOPs dominate serving cost).

TPU-first design decisions (vs FAISS's CPU layout):

- **k-means is MXU work.** Both Lloyd phases are batched matmuls: assignment
  is a ``[rows, D] @ [D, K]`` scores matmul + argmax, and the centroid
  update is a one-hot ``[rows, K+1] @ [rows, D]`` segment-sum matmul —
  no scatters, no host loop. Rows stream through a ``lax.fori_loop`` in
  fixed-size chunks so the score matrix never exceeds a VMEM-friendly
  budget, and the whole Lloyd loop is ONE jitted program (sharded corpora
  psum their partial sums across the data axis each iteration).
- **Fixed-capacity cluster storage.** FAISS keeps ragged per-cluster lists;
  ragged is hostile to XLA's static shapes. Rows are laid out cluster-major
  as ``[K * capacity, D]`` with ``capacity = ceil(N/K * slack)`` and
  ``row_ids == -1`` marking empty slots (masked to -inf at search). Rows
  are placed by a vectorized greedy pass over each row's top-2 nearest
  clusters; rows that find both full spill to any cluster with space —
  the nprobe auto-tuner measures recall on the ACTUAL layout, so spill
  cost is priced in, not assumed away.
- **Clusters shard over the data axis.** Each shard owns ``K/W`` whole
  clusters (centroids AND their row blocks), probes its own top-``nprobe``
  local clusters, and the per-shard winners concat-merge exactly like
  ``FlatIPIndex`` — probing never gathers across shards. At fixed nprobe
  the sharded index probes W× more clusters than the unsharded one
  (recall >= unsharded); the tuner runs on the final sharded config, so
  the tuned nprobe self-corrects downward.
- **Search = tiny matmul + gather + rerank.** Stage 0 scores queries
  against the local centroids (``[Q, K/W]``, negligible), gathers the
  probed clusters' row blocks (``[Q, nprobe, capacity, D]`` contiguous
  D-wide slices), and reranks them exactly in fp32 accumulation — scores
  of returned hits are true inner products at storage precision.

Contract: approximate — the hit SET may miss true neighbors (probing is
lossy; ``recall_target`` tunes nprobe at build time against a storage-
precision exact search on a held-out sample), returned scores are exact at
storage precision (``pq_m``: ADC-style approximations against the
reconstructed rows), tie order is not FAISS-bit-exact, and — exactly like
FAISS IVF — a query whose probed clusters hold fewer than k rows pads the
tail with index -1 / score -inf. Callers needing exact semantics use
``FlatIPIndex``.
"""

from __future__ import annotations

import functools
import logging
import math
import threading
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rankpo_tpu.core.mesh import DATA_AXIS, replicate_to_mesh, shard_rows_to_mesh

logger = logging.getLogger(__name__)

NEG_INF = float("-inf")  # plain python at module scope (CLAUDE.md: a jnp
# scalar here would initialize the XLA backend at import time)

TUNE_SAMPLE = 256
TUNE_K = 100
# pq_layout='auto' switches to the transposed 'cols' codes above this many
# PADDED row-layout bytes (n_total * ceil(m/128)*128). Measured on v5e
# (benchmarks/pq_decode_probe.py, 1.5M slots m=64): with the via_transpose
# orientation the cols ADC kernel matches rows (33.9 vs 32.1 ms @ Q=256,
# WINS at Q=64: 13.8 vs 13.9) at HALF the resident bytes and zero relayout
# copy — but the rows small-probe take-reconstruct path is still ~2x
# faster at Q=8 (0.9 vs ~1.9 ms), so latency-sensitive small tiers keep
# rows. At multi-GB the rows padding dominates outright (15.5 GB copy for
# 8.3 GB of codes at 100M x m=64 — compile OOM; only 'cols' runs at all).
_COLS_AUTO_BYTES = 4 << 30
# row-chunk budget for the streamed k-means matmuls: chunk*K score elements
_CHUNK_BUDGET = 1 << 22
# device-byte ceiling for one search dispatch's probed-row gather (+ fp32
# rerank temps); search() shrinks the query batch to stay under it. 4 GB
# leaves the rest of a 16 GB v5e for the index storage itself.
_GATHER_BUDGET = 4 << 30


def _resolve_clusters(n_total: int, n_shards: int, requested) -> int:
    """Cluster count: FAISS's ~4*sqrt(N) rule of thumb, rounded UP to a
    multiple of the shard count so every shard owns whole clusters."""
    if requested == "auto":
        k = max(1, int(round(4.0 * math.sqrt(max(n_total, 1)))))
        k = min(k, max(n_total, 1))
    else:
        k = int(requested)
        if k < 1:
            raise ValueError("n_clusters must be >= 1")
    k = max(k, n_shards)
    k = -(-k // n_shards) * n_shards
    return k


def _resolve_capacity(n_total: int, k: int, slack: float,
                      multiple: int = 8) -> int:
    """Per-cluster slot count: mean fill x slack, rounded up to
    ``multiple`` (8 = the sublane rule; PQ indexes pass 64 so the fused
    ADC kernel always has a legal capacity tiling,
    ops/pq_adc_pallas._cap_block); total slots always cover the corpus."""
    cap = -(-max(n_total, 1) * slack // k)
    cap = max(int(cap), -(-max(n_total, 1) // k))
    return max(multiple, -(-int(cap) // multiple) * multiple)


def _chunk_rows(rows: int, k: int) -> int:
    """Static row-chunk size for the streamed assignment/update matmuls."""
    c = max(128, (_CHUNK_BUDGET // max(k + 1, 1)) // 8 * 8)
    return min(rows, c)


def _lloyd_body(corpus_local, centroids, n_valid_local, *, n_iters, chunk,
                axis_name, spherical, balance_eta=0.0, split_r=0):
    """The full Lloyd loop for one shard's rows (or the whole corpus when
    unsharded). ``corpus_local`` is padded to a multiple of ``chunk``;
    rows at local index >= n_valid_local (zero padding) are masked into a
    dump segment. Empty clusters keep their previous centroid (FAISS
    instead splits the largest; frozen centroids are simpler and the
    capacity slack + tuner absorb the difference).

    ``balance_eta > 0`` enables BALANCED k-means via a per-cluster
    assignment bias (the aux-loss-free load-balancing trick MoE routers
    use): rows assign to ``argmax(score - bias)`` and after every
    iteration ``bias += eta * tanh(count/target - 1)`` — persistently
    over-full clusters price themselves up until the fixed per-cluster
    CAPACITY (which Zipf-skewed cluster sizes otherwise overflow,
    scattering rows beyond any probe's reach — the measured 10M recall
    gap, docs/BENCHMARKS.md round 4) is respected by geometry instead of
    spill. The centroid update uses the biased assignment (centroids
    track the rows they will actually hold). Query-side PROBING ranks by
    the same biased metric (see ``_set_assign_bias``); the tuner measures
    the compound effect on the real layout. Returns ``(centroids, bias)``.

    ``split_r > 0`` enables centroid REDISTRIBUTION (the FAISS k-means
    empty-cluster policy generalized to overfull ones): each iteration
    except the last, up to ``split_r`` of the emptiest clusters donate
    their centroid slot to split the ``split_r`` fullest clusters
    (> 1.5x target only) — the overfull centroid is duplicated with a
    deterministic ±1% per-dim perturbation and the next Lloyd iterations
    separate the pair. Dense regions end up with proportionally more
    centroids, evening fills by GEOMETRY: rows stay in their nearest
    cluster and probing needs no bias — unlike ``balance_eta``, which
    (measured, 10M int8 decay-0.5) displaces boundary rows and costs
    probing recall at mild overflow."""
    k = centroids.shape[0]
    d = corpus_local.shape[1]
    n_chunks = corpus_local.shape[0] // chunk

    def one_iter(it, state):
        cents, bias = state
        cb = cents.astype(jnp.bfloat16)

        def chunk_body(ci, carry):
            sums, counts = carry
            rows = lax.dynamic_slice_in_dim(corpus_local, ci * chunk, chunk)
            rows_b = rows.astype(jnp.bfloat16)
            scores = jnp.einsum(
                "cd,kd->ck", rows_b, cb, preferred_element_type=jnp.float32
            )
            if balance_eta:
                scores = scores - bias[None, :]
            assign = jnp.argmax(scores, axis=1)
            ridx = ci * chunk + lax.iota(jnp.int32, chunk)
            assign = jnp.where(ridx < n_valid_local, assign, k)
            onehot = jax.nn.one_hot(assign, k + 1, dtype=jnp.bfloat16)
            sums = sums + jnp.einsum(
                "ck,cd->kd", onehot, rows_b,
                preferred_element_type=jnp.float32,
            )[:k]
            counts = counts + jnp.sum(
                onehot.astype(jnp.float32), axis=0
            )[:k]
            return sums, counts

        carry0 = (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32))
        if axis_name is not None:
            # under shard_map the carry becomes shard-varying in the body
            # (it accumulates from the varying corpus rows); the init must
            # match or the loop's carry types disagree
            carry0 = tuple(
                lax.pcast(x, (axis_name,), to="varying") for x in carry0
            )
        sums, counts = lax.fori_loop(0, n_chunks, chunk_body, carry0)
        if axis_name is not None:
            sums = lax.psum(sums, axis_name)
            counts = lax.psum(counts, axis_name)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        new = jnp.where((counts > 0.0)[:, None], new, cents)
        if spherical:
            norm = jnp.maximum(
                jnp.linalg.norm(new, axis=1, keepdims=True), 1e-12
            )
            new = new / norm
        if balance_eta:
            target = jnp.maximum(jnp.sum(counts) / k, 1.0)
            bias = bias + balance_eta * jnp.tanh(counts / target - 1.0)
        if split_r:
            target = jnp.maximum(jnp.sum(counts) / k, 1.0)
            recv = jnp.argsort(-counts)[:split_r]  # fullest clusters
            donor = jnp.argsort(counts)[:split_r]  # emptiest clusters
            should = (counts[recv] > 1.5 * target) & (it < n_iters - 1)
            sign = (
                1.0 - 2.0 * (lax.iota(jnp.int32, d) % 2)
            ).astype(jnp.float32)[None, :]
            recv_c = jnp.take(new, recv, axis=0)
            split_a = recv_c * (1.0 + 0.01 * sign)
            split_b = recv_c * (1.0 - 0.01 * sign)
            if spherical:
                split_a = split_a / jnp.maximum(
                    jnp.linalg.norm(split_a, axis=1, keepdims=True), 1e-12
                )
                split_b = split_b / jnp.maximum(
                    jnp.linalg.norm(split_b, axis=1, keepdims=True), 1e-12
                )
            new = new.at[donor].set(
                jnp.where(
                    should[:, None], split_a, jnp.take(new, donor, axis=0)
                )
            )
            new = new.at[recv].set(jnp.where(should[:, None], split_b, recv_c))
        return new, bias

    # bias is derived from PSUMMED counts, so like the centroids it stays
    # shard-invariant — no pcast on the outer carry (cf. chunk_body's)
    bias0 = jnp.zeros((k,), jnp.float32)
    return lax.fori_loop(0, n_iters, one_iter, (centroids, bias0))


# candidate clusters per row for the greedy fill. With only top-2, rows
# overflowing both choices spill to ARBITRARY free slots — unreachable by
# probing: measured 10M/int8/K8192/slack1.15 lost 15% recall purely to
# scattered spill (decode-oracle recall 0.844 while PQ builds at slack 1.3
# sat at 0.999). With 8 candidates the overflow cascades to the 3rd..8th
# NEAREST clusters, which the query's probe set still covers.
ASSIGN_CANDIDATES = 8


def _assign_top2_body(corpus_local, centroids, *, chunk, axis_name=None,
                      n_cand=2, bias=None):
    """Per-row top-``n_cand`` nearest centroids (global cluster ids),
    streamed in chunks. Rows beyond the valid range return garbage the host
    fill pass never reads. ``bias``: the balanced-k-means assignment bias
    (see ``_lloyd_body``) — placement candidates must rank by the SAME
    biased scores the training assignment used, or the balance evaporates
    at fill time."""
    k = centroids.shape[0]
    n_chunks = corpus_local.shape[0] // chunk
    cb = centroids.astype(jnp.bfloat16)
    take = min(n_cand, k)

    def body(ci, out):
        rows = lax.dynamic_slice_in_dim(corpus_local, ci * chunk, chunk)
        scores = jnp.einsum(
            "cd,kd->ck", rows.astype(jnp.bfloat16), cb,
            preferred_element_type=jnp.float32,
        )
        if bias is not None:
            scores = scores - bias[None, :]
        _, topc = lax.top_k(scores, take)
        if take < n_cand:  # tiny k: pad by repeating the last column
            topc = jnp.concatenate(
                [topc] + [topc[:, -1:]] * (n_cand - take), axis=1
            )
        return lax.dynamic_update_slice_in_dim(
            out, topc.astype(jnp.int32), ci * chunk, axis=0
        )

    out0 = jnp.zeros((corpus_local.shape[0], n_cand), jnp.int32)
    if axis_name is not None:
        out0 = lax.pcast(out0, (axis_name,), to="varying")
    return lax.fori_loop(0, n_chunks, body, out0)


def _pad_to_chunks(x, chunk):
    rows = x.shape[0]
    padded = -(-rows // chunk) * chunk
    if padded == rows:
        return x
    return jnp.pad(x, ((0, padded - rows), (0, 0)))


# ----------------------------------------------------------------------
# product quantization (residual PQ, FAISS IndexIVFPQ analog)

PQ_K = 256  # 8-bit codes (FAISS default); one uint8 per subvector

# OPQ alternations (Lloyd fit <-> Procrustes rotation update); FAISS
# OPQMatrix uses a similar fixed outer count — the objective plateaus fast
_OPQ_OUTER = 8


def _rotate_rows(x, rot):
    """Rows rotated by the orthogonal [D, D] ``rot`` (``x @ rot``), fp32:
    the default TPU matmul rounds to bf16 and the same rotation must
    reproduce bit-comparable geometry at train, encode, and query time."""
    return jnp.dot(
        x.astype(jnp.float32), rot,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
PQ_TRAIN_SAMPLE = 1 << 16  # residual rows the codebook Lloyd fits on


def _pq_lloyd_body(sample_sub, codebooks, n_valid, *, n_iters, chunk):
    """Euclidean Lloyd over all ``m`` subvector spaces AT ONCE — both
    phases are batched einsums on the MXU (assignment:
    ``argmin ||x-c||^2 == argmax x.c - ||c||^2/2``; update: one-hot
    segment-sum). ``sample_sub`` is [S, m, ds] fp32, padded to a multiple
    of ``chunk``; rows at index >= n_valid mask into a dump code. Empty
    codes keep their previous centroid (cf. ``_lloyd_body``)."""
    s_rows, m, ds = sample_sub.shape
    k = codebooks.shape[1]
    n_chunks = s_rows // chunk

    def one_iter(_, cb):
        cbb = cb.astype(jnp.bfloat16)
        half = 0.5 * jnp.sum(cb.astype(jnp.float32) ** 2, axis=-1)  # [m, k]

        def chunk_body(ci, carry):
            sums, counts = carry
            x = lax.dynamic_slice_in_dim(sample_sub, ci * chunk, chunk)
            xb = x.astype(jnp.bfloat16)
            scores = jnp.einsum(
                "smd,mkd->smk", xb, cbb,
                preferred_element_type=jnp.float32,
            ) - half
            assign = jnp.argmax(scores, axis=-1)  # [chunk, m]
            ridx = ci * chunk + lax.iota(jnp.int32, chunk)
            assign = jnp.where(ridx[:, None] < n_valid, assign, k)
            onehot = jax.nn.one_hot(assign, k + 1, dtype=jnp.bfloat16)
            sums = sums + jnp.einsum(
                "smk,smd->mkd", onehot, xb,
                preferred_element_type=jnp.float32,
            )[:, :k]
            counts = counts + jnp.sum(
                onehot.astype(jnp.float32), axis=0
            )[:, :k]
            return sums, counts

        carry0 = (
            jnp.zeros((m, k, ds), jnp.float32),
            jnp.zeros((m, k), jnp.float32),
        )
        sums, counts = lax.fori_loop(0, n_chunks, chunk_body, carry0)
        new = sums / jnp.maximum(counts, 1.0)[..., None]
        return jnp.where((counts > 0.0)[..., None], new, cb)

    return lax.fori_loop(0, n_iters, one_iter, codebooks)


def _pq_encode_block(residuals, codebooks, rot=None):
    """[R, D] fp32 residuals -> [R, m] uint8 codes (argmin L2 per
    subvector, computed as the same matmul-minus-half-norm the trainer
    uses — encode and train see identical geometry). ``rot`` pre-rotates
    the residuals (``pq_rotate``: codes store the ROTATED residual)."""
    if rot is not None:
        residuals = _rotate_rows(residuals, rot)
    m, k, ds = codebooks.shape
    x = residuals.reshape(residuals.shape[0], m, ds)
    half = 0.5 * jnp.sum(codebooks.astype(jnp.float32) ** 2, axis=-1)
    scores = jnp.einsum(
        "smd,mkd->smk", x.astype(jnp.bfloat16),
        codebooks.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) - half
    return jnp.argmax(scores, axis=-1).astype(jnp.uint8)


def _pq_reconstruct(codes, codebooks_flat, m, ds):
    """[..., m] uint8 codes -> [..., m*ds] rows via a VMEM-resident
    codebook gather (``codebooks_flat`` is [m*PQ_K, ds]; subvector blocks
    are contiguous so the reshape restores the original row layout)."""
    flat = codes.astype(jnp.int32) + (
        lax.iota(jnp.int32, m) * PQ_K
    )
    recon = jnp.take(codebooks_flat, flat, axis=0)
    return recon.reshape(codes.shape[:-1] + (m * ds,))


def _greedy_fill(cand: np.ndarray, n_total: int, k: int, capacity: int
                 ) -> np.ndarray:
    """Place every row into a cluster slot: nearest candidate first, then
    the 2nd..C-th nearest (``cand`` columns, C = ASSIGN_CANDIDATES at
    build), then spill into any free slot. Vectorized (sort + run-rank);
    returns ``row_ids`` of shape [k * capacity] with -1 for empty slots.
    Deterministic — multi-process builds run it identically on every
    host."""
    fill = np.zeros(k, np.int64)
    row_ids = np.full(k * capacity, -1, np.int32)
    remaining = np.arange(n_total, dtype=np.int64)
    for choice in range(cand.shape[1]):
        if len(remaining) == 0:
            break
        c = cand[remaining, choice].astype(np.int64)
        order = np.argsort(c, kind="stable")
        cs = c[order]
        # rank within each equal-cluster run (cs is sorted)
        rank = np.arange(len(cs)) - np.searchsorted(cs, cs, side="left")
        pos = rank + fill[cs]
        ok = pos < capacity
        row_ids[cs[ok] * capacity + pos[ok]] = remaining[order[ok]]
        fill += np.bincount(cs[ok], minlength=k)
        remaining = remaining[order[~ok]]
    if len(remaining):
        free = (capacity - fill).astype(np.int64)
        open_clusters = np.nonzero(free)[0]
        slot_cluster = np.repeat(open_clusters, free[open_clusters])
        slot_pos = np.concatenate(
            [np.arange(fill[c], capacity) for c in open_clusters]
        )
        take = slice(0, len(remaining))
        row_ids[slot_cluster[take] * capacity + slot_pos[take]] = remaining
        logger.info(
            "IVFIPIndex: %d rows (%.2f%%) spilled outside their top-%d "
            "clusters (capacity %d, slack exhausted)",
            len(remaining), 100.0 * len(remaining) / max(n_total, 1),
            cand.shape[1], capacity,
        )
    return row_ids


class IVFIPIndex:
    """Sharded inverted-file inner-product index.

    Storage: cluster-major rows ``[K * capacity, D]`` in ``store_dtype``
    (bf16 default: halves gather traffic and memory; the rerank still
    accumulates fp32; int8 quarters memory vs fp32 via per-slot max-abs
    quantization — FlatIPIndex's scheme — with the dequant scale fused
    into the rerank) + ``row_ids`` [K * capacity] int32 (-1 = empty slot)
    + centroids ``[K, D]`` fp32, all sharded over the data axis in whole
    clusters.

    ``reduced_dim`` enables the PCA hybrid (FAISS IVF+PreTransform analog):
    probed rows are first scored in a projected d' << D bf16 space — the
    probed-row gather, the HBM bottleneck at scale, shrinks by d'/D — and
    only the top-``candidates`` full rows are gathered for the exact
    rerank. Adds ``[K * capacity, d']`` bf16 storage.

    ``pq_m`` enables residual product quantization (FAISS ``IndexIVFPQ``
    analog, exclusive with int8/``reduced_dim``): each slot stores ``pq_m``
    uint8 codes into per-subvector 256-entry codebooks trained on
    assignment residuals — ``pq_m`` bytes/row vs ``2*dim`` bf16 (32x at
    m=64, D=1024), the 100M-rows-on-one-chip tier. Search gathers codes,
    reconstructs rows from the VMEM-resident codebooks, and reranks on the
    MXU; the q.centroid term comes free from the stage-0 probe. Scores are
    ADC-style approximations of the true inner product (reconstruction
    error), unlike the exact-at-storage-precision flat/int8 modes. Builds
    via ``__init__`` (host fp32) or ``from_chunk_fn`` (streamed — the
    at-scale path).
    """

    def __init__(
        self,
        embeddings,
        mesh: Optional[Mesh] = None,
        *,
        n_clusters: Union[int, str] = "auto",
        nprobe: Union[int, str] = "auto",
        recall_target: float = 0.95,
        store_dtype=jnp.bfloat16,
        kmeans_iters: int = 10,
        capacity_slack: float = 1.3,
        spherical: bool = True,
        balance_eta: float = 0.0,
        kmeans_split: int = 0,
        reduced_dim: Optional[int] = None,
        candidates: Union[int, str] = "auto",
        pq_m: Optional[int] = None,
        pq_iters: int = 25,
        pq_rotate: str = "none",
        pq_layout: str = "auto",
        tune_sample: int = TUNE_SAMPLE,
        tune_k: int = TUNE_K,
        max_nprobe: Optional[int] = None,
        seed: int = 0,
    ):
        self.mesh = mesh
        self.n_total = int(embeddings.shape[0])
        self.dim = int(embeddings.shape[1])
        if self.n_total < 1:
            raise ValueError("IVFIPIndex needs a non-empty corpus")
        self._set_store(store_dtype)
        if capacity_slack < 1.0:
            raise ValueError("capacity_slack must be >= 1.0")
        self.recall_target = float(recall_target)
        self.spherical = bool(spherical)
        self.balance_eta = float(balance_eta)
        self.kmeans_split = int(kmeans_split)
        self._set_hybrid(reduced_dim, candidates)
        self._set_pq(pq_m, pq_iters, pq_rotate, pq_layout)

        n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
        self.n_clusters = _resolve_clusters(self.n_total, n_shards, n_clusters)
        self.capacity = _resolve_capacity(
            self.n_total, self.n_clusters, capacity_slack,
            multiple=self._capacity_multiple(),
        )
        pad = (-self.n_total) % n_shards
        n_padded = self.n_total + pad

        emb = np.asarray(embeddings, dtype=np.float32)
        if pad:
            emb = np.concatenate(
                [emb, np.zeros((pad, self.dim), np.float32)], axis=0
            )

        # --- train: k-means on device over the (sharded) fp32 corpus ---
        corpus_dev = (
            jax.device_put(jnp.asarray(emb)) if mesh is None
            else shard_rows_to_mesh(emb, mesh)
        )
        rng = np.random.default_rng(seed)
        init_idx = rng.choice(
            self.n_total, size=self.n_clusters,
            replace=self.n_clusters > self.n_total,
        )
        init = emb[init_idx]
        if self.spherical:
            init = init / np.maximum(
                np.linalg.norm(init, axis=1, keepdims=True), 1e-12
            )
        cand = self._train_and_assign(
            corpus_dev, n_padded, init, kmeans_iters
        )
        del corpus_dev  # free the fp32 HBM copy before laying out storage

        # --- layout: greedy fill on host, gather rows from the host copy ---
        row_ids = _greedy_fill(
            cand[: self.n_total], self.n_total, self.n_clusters, self.capacity
        )
        self._set_layout_maps(row_ids)
        clustered = emb[np.clip(row_ids, 0, None)]
        clustered[row_ids < 0] = 0.0
        if self.pq_m is not None:
            codes = self._train_pq_and_encode(clustered, row_ids, seed)
            if self._pq_cols:  # transposed [m, slots] physical layout
                codes = np.ascontiguousarray(codes.T)
            self._place_storage(codes, row_ids, None)
        elif self.quantized:
            codes, scale = self._quantize_host(clustered)
            self._place_storage(codes, row_ids, scale)
        else:
            self._place_storage(
                clustered.astype(np.dtype(store_dtype)), row_ids, None
            )

        self._init_projection()
        self._search_fns: dict = {}
        self._search_lock = threading.Lock()

        self._finish_tuning(
            nprobe, max_nprobe, tune_sample, tune_k, seed,
            sample_fn=lambda idx: emb[idx],
        )

    # ------------------------------------------------------------------
    @classmethod
    def from_sharded(
        cls,
        embeddings,
        n_total: int,
        mesh: Optional[Mesh] = None,
        *,
        n_clusters: Union[int, str] = "auto",
        nprobe: Union[int, str] = "auto",
        recall_target: float = 0.95,
        store_dtype=jnp.bfloat16,
        kmeans_iters: int = 10,
        capacity_slack: float = 1.3,
        spherical: bool = True,
        balance_eta: float = 0.0,
        kmeans_split: int = 0,
        reduced_dim: Optional[int] = None,
        candidates: Union[int, str] = "auto",
        pq_m: Optional[int] = None,
        pq_iters: int = 25,
        pq_rotate: str = "none",
        pq_layout: str = "auto",
        tune_sample: int = TUNE_SAMPLE,
        tune_k: int = TUNE_K,
        max_nprobe: Optional[int] = None,
        seed: int = 0,
    ) -> "IVFIPIndex":
        """Build from a DEVICE-RESIDENT row-sharded fp32 matrix (the
        ``InferenceEncoder.encode_sharded`` layout — see
        ``FlatIPIndex.from_sharded``). k-means, the cluster-major gather,
        and the dtype cast all run on device; the host sees only the
        [N, 2] assignment candidates (for the greedy fill), K init/center
        rows, and the tuner's query probe."""
        self = cls.__new__(cls)
        self.mesh = mesh
        self.n_total = int(n_total)
        self.dim = int(embeddings.shape[1])
        if self.n_total < 1:
            raise ValueError("IVFIPIndex needs a non-empty corpus")
        self._set_store(store_dtype)
        if capacity_slack < 1.0:
            raise ValueError("capacity_slack must be >= 1.0")
        self.recall_target = float(recall_target)
        self.spherical = bool(spherical)
        self.balance_eta = float(balance_eta)
        self.kmeans_split = int(kmeans_split)
        self._set_hybrid(reduced_dim, candidates)
        self._set_pq(pq_m, pq_iters, pq_rotate, pq_layout)

        n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
        n_padded = int(embeddings.shape[0])
        if n_padded % n_shards or n_padded < self.n_total:
            raise ValueError(
                f"sharded embeddings rows ({n_padded}) must be >= "
                f"n_total ({n_total}) and divisible by {n_shards} shards"
            )
        self.n_clusters = _resolve_clusters(self.n_total, n_shards, n_clusters)
        self.capacity = _resolve_capacity(
            self.n_total, self.n_clusters, capacity_slack,
            multiple=self._capacity_multiple(),
        )

        rep_kw = (
            {} if mesh is None
            else {"out_shardings": NamedSharding(mesh, P())}
        )
        rng = np.random.default_rng(seed)
        init_idx = rng.choice(
            self.n_total, size=self.n_clusters,
            replace=self.n_clusters > self.n_total,
        )
        idx_dev = (
            jnp.asarray(init_idx.astype(np.int32)) if mesh is None
            else replicate_to_mesh(init_idx.astype(np.int32), mesh)
        )
        init = np.asarray(
            jax.jit(lambda c, i: jnp.take(c, i, axis=0), **rep_kw)(
                embeddings, idx_dev
            ),
            np.float32,
        )
        if self.spherical:
            init = init / np.maximum(
                np.linalg.norm(init, axis=1, keepdims=True), 1e-12
            )
        cand = self._train_and_assign(embeddings, n_padded, init, kmeans_iters)

        row_ids = _greedy_fill(
            cand[: self.n_total], self.n_total, self.n_clusters, self.capacity
        )
        self._set_layout_maps(row_ids)
        # cluster-major gather ON DEVICE: cross-shard but one-time; empty
        # slots gather row 0 and are zeroed by the mask
        perm = np.clip(row_ids, 0, None).astype(np.int32)
        valid = (row_ids >= 0).astype(np.float32)
        perm_dev = (
            jnp.asarray(perm) if mesh is None
            else replicate_to_mesh(perm, mesh)
        )
        valid_dev = (
            jnp.asarray(valid) if mesh is None
            else replicate_to_mesh(valid, mesh)
        )
        row_kw = (
            {} if mesh is None
            else {"out_shardings": NamedSharding(mesh, P(DATA_AXIS, None))}
        )
        if self.quantized:

            def gather_quantize(c, p, v):
                from rankpo_tpu.index.flat import quantize_rows_int8

                return quantize_rows_int8(jnp.take(c, p, axis=0) * v[:, None])

            self.corpus, self.slot_scale = jax.jit(
                gather_quantize,
                **(
                    {} if mesh is None
                    else {
                        "out_shardings": (
                            NamedSharding(mesh, P(DATA_AXIS, None)),
                            NamedSharding(mesh, P(DATA_AXIS)),
                        )
                    }
                ),
            )(embeddings, perm_dev, valid_dev)
        elif self.pq_m is not None:
            self._pq_from_gathered(
                embeddings, perm_dev, valid_dev, row_ids, rep_kw, row_kw,
                seed,
            )
        else:
            self.corpus = jax.jit(
                lambda c, p, v: (
                    jnp.take(c, p, axis=0) * v[:, None]
                ).astype(jnp.dtype(store_dtype)),
                **row_kw,
            )(embeddings, perm_dev, valid_dev)
            self.slot_scale = None
        self.row_ids = (
            jnp.asarray(row_ids) if mesh is None
            else shard_rows_to_mesh(row_ids, mesh)
        )

        self._init_projection()
        self._search_fns = {}
        self._search_lock = threading.Lock()

        def sample_fn(idx):
            idx_d = (
                jnp.asarray(idx.astype(np.int32)) if mesh is None
                else replicate_to_mesh(idx.astype(np.int32), mesh)
            )
            return np.asarray(
                jax.jit(lambda c, i: jnp.take(c, i, axis=0), **rep_kw)(
                    embeddings, idx_d
                ),
                np.float32,
            )

        self._finish_tuning(
            nprobe, max_nprobe, tune_sample, tune_k, seed,
            sample_fn=sample_fn,
        )
        return self

    # ------------------------------------------------------------------
    @classmethod
    def from_chunk_fn(
        cls,
        get_chunk,
        n_total: int,
        dim: int,
        *,
        chunk_rows: int = 262144,
        train_rows: Optional[int] = None,
        n_clusters: Union[int, str] = "auto",
        nprobe: Union[int, str] = "auto",
        recall_target: float = 0.95,
        store_dtype=jnp.bfloat16,
        kmeans_iters: int = 10,
        capacity_slack: float = 1.3,
        spherical: bool = True,
        balance_eta: float = 0.0,
        kmeans_split: int = 0,
        reduced_dim: Optional[int] = None,
        candidates: Union[int, str] = "auto",
        pq_m: Optional[int] = None,
        pq_iters: int = 25,
        pq_rotate: str = "none",
        pq_layout: str = "auto",
        tune_sample: int = TUNE_SAMPLE,
        tune_k: int = TUNE_K,
        max_nprobe: Optional[int] = None,
        seed: int = 0,
    ) -> "IVFIPIndex":
        """STREAMED single-device build: the fp32 corpus never exists whole.

        ``get_chunk(lo, hi)`` returns fp32 rows ``[hi-lo, D]`` for the
        global range [lo, hi) (host numpy or device array — generated from
        a PRNG, mmap'd from disk, or encoded on the fly); ranges are
        requested in ascending order: an evenly spaced subset once for the
        k-means sample, then every range once to assign and once to place. Peak device
        memory is the FINAL storage (int8: N*D bytes) plus ONE fp32 chunk —
        the path that fits a 10M x 1024 int8 index on a single 16 GB chip,
        where the 40 GB fp32 matrix required by ``__init__``/
        ``from_sharded`` cannot exist. k-means trains on a strided sample
        of ``train_rows`` rows (default ~64 per cluster, FAISS-style
        subsampling) instead of the full corpus; multi-chip corpora use
        ``from_sharded`` instead (this path is single-device)."""
        self = cls.__new__(cls)
        self.mesh = None
        self.n_total = int(n_total)
        self.dim = int(dim)
        if self.n_total < 1:
            raise ValueError("IVFIPIndex needs a non-empty corpus")
        self._set_store(store_dtype)
        if capacity_slack < 1.0:
            raise ValueError("capacity_slack must be >= 1.0")
        self.recall_target = float(recall_target)
        self.spherical = bool(spherical)
        self.balance_eta = float(balance_eta)
        self.kmeans_split = int(kmeans_split)
        self._set_hybrid(reduced_dim, candidates)
        self._set_pq(pq_m, pq_iters, pq_rotate, pq_layout)
        self.n_clusters = _resolve_clusters(self.n_total, 1, n_clusters)
        self.capacity = _resolve_capacity(
            self.n_total, self.n_clusters, capacity_slack,
            multiple=self._capacity_multiple(),
        )
        k_c = self.n_clusters
        chunk_rows = max(1, int(chunk_rows))

        def ranges():
            for lo in range(0, self.n_total, chunk_rows):
                yield lo, min(lo + chunk_rows, self.n_total)

        # --- pass 0: sampled training rows -> Lloyd fit ------------------
        # evenly spaced WHOLE chunks stream into one preallocated donated
        # buffer: peak device memory = buffer + ONE chunk. (The previous
        # per-chunk stride + jnp.concatenate kept every strided part alive
        # THROUGH the concat — 2x the sample bytes, a measured OOM at
        # 50M/K=32768 where the default sample alone is 8.6 GB fp32.)
        s_target = int(
            train_rows if train_rows is not None
            else min(self.n_total, max(64 * k_c, 1 << 16))
        )
        n_chunks_total = -(-self.n_total // chunk_rows)
        # sample FULL chunks only (when any exist): a pick landing on the
        # partial last chunk silently shrinks the sample — measured at 10M
        # (picked={0, last} gave 300k rows instead of the intended 524k,
        # -0.06 recall@100 on the unbalanced int8 build)
        n_full = max(self.n_total // chunk_rows, 1)
        chunks_needed = min(n_full, max(1, -(-s_target // chunk_rows)))
        picked = sorted(
            {
                round(i * (n_full - 1) / max(chunks_needed - 1, 1))
                for i in range(chunks_needed)
            }
        )

        def place_train(buf, rows, offset):
            return lax.dynamic_update_slice_in_dim(buf, rows, offset, axis=0)

        place_train_fn = jax.jit(place_train, donate_argnums=(0,))
        train = jnp.zeros((len(picked) * chunk_rows, self.dim), jnp.float32)
        n_train = 0
        for slot, ci in enumerate(picked):
            lo = ci * chunk_rows
            hi = min(lo + chunk_rows, self.n_total)
            chunk = jnp.asarray(get_chunk(lo, hi), jnp.float32)
            real = int(chunk.shape[0])
            if real < chunk_rows:  # only the global last chunk is partial,
                # and even spacing places it LAST — zeros stay a suffix
                chunk = jnp.pad(chunk, ((0, chunk_rows - real), (0, 0)))
            train = place_train_fn(train, chunk, slot * chunk_rows)
            n_train += real
        rng = np.random.default_rng(seed)
        init_idx = rng.choice(
            n_train, size=k_c, replace=k_c > n_train
        ).astype(np.int32)
        init = np.asarray(
            jnp.take(train, jnp.asarray(init_idx), axis=0), np.float32
        )
        if self.spherical:
            init = init / np.maximum(
                np.linalg.norm(init, axis=1, keepdims=True), 1e-12
            )
        t_chunk = _chunk_rows(n_train, k_c)
        iters = max(0, int(kmeans_iters))
        spherical = self.spherical
        eta = self.balance_eta

        def fit(corpus, cents):
            corpus = _pad_to_chunks(corpus, t_chunk)
            return _lloyd_body(
                corpus, cents, n_train, n_iters=iters, chunk=t_chunk,
                axis_name=None, spherical=spherical, balance_eta=eta,
                split_r=self.kmeans_split,
            )

        self.centroids, bias_dev = jax.jit(fit)(train, jnp.asarray(init))
        self._centroids_host = np.asarray(self.centroids, np.float32)
        self._set_assign_bias(np.asarray(bias_dev, np.float32))
        bias_arg = (
            jnp.asarray(self._assign_bias_host)
            if self._assign_bias_host is not None else None
        )
        if self.pq_m is not None:
            # codebooks train on TOP-1 assignment residuals of the training
            # sample (FAISS IVFPQ trains the same way); encoding later uses
            # each row's ACTUAL slot cluster, so spilled rows still encode
            # against the cluster they landed in
            pq_target = min(n_train, 1 << 17)
            stride_pq = max(1, n_train // pq_target)
            # slice stops at n_train: the buffer may carry zero pad rows
            # past it (chunk-streamed sample above)
            rows = train[:n_train:stride_pq][:pq_target]
            n_rows = int(rows.shape[0])
            a2 = _chunk_rows(n_rows, k_c)

            def top1_residual(x, cents, b=None):
                x = _pad_to_chunks(x, a2)
                top2 = _assign_top2_body(x, cents, chunk=a2, bias=b)
                return x - jnp.take(cents, top2[:, 0], axis=0)

            res = np.asarray(
                jax.jit(top1_residual)(
                    rows, self.centroids,
                    *(() if bias_arg is None else (bias_arg,)),
                ),
                np.float32,
            )[:n_rows]
            self._fit_pq_codebooks(res, seed)
            del res, rows
        del train

        # --- pass 1: streamed top-2 assignment --------------------------
        a_chunk = _chunk_rows(chunk_rows, k_c)

        def assign(chunk, cents, b=None):
            chunk = _pad_to_chunks(chunk, a_chunk)
            return _assign_top2_body(
                chunk, cents, chunk=a_chunk, n_cand=ASSIGN_CANDIDATES,
                bias=b,
            )

        assign_fn = jax.jit(assign)
        bias_extra = () if bias_arg is None else (bias_arg,)
        cand = np.empty((self.n_total, ASSIGN_CANDIDATES), np.int32)
        for lo, hi in ranges():
            chunk = jnp.asarray(get_chunk(lo, hi), jnp.float32)
            if chunk.shape[0] < chunk_rows:  # static shape: pad final chunk
                chunk = jnp.pad(
                    chunk, ((0, chunk_rows - chunk.shape[0]), (0, 0))
                )
            cand[lo:hi] = np.asarray(
                assign_fn(chunk, self.centroids, *bias_extra)
            )[: hi - lo]

        row_ids = _greedy_fill(cand, self.n_total, k_c, self.capacity)
        del cand
        self._set_layout_maps(row_ids)
        slot_of_row = np.empty(self.n_total, np.int64)
        filled = np.nonzero(row_ids >= 0)[0]
        slot_of_row[row_ids[filled]] = filled

        # --- pass 2: streamed placement into donated storage ------------
        total_slots = k_c * self.capacity
        quantized = self.quantized

        if quantized:

            def place(buf, sbuf, rows, slots):
                from rankpo_tpu.index.flat import quantize_rows_int8

                codes, scale = quantize_rows_int8(rows)
                # mode="drop": padded slots are -1 and must scatter nowhere
                # (the default clip mode would overwrite the last slot)
                return (
                    buf.at[slots].set(codes, mode="drop"),
                    sbuf.at[slots].set(
                        scale.astype(jnp.float32), mode="drop"
                    ),
                )

            place_fn = jax.jit(place, donate_argnums=(0, 1))
            buf = jnp.zeros((total_slots, self.dim), jnp.int8)
            sbuf = jnp.zeros((total_slots,), jnp.float32)
        elif self.pq_m is not None:
            cap_ = self.capacity
            cb_f32 = jnp.asarray(self._codebooks_host)
            rot_f32 = (
                jnp.asarray(self._rotation_host)
                if self._rotation_host is not None else None
            )

            pq_cols = self._pq_cols

            def place(buf, rows, slots, cents, cb, rot=None):
                cl = jnp.clip(slots, 0) // cap_
                res = rows - jnp.take(cents, cl, axis=0)
                codes = _pq_encode_block(res, cb, rot)
                if pq_cols:  # transposed storage: scatter into lanes
                    return buf.at[:, slots].set(codes.T, mode="drop")
                return buf.at[slots].set(codes, mode="drop")

            place_fn = jax.jit(place, donate_argnums=(0,))
            buf = jnp.zeros(
                (self.pq_m, total_slots) if pq_cols
                else (total_slots, self.pq_m),
                jnp.uint8,
            )
            sbuf = None
        else:
            out_dtype = jnp.dtype(store_dtype)

            def place(buf, rows, slots):
                return buf.at[slots].set(
                    rows.astype(out_dtype), mode="drop"
                )

            place_fn = jax.jit(place, donate_argnums=(0,))
            buf = jnp.zeros((total_slots, self.dim), out_dtype)
            sbuf = None

        for lo, hi in ranges():
            rows = jnp.asarray(get_chunk(lo, hi), jnp.float32)
            slots = slot_of_row[lo:hi].astype(np.int32)
            m = hi - lo
            if m < chunk_rows:
                rows = jnp.pad(rows, ((0, chunk_rows - m), (0, 0)))
                slots = np.concatenate(
                    [slots, np.full(chunk_rows - m, -1, np.int32)]
                )
            if quantized:
                buf, sbuf = place_fn(buf, sbuf, rows, jnp.asarray(slots))
            elif self.pq_m is not None:
                buf = place_fn(
                    buf, rows, jnp.asarray(slots), self.centroids, cb_f32,
                    rot_f32,
                )
            else:
                buf = place_fn(buf, rows, jnp.asarray(slots))
        self.corpus = buf
        self.slot_scale = sbuf
        self.row_ids = jnp.asarray(row_ids)

        self._init_projection()
        self._search_fns = {}
        self._search_lock = threading.Lock()

        def sample_fn(idx):
            # pseudo-queries from the STORED rows (dequantized/decoded): the
            # fp32 originals are gone by design; storage precision is fine
            # for tuning (they are self-hit-biased pseudo-queries anyway).
            # reconstruct() also un-rotates pq_rotate codecs — decoding the
            # raw codes without rot^T fed the tuner rotated-space rows.
            return self.reconstruct(idx)

        self._finish_tuning(
            nprobe, max_nprobe, tune_sample, tune_k, seed,
            sample_fn=sample_fn,
        )
        return self

    # ------------------------------------------------------------------
    @property
    def _pq_cols(self) -> bool:
        """True when PQ codes are stored transposed ``[m, slots]``."""
        return self.pq_m is not None and self.pq_layout == "cols"

    def _capacity_multiple(self) -> int:
        """Slot rounding: 8 (sublane rule) for row storage, 64 for PQ rows
        (fused-ADC tiling, ops/pq_adc_pallas._cap_block), 128 for the
        transposed PQ layout (lane-dim blocks must be x128,
        _cap_block_t)."""
        if self.pq_m is None:
            return 8
        return 128 if self.pq_layout == "cols" else 64

    def _set_assign_bias(self, bias: Optional[np.ndarray]):
        """Store the balanced-k-means bias (``_lloyd_body``
        ``balance_eta``). None / all-zero = off.

        The bias defines the index's effective PARTITION: rows were
        assigned by ``argmax(score - bias)``, so query-side probing must
        rank clusters by the SAME biased scores or balanced rows sit in
        clusters the probe never reaches (measured at 10M int8 x decay-0.5:
        unbiased probing read 0.805 recall where the unbalanced build read
        0.869 — the bias helps only when both sides share the metric).
        Score TERMS stay raw: the PQ path's q.centroid term and every
        rerank use true geometry; the bias only reorders which clusters
        are opened."""
        if (
            bias is None
            or getattr(self, "balance_eta", 0.0) == 0.0
            or not np.any(bias)
        ):
            self._assign_bias_host = None
            self.assign_bias = None
        else:
            self._assign_bias_host = np.asarray(bias, np.float32)
            if self.mesh is None:
                self.assign_bias = jax.device_put(
                    jnp.asarray(self._assign_bias_host)
                )
            else:
                # sharded like the centroids: each shard owns its clusters
                self.assign_bias = shard_rows_to_mesh(
                    self._assign_bias_host, self.mesh
                )

    def _set_store(self, store_dtype):
        """Validate storage dtype. fp32/bf16 rows rerank at storage
        precision; int8 (4x memory vs fp32) quantizes each slot's row
        symmetrically to its max-abs (exactly ``FlatIPIndex``'s int8
        scheme) and the dequant fuses into the rerank einsum — scores are
        exact inner products against the QUANTIZED rows."""
        self.quantized = jnp.dtype(store_dtype) == jnp.int8
        if not self.quantized and not jnp.issubdtype(
            jnp.dtype(store_dtype), jnp.floating
        ):
            raise ValueError(
                f"store_dtype={store_dtype} must be float32/bfloat16/int8"
            )
        self.store_dtype = store_dtype

    @staticmethod
    def _quantize_host(rows: np.ndarray):
        scale = np.maximum(
            np.abs(rows).max(axis=1) / 127.0, 1e-12
        ).astype(np.float32)
        codes = np.clip(
            np.round(rows / scale[:, None]), -127, 127
        ).astype(np.int8)
        return codes, scale

    def _set_hybrid(self, reduced_dim, candidates):
        """Validate the optional PCA-hybrid knobs (IVF+PCA: probed rows are
        scored in a projected d' << D space — d'/D of the gather bytes, the
        HBM bottleneck at scale — and only the top-``candidates`` full rows
        are gathered for the exact rerank)."""
        if reduced_dim is not None:
            rd = int(reduced_dim)
            if not 0 < rd <= self.dim:
                raise ValueError(
                    f"reduced_dim={reduced_dim} must be in (0, {self.dim}]"
                )
            self.reduced_dim = rd
        else:
            self.reduced_dim = None
        if candidates != "auto":
            if int(candidates) < 1:
                raise ValueError("candidates must be >= 1")
            self.candidates = int(candidates)
        else:
            self.candidates = "auto"

    def _set_pq(self, pq_m, pq_iters, pq_rotate="none", pq_layout="auto"):
        """Validate the product-quantization knobs (residual PQ, the FAISS
        ``IndexIVFPQ`` analog: rows are stored as ``pq_m`` uint8 codes into
        per-subvector 256-entry codebooks trained on ASSIGNMENT residuals —
        row minus its slot's cluster centroid; small for normalized
        embeddings, so codes spend their bits on the informative part).
        Storage is ``pq_m`` bytes/row vs ``2*dim`` bf16 (32x at m=64,
        D=1024) — the 100M-rows-on-one-chip tier.

        ``pq_rotate`` pre-rotates residuals with an orthogonal [D, D]
        matrix before encoding (codes store the ROTATED residual; searches
        rotate the query instead of un-rotating rows — one [Q, D] matmul):
        'random' spreads a power-law spectrum's variance evenly over the m
        subspaces (FAISS ``RandomRotationMatrix`` pre-transform analog);
        'opq' additionally trains the rotation against the codec
        (alternating Lloyd fits and orthogonal-Procrustes updates — the
        non-parametric OPQ of Ge et al., FAISS ``OPQMatrix`` analog).

        ``pq_layout`` picks the physical code layout:
        - 'rows' ``[slots, m]``: the classic layout; the TPU int8 tile
          pads m < 128 up to 128 lanes, so searches carry a whole-array
          relayout copy (measured 15.5 GB for 8.3 GB of codes at
          100M x m=64 — compile OOM; ~6% hidden tax at smaller tiers).
        - 'cols' ``[m, slots]`` (transposed): the huge dim rides the
          lanes, tiling padding-free at any m x32 — the 100M-on-one-chip
          layout. Single-device only (the slot axis would shard on lanes).
        - 'auto': 'cols' when unsharded and m % 32 == 0, else 'rows'."""
        self.codebooks = None
        self._codebooks_host = None
        self.rotation = None
        self._rotation_host = None
        if pq_rotate not in ("none", "random", "opq"):
            raise ValueError(
                f"pq_rotate={pq_rotate!r} must be 'none', 'random' or 'opq'"
            )
        self.pq_rotate = pq_rotate
        if pq_layout not in ("auto", "rows", "cols"):
            raise ValueError(
                f"pq_layout={pq_layout!r} must be 'auto', 'rows' or 'cols'"
            )
        if pq_m is None:
            if pq_rotate != "none":
                raise ValueError("pq_rotate requires pq_m")
            self.pq_m = None
            self.pq_iters = 0
            self.pq_layout = None
            return
        m = int(pq_m)
        if m < 1 or self.dim % m:
            raise ValueError(
                f"pq_m={pq_m} must be a positive divisor of dim={self.dim}"
            )
        if self.quantized:
            raise ValueError(
                "pq_m and int8 store_dtype are exclusive storage codecs — "
                "pick one"
            )
        if self.reduced_dim is not None:
            raise ValueError(
                "pq_m and reduced_dim are exclusive (PQ codes already cut "
                "the probed-row gather below the d'-projection's bytes)"
            )
        self.pq_m = m
        self.pq_iters = max(1, int(pq_iters))
        if pq_layout == "auto":
            pad_lanes = -(-m // 128) * 128  # rows layout pads m to this
            pq_layout = (
                "cols"
                if (
                    self.mesh is None
                    and m % 32 == 0
                    and pad_lanes > m  # m x128 already tiles rows free
                    and float(self.n_total) * pad_lanes > _COLS_AUTO_BYTES
                )
                else "rows"
            )
        if pq_layout == "cols":
            if self.mesh is not None:
                raise ValueError(
                    "pq_layout='cols' is single-device (the slot axis "
                    "would shard over the lane dim) — use 'rows' on a mesh"
                )
            if m % 32 != 0:
                raise ValueError(
                    "pq_layout='cols' needs pq_m % 32 == 0 (int8 sublane "
                    f"packing), got pq_m={m}"
                )
        self.pq_layout = pq_layout

    def _train_pq_and_encode(self, clustered: np.ndarray,
                             row_ids: np.ndarray, seed: int) -> np.ndarray:
        """Train the residual codebooks on a sample of the ACTUAL slot
        residuals (spilled rows train and encode against the cluster they
        landed in — unlike FAISS, whose lists never spill) and encode every
        slot. Returns host uint8 codes [slots, m]; sets ``self.codebooks``
        (flattened [m*256, ds] bf16 on device, replicated when sharded) and
        the fp32 host copy for persistence. Training and encoding are MXU
        einsums on the default device — the sample and the per-chunk blocks
        are small regardless of corpus scale."""
        m, ds = self.pq_m, self.dim // self.pq_m
        slots = clustered.shape[0]
        slot_cluster = np.arange(slots, dtype=np.int64) // self.capacity
        residual = clustered - self._centroids_host[slot_cluster]
        residual[row_ids < 0] = 0.0

        sample_slots = self._pq_sample_slot_ids(row_ids, seed)
        self._fit_pq_codebooks(residual[sample_slots], seed)

        enc = jax.jit(_pq_encode_block)
        cb_dev = jnp.asarray(self._codebooks_host)
        rot_dev = (
            jnp.asarray(self._rotation_host)
            if self._rotation_host is not None else None
        )
        enc_chunk = min(slots, 8192)
        codes = np.empty((slots, m), np.uint8)
        for lo in range(0, slots, enc_chunk):
            hi = min(lo + enc_chunk, slots)
            block = residual[lo:hi]
            if hi - lo < enc_chunk:
                block = np.concatenate(
                    [block,
                     np.zeros((enc_chunk - (hi - lo), self.dim), np.float32)]
                )
            codes[lo:hi] = np.asarray(
                enc(jnp.asarray(block), cb_dev, rot_dev)
            )[: hi - lo]
        return codes

    @staticmethod
    def _pq_sample_slot_ids(row_ids: np.ndarray, seed: int) -> np.ndarray:
        """Filled-slot ids sampled for the codebook fit — ONE policy shared
        by the host and device-resident builds so identical inputs produce
        identical codebooks on both."""
        valid = np.nonzero(row_ids >= 0)[0]
        rng = np.random.default_rng(seed + 2)
        n_sample = int(min(len(valid), PQ_TRAIN_SAMPLE))
        return rng.choice(valid, size=n_sample, replace=False)

    def _fit_pq_codebooks(self, sample_residuals: np.ndarray, seed: int):
        """Lloyd-fit the per-subvector codebooks on fp32 residual rows
        [S, D]; sets the fp32 host copy and the device (bf16, flattened)
        search copy.

        With ``pq_rotate`` the codebooks are fit on ROTATED residuals
        ``z = x @ rot`` ('random': one seeded QR rotation — spreads a
        power-law spectrum's variance evenly over the m subspaces;
        'opq': additionally alternates Lloyd fits with orthogonal-
        Procrustes updates ``rot = UV^T`` of ``X^T decode(encode(X rot))``
        — non-parametric OPQ, Ge et al. / FAISS OPQMatrix). All heavy
        steps (rotation matmuls, Lloyd, encode/decode, the [D, D] cross
        moment) run on device; only the [D, D] SVD runs on host."""
        m, ds = self.pq_m, self.dim // self.pq_m
        n_sample = sample_residuals.shape[0]
        sample_dev = jnp.asarray(
            np.ascontiguousarray(sample_residuals, np.float32)
        )  # [S, D]
        rng = np.random.default_rng(seed + 3)
        pick = jnp.asarray(
            rng.choice(n_sample, size=PQ_K, replace=n_sample < PQ_K)
        )
        chunk = min(n_sample, 2048)
        padded = -(-n_sample // chunk) * chunk

        def fit_fn(z, cb0, *, n_iters):
            zs = jnp.pad(z, ((0, padded - n_sample), (0, 0))).reshape(
                padded, m, ds
            )
            return _pq_lloyd_body(
                zs, cb0, n_sample, n_iters=n_iters, chunk=chunk
            )

        def init_cb(z):
            return jnp.transpose(
                jnp.take(z, pick, axis=0).reshape(PQ_K, m, ds), (1, 0, 2)
            )

        rot = None
        cb = None
        if self.pq_rotate != "none":
            g = np.random.default_rng(seed + 11).standard_normal(
                (self.dim, self.dim)
            )
            rot, _ = np.linalg.qr(g)  # orthogonal; rotated = x @ rot
            rot = np.ascontiguousarray(rot, np.float32)
        if self.pq_rotate == "opq":
            inner = max(2, self.pq_iters // 5)
            fit_inner = jax.jit(functools.partial(fit_fn, n_iters=inner))

            @jax.jit
            def cross_moment(x, z, cb):
                codes = _pq_encode_block(z, cb)
                recon = _pq_reconstruct(
                    codes, cb.reshape(m * PQ_K, ds), m, ds
                ).astype(jnp.float32)
                # fp32-accurate: the Procrustes update is a [D, D] moment
                # of S rows — bf16 MXU rounding here would feed noise into
                # every subsequent rotation
                return jnp.einsum(
                    "sd,se->de", x, recon,
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )
            for _ in range(_OPQ_OUTER):
                z = _rotate_rows(sample_dev, jnp.asarray(rot))
                cb = fit_inner(z, cb if cb is not None else init_cb(z))
                mtx = np.asarray(
                    cross_moment(sample_dev, z, cb), np.float64
                )
                u, _, vt = np.linalg.svd(mtx)
                rot = np.ascontiguousarray(u @ vt, np.float32)
        fit = jax.jit(functools.partial(fit_fn, n_iters=self.pq_iters))
        z = (
            sample_dev if rot is None
            else _rotate_rows(sample_dev, jnp.asarray(rot))
        )
        cb = fit(z, cb if cb is not None else init_cb(z))
        self._codebooks_host = np.asarray(cb, np.float32)
        self._rotation_host = rot
        self._place_codebooks()

    def _pq_from_gathered(self, embeddings, perm_dev, valid_dev,
                          row_ids: np.ndarray, rep_kw, row_kw, seed: int):
        """Device-resident PQ build (``from_sharded``): gather the
        cluster-major fp32 rows (transient — same footprint the flat modes
        pay), fetch ONE residual sample to fit the codebooks (the only
        host round-trip), then encode every slot on device — sharded, each
        shard against its own centroids."""
        mesh = self.mesh
        cap = self.capacity
        m = self.pq_m

        clustered = jax.jit(
            lambda c, p, v: jnp.take(c, p, axis=0) * v[:, None], **row_kw
        )(embeddings, perm_dev, valid_dev)

        # --- codebook fit on a host-fetched residual sample -------------
        sample_slots = self._pq_sample_slot_ids(row_ids, seed)
        idx_dev = (
            jnp.asarray(sample_slots.astype(np.int32)) if mesh is None
            else replicate_to_mesh(sample_slots.astype(np.int32), mesh)
        )
        sample_rows = np.asarray(
            jax.jit(lambda c, i: jnp.take(c, i, axis=0), **rep_kw)(
                clustered, idx_dev
            ),
            np.float32,
        )
        res = sample_rows - self._centroids_host[sample_slots // cap]
        self._fit_pq_codebooks(res, seed)

        # --- sharded encode: each shard owns whole clusters --------------
        n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
        local_slots = (self.n_clusters // n_shards) * cap
        chunk = min(local_slots, 8192)
        n_chunks = -(-local_slots // chunk)
        cb_f32 = (
            jnp.asarray(self._codebooks_host) if mesh is None
            else replicate_to_mesh(self._codebooks_host, mesh)
        )
        if self._rotation_host is None:
            rot_f32 = None
        elif mesh is None:
            rot_f32 = jnp.asarray(self._rotation_host)
        else:
            rot_f32 = replicate_to_mesh(self._rotation_host, mesh)

        pq_cols = self._pq_cols  # transposed is mesh=None only (_set_pq)

        def encode_shard(rows_local, cents_local, cb, rot,
                         axis_name=None):
            # residual + encode PER CHUNK inside the loop — a precomputed
            # residual matrix would double the fp32 transient (OOM at 1M on
            # a 16 GB chip, measured). The final partial chunk re-slices
            # from a clamped start: overlapping positions recompute and
            # rewrite IDENTICAL codes, so no pad copy is needed either.
            def body(ci, buf):
                start = jnp.minimum(ci * chunk, local_slots - chunk)
                blk = lax.dynamic_slice_in_dim(rows_local, start, chunk)
                cl = (start + lax.iota(jnp.int32, chunk)) // cap
                res = blk - jnp.take(cents_local, cl, axis=0)
                codes = _pq_encode_block(res, cb, rot)
                if pq_cols:
                    return lax.dynamic_update_slice_in_dim(
                        buf, codes.T, start, axis=1
                    )
                return lax.dynamic_update_slice_in_dim(
                    buf, codes, start, axis=0
                )

            buf0 = jnp.zeros(
                (m, local_slots) if pq_cols else (local_slots, m), jnp.uint8
            )
            if axis_name is not None:
                buf0 = lax.pcast(buf0, (axis_name,), to="varying")
            return lax.fori_loop(0, n_chunks, body, buf0)

        # (no donate: fp32 rows cannot alias the uint8 codes output, and the
        # loop reads the input to its last chunk — the real peak-memory fix
        # is the chunk-local residual above)
        if mesh is None:
            self.corpus = jax.jit(encode_shard)(
                clustered, self.centroids, cb_f32, rot_f32
            )
        else:
            rot_spec = () if rot_f32 is None else (P(),)
            self.corpus = jax.jit(
                jax.shard_map(
                    lambda r, c, b, *rt: encode_shard(
                        r, c, b, rt[0] if rt else None, DATA_AXIS
                    ),
                    mesh=mesh,
                    in_specs=(
                        P(DATA_AXIS, None), P(DATA_AXIS, None), P()
                    ) + rot_spec,
                    out_specs=P(DATA_AXIS, None),
                ),
                out_shardings=NamedSharding(mesh, P(DATA_AXIS, None)),
            )(
                clustered, self.centroids, cb_f32,
                *(() if rot_f32 is None else (rot_f32,))
            )
        jax.block_until_ready(self.corpus)  # free the fp32 transient now
        self.slot_scale = None

    def _place_codebooks(self):
        """Device codebooks for search: flattened [m*256, ds] bf16 (the
        reconstruction gather indexes subvector-major), replicated across
        the mesh."""
        import ml_dtypes

        m, ds = self.pq_m, self.dim // self.pq_m
        # host-side bf16 cast (bit-identical round-to-nearest): half the
        # replicated transfer bytes and no extra jitted cast dispatch
        flat = self._codebooks_host.reshape(m * PQ_K, ds).astype(
            ml_dtypes.bfloat16
        )
        if self.mesh is None:
            self.codebooks = jax.device_put(jnp.asarray(flat))
        else:
            self.codebooks = replicate_to_mesh(flat, self.mesh)
        if self._rotation_host is not None:
            # fp32 on device: queries rotate through it at search time and
            # residuals at encode time — bf16 storage would blur the codec
            if self.mesh is None:
                self.rotation = jax.device_put(
                    jnp.asarray(self._rotation_host)
                )
            else:
                self.rotation = replicate_to_mesh(
                    self._rotation_host, self.mesh
                )
        else:
            self.rotation = None

    def _init_projection(self):
        """PCA projection + projected cluster-major rows for the hybrid
        path, computed from the STORED rows on device (the second moment is
        permutation-invariant and zero pad rows contribute nothing; storage
        precision is plenty for a prefilter direction basis). Host sees only
        the [D, D] covariance for the eigh — cf. RefineIPIndex."""
        if self.reduced_dim is None:
            self.proj = None
            self.corpus_low = None
            return
        mesh = self.mesh
        rep_kw = (
            {} if mesh is None
            else {"out_shardings": NamedSharding(mesh, P())}
        )
        row_kw = (
            {} if mesh is None
            else {"out_shardings": NamedSharding(mesh, P(DATA_AXIS, None))}
        )
        # int8 storage: dequantize (codes * slot scale) before the second
        # moment and the projection matmul
        if self.quantized:

            def dq(c, s):
                return c.astype(jnp.float32) * s[:, None]

            cov = np.asarray(
                jax.jit(
                    lambda c, s: jnp.einsum(
                        "nd,ne->de", dq(c, s), dq(c, s),
                        preferred_element_type=jnp.float32,
                    ),
                    **rep_kw,
                )(self.corpus, self.slot_scale)
            )
        else:
            cov = np.asarray(
                jax.jit(
                    lambda c: jnp.einsum(
                        "nd,ne->de",
                        c.astype(jnp.float32), c.astype(jnp.float32),
                        preferred_element_type=jnp.float32,
                    ),
                    **rep_kw,
                )(self.corpus)
            )
        _, v = np.linalg.eigh(cov)  # ascending eigenvalues
        proj = np.ascontiguousarray(v[:, -self.reduced_dim:], np.float32)
        self.proj = (
            jax.device_put(jnp.asarray(proj)) if mesh is None
            else replicate_to_mesh(proj, mesh)
        )
        if self.quantized:
            self.corpus_low = jax.jit(
                lambda c, s, p: (
                    (c.astype(jnp.float32) * s[:, None]) @ p
                ).astype(jnp.bfloat16),
                **row_kw,
            )(self.corpus, self.slot_scale, self.proj)
        else:
            self.corpus_low = jax.jit(
                lambda c, p: (c.astype(jnp.float32) @ p).astype(jnp.bfloat16),
                **row_kw,
            )(self.corpus, self.proj)

    def _train_and_assign(self, corpus_dev, n_padded, init_centroids,
                          kmeans_iters) -> np.ndarray:
        """Run the jitted Lloyd loop + the top-2 assignment pass; stores the
        final sharded ``self.centroids`` (and the balance bias when
        ``balance_eta > 0``) and returns host [n_padded, C] candidate
        cluster ids."""
        mesh = self.mesh
        n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
        shard_rows = n_padded // n_shards
        chunk = _chunk_rows(shard_rows, self.n_clusters)
        n_total = self.n_total
        iters = max(0, int(kmeans_iters))
        spherical = self.spherical
        eta = self.balance_eta
        split_r = self.kmeans_split

        if mesh is None:

            def fit(corpus, cents):
                corpus = _pad_to_chunks(corpus, chunk)
                cents, bias = _lloyd_body(
                    corpus, cents, n_total, n_iters=iters, chunk=chunk,
                    axis_name=None, spherical=spherical, balance_eta=eta,
                    split_r=split_r,
                )
                return cents, bias, _assign_top2_body(
                    corpus, cents, chunk=chunk, n_cand=ASSIGN_CANDIDATES,
                    bias=bias if eta else None,
                )

            cents, bias, cand_dev = jax.jit(fit)(
                corpus_dev, jnp.asarray(init_centroids)
            )
            self.centroids = jax.device_put(cents)
            self._centroids_host = np.asarray(cents, np.float32)
            self._set_assign_bias(np.asarray(bias, np.float32))
            return np.asarray(cand_dev)[:n_padded]

        def per_shard(corpus_local, cents):
            shard_id = lax.axis_index(DATA_AXIS)
            n_valid_local = jnp.clip(
                n_total - shard_id * shard_rows, 0, shard_rows
            )
            corpus_local = _pad_to_chunks(corpus_local, chunk)
            cents, bias = _lloyd_body(
                corpus_local, cents, n_valid_local, n_iters=iters,
                chunk=chunk, axis_name=DATA_AXIS, spherical=spherical,
                balance_eta=eta, split_r=split_r,
            )
            cand = _assign_top2_body(
                corpus_local, cents, chunk=chunk, axis_name=DATA_AXIS,
                n_cand=ASSIGN_CANDIDATES, bias=bias if eta else None,
            )
            return cents, bias, cand[:shard_rows]

        fit = jax.jit(
            jax.shard_map(
                per_shard,
                mesh=mesh,
                in_specs=(P(DATA_AXIS, None), P()),
                out_specs=(P(), P(), P(DATA_AXIS, None)),
            ),
            # replicated outputs: every process fetches the full arrays
            out_shardings=NamedSharding(mesh, P()),
        )
        cents, bias, cand_dev = fit(
            corpus_dev, replicate_to_mesh(init_centroids, mesh)
        )
        # final placement: whole clusters per shard (K % W == 0)
        self._centroids_host = np.asarray(cents, np.float32)
        self.centroids = shard_rows_to_mesh(self._centroids_host, mesh)
        self._set_assign_bias(np.asarray(bias, np.float32))
        return np.asarray(cand_dev)

    def _set_layout_maps(self, row_ids: np.ndarray):
        """Host-side row -> global cluster / slot maps (N*4 + N*8 bytes),
        kept for the analytic nprobe tuner (recall(p) follows from each
        true hit's cluster probe-rank — no per-p search compiles) and for
        ``reconstruct`` (original id -> storage slot). Also stashes the
        slot -> row mirror itself, which the device mutation path
        (``append_sharded``/``remove_rows``) edits without a device
        fetch."""
        row_ids = np.asarray(row_ids, np.int32)
        self._row_ids_host = row_ids
        cluster = np.zeros(self.n_total, np.int32)
        filled = np.nonzero(row_ids >= 0)[0]
        cluster[row_ids[filled]] = (filled // self.capacity).astype(np.int32)
        self._cluster_of_row = cluster
        slot = np.full(self.n_total, -1, np.int64)
        slot[row_ids[filled]] = filled
        self._slot_of_row = slot

    def _place_storage(self, clustered_host: np.ndarray, row_ids: np.ndarray,
                       scale: Optional[np.ndarray]):
        mesh = self.mesh
        if mesh is None:
            self.corpus = jax.device_put(jnp.asarray(clustered_host))
            self.row_ids = jax.device_put(jnp.asarray(row_ids))
            self.slot_scale = (
                jax.device_put(jnp.asarray(scale)) if scale is not None
                else None
            )
        else:
            self.corpus = shard_rows_to_mesh(clustered_host, mesh)
            self.row_ids = shard_rows_to_mesh(row_ids, mesh)
            self.slot_scale = (
                shard_rows_to_mesh(scale, mesh) if scale is not None
                else None
            )

    # ------------------------------------------------------------------
    # device-resident mutation (FAISS add / remove_ids analogs)
    _CLONE_FIELDS = (
        "mesh", "dim", "quantized", "store_dtype", "recall_target",
        "spherical", "reduced_dim", "candidates", "pq_m", "pq_iters",
        "pq_rotate", "pq_layout", "codebooks", "_codebooks_host", "rotation",
        "_rotation_host", "n_clusters", "centroids", "_centroids_host",
        "proj", "nprobe", "local_clusters", "balance_eta",
        "_assign_bias_host", "assign_bias", "kmeans_split",
    )

    def _clone_shell(self) -> "IVFIPIndex":
        """New index carrying this one's TRAINED artifacts (centroids,
        codebooks, rotation, PCA basis) and tuned knobs, but no row
        storage — mutations return NEW objects so in-flight searches on
        the old one keep working on its (immutable) arrays. FAISS
        semantics: ``add`` never re-trains, ``nprobe`` is a search-time
        knob and survives mutation."""
        out = IVFIPIndex.__new__(IVFIPIndex)
        for name in self._CLONE_FIELDS:
            setattr(out, name, getattr(self, name))
        out._search_fns = {}
        out._search_lock = threading.Lock()
        return out

    def _adopt_programs(self, src) -> None:
        """Share the compiled-program cache with the mutation source —
        valid whenever storage shapes are unchanged (remove always;
        append without capacity growth), because every cached program
        (search, exact scan, reconstruct gather) reads storage, row_ids,
        and codebooks as arguments and empty slots mask via row_ids.
        Cf. ``FlatIPIndex._adopt_programs``."""
        self._search_fns = src._search_fns
        self._search_lock = src._search_lock

    def _grown_storage(self, new_cap: int):
        """Uniform per-cluster capacity growth, on device: every [K*cap,
        ...] array reshapes to [K, cap, ...], pads the slot axis, and
        reshapes back. K %% shard-count == 0, so each shard keeps exactly
        its clusters — the relayout never crosses shard boundaries.
        Returns (corpus, slot_scale, corpus_low, row_ids_host)."""
        k_c, cap = self.n_clusters, self.capacity
        mesh = self.mesh
        row_kw = (
            {} if mesh is None
            else {"out_shardings": NamedSharding(mesh, P(DATA_AXIS, None))}
        )
        vec_kw = (
            {} if mesh is None
            else {"out_shardings": NamedSharding(mesh, P(DATA_AXIS))}
        )

        def grow_rows(x, fill=0):
            y = jnp.pad(
                x.reshape(k_c, cap, x.shape[1]),
                ((0, 0), (0, new_cap - cap), (0, 0)),
                constant_values=fill,
            )
            return y.reshape(k_c * new_cap, x.shape[1])

        def grow_cols(x, fill=0):
            # transposed codes [m, K*cap]: pad the slot axis on the lanes
            y = jnp.pad(
                x.reshape(x.shape[0], k_c, cap),
                ((0, 0), (0, 0), (0, new_cap - cap)),
                constant_values=fill,
            )
            return y.reshape(x.shape[0], k_c * new_cap)

        corpus = jax.jit(
            grow_cols if self._pq_cols else grow_rows, **row_kw
        )(self.corpus)
        slot_scale = (
            jax.jit(
                lambda s: jnp.pad(
                    s.reshape(k_c, cap), ((0, 0), (0, new_cap - cap)),
                    constant_values=1e-12,
                ).reshape(-1),
                **vec_kw,
            )(self.slot_scale)
            if self.slot_scale is not None else None
        )
        corpus_low = (
            jax.jit(grow_rows, **row_kw)(self.corpus_low)
            if self.corpus_low is not None else None
        )
        row_ids_host = np.pad(
            self._row_ids_host.reshape(k_c, cap),
            ((0, 0), (0, new_cap - cap)),
            constant_values=-1,
        ).reshape(-1)
        return corpus, slot_scale, corpus_low, row_ids_host

    def _place_free(self, row_ids_host: np.ndarray, cand: np.ndarray,
                    capacity: int) -> np.ndarray:
        """Slots for new rows: a free slot in the first-choice cluster,
        else the second choice, else any free slot (spill, logged like the
        build's). Vectorized run-rank placement over the FREE-slot list —
        unlike the build's ``_greedy_fill``, free slots can sit anywhere
        (removal punches interior holes). Caller guarantees enough total
        free slots. Deterministic — multi-process hosts compute identical
        placements from identical inputs."""
        n_new = cand.shape[0]
        free = np.nonzero(row_ids_host < 0)[0]  # ascending == cluster-major
        free_cluster = free // capacity
        k_c = self.n_clusters
        starts = np.searchsorted(free_cluster, np.arange(k_c))
        counts = (
            np.searchsorted(free_cluster, np.arange(k_c), side="right")
            - starts
        )
        used = np.zeros(k_c, np.int64)
        taken = np.zeros(free.size, bool)
        slots = np.full(n_new, -1, np.int64)
        remaining = np.arange(n_new)
        for choice in range(cand.shape[1]):
            if remaining.size == 0:
                break
            c = cand[remaining, choice].astype(np.int64)
            order = np.argsort(c, kind="stable")
            cs = c[order]
            rank = np.arange(len(cs)) - np.searchsorted(cs, cs, side="left")
            pos = used[cs] + rank
            ok = pos < counts[cs]
            fidx = starts[cs[ok]] + pos[ok]
            slots[remaining[order[ok]]] = free[fidx]
            taken[fidx] = True
            used += np.bincount(cs[ok], minlength=k_c)
            remaining = remaining[order[~ok]]
        if remaining.size:
            slots[remaining] = free[~taken][: remaining.size]
            logger.info(
                "IVFIPIndex.append: %d of %d new rows (%.2f%%) spilled "
                "outside their top-2 clusters (capacity %d)",
                remaining.size, n_new, 100.0 * remaining.size / n_new,
                capacity,
            )
        return slots

    def _to_mesh(self, x: np.ndarray):
        if self.mesh is not None and jax.process_count() > 1:
            return replicate_to_mesh(x, self.mesh)
        return jnp.asarray(x)

    def append_sharded(self, new_rows, n_new: int, *,
                       headroom: float = 0.0) -> "IVFIPIndex":
        """Append device-resident rows — the FAISS ``IndexIVF.add`` analog
        without a host round trip. ``new_rows`` is the
        ``InferenceEncoder.encode_sharded`` layout: fp32 [n_buf, D], n_buf
        divisible by the shard count, zero rows past ``n_new``.

        FAISS ``add`` semantics throughout: centroids are NOT re-trained
        (rows assign to the nearest existing centroid), PQ codebooks and
        the OPQ rotation are FIXED (new rows encode through them — unlike
        a decode-and-rebuild, which re-trains and drifts every existing
        code), and ``nprobe`` survives. New rows scatter into free slots
        of their assigned cluster (second choice, then spill, like the
        build); when free slots run out, every cluster's capacity grows
        uniformly on device — a reshape-pad that never crosses shard
        boundaries. Existing codes ride over bit-exactly. Returns a NEW
        index; peak device memory is old+new storage during the scatter
        copy (in-flight searches keep the old arrays — no donation)."""
        from rankpo_tpu.index.flat import validate_append_args

        mesh = self.mesh
        n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
        n_new = validate_append_args(
            new_rows, n_new, headroom, self.dim, n_shards
        )
        n_buf = int(new_rows.shape[0])
        rep_kw = (
            {} if mesh is None
            else {"out_shardings": NamedSharding(mesh, P())}
        )

        # --- 1. top-2 assignment against the FIXED centroids -----------
        chunk = _chunk_rows(n_buf, self.n_clusters)
        cents_rep = self._to_mesh(self._centroids_host)

        def assign(rows, cents, b=None):
            rows = _pad_to_chunks(rows, chunk)
            return _assign_top2_body(rows, cents, chunk=chunk, bias=b)

        bias_extra = (
            (self._to_mesh(self._assign_bias_host),)
            if getattr(self, "_assign_bias_host", None) is not None else ()
        )
        cand = np.asarray(
            jax.jit(assign, **rep_kw)(new_rows, cents_rep, *bias_extra)
        )[:n_new]

        # --- 2. grow capacity when the free slots run out ---------------
        out = self._clone_shell()
        total_free = int((self._row_ids_host < 0).sum())
        if total_free < n_new:
            mult = self._capacity_multiple()
            # headroom pre-pays extra free slots so FOLLOWING appends keep
            # storage shapes (and compiled programs) — cf. the flat tier
            extra = int(np.ceil(headroom * (self.n_total + n_new)))
            grow = -(-(n_new - total_free + extra) // self.n_clusters)
            new_cap = self.capacity + -(-grow // mult) * mult
            out.capacity = new_cap
            corpus, slot_scale, corpus_low, row_ids_host = (
                self._grown_storage(new_cap)
            )
        else:
            out.capacity = self.capacity
            corpus, slot_scale, corpus_low = (
                self.corpus, self.slot_scale, self.corpus_low
            )
            row_ids_host = self._row_ids_host

        # --- 3. host placement into free slots ---------------------------
        slots = out._place_free(row_ids_host, cand, out.capacity)

        # --- 4. device scatter (encode at the storage codec) -------------
        slots_full = np.full(n_buf, -1, np.int32)
        slots_full[:n_new] = slots.astype(np.int32)
        slots_dev = self._to_mesh(slots_full)
        row_kw = (
            {} if mesh is None
            else {"out_shardings": NamedSharding(mesh, P(DATA_AXIS, None))}
        )
        store = jnp.dtype(self.store_dtype)
        cap_out = out.capacity

        if self.quantized:

            def scatter_rows(buf, sbuf, rows, sl):
                from rankpo_tpu.index.flat import quantize_rows_int8

                codes, scale = quantize_rows_int8(rows)
                return (
                    buf.at[sl].set(codes, mode="drop"),
                    sbuf.at[sl].set(scale, mode="drop"),
                )

            out.corpus, out.slot_scale = jax.jit(
                scatter_rows,
                **(
                    {} if mesh is None
                    else {
                        "out_shardings": (
                            NamedSharding(mesh, P(DATA_AXIS, None)),
                            NamedSharding(mesh, P(DATA_AXIS)),
                        )
                    }
                ),
            )(corpus, slot_scale, new_rows, slots_dev)
        elif self.pq_m is not None:
            cb_dev = self._to_mesh(self._codebooks_host)
            rot_dev = (
                self._to_mesh(self._rotation_host)
                if self._rotation_host is not None else None
            )

            pq_cols = self._pq_cols

            def scatter_pq(buf, rows, sl, cents, cb, rot=None):
                cl = jnp.clip(sl, 0) // cap_out
                res = rows - jnp.take(cents, cl, axis=0)
                codes = _pq_encode_block(res, cb, rot)
                if pq_cols:
                    return buf.at[:, sl].set(codes.T, mode="drop")
                return buf.at[sl].set(codes, mode="drop")

            args = (corpus, new_rows, slots_dev, cents_rep, cb_dev)
            if rot_dev is not None:
                args += (rot_dev,)
            out.corpus = jax.jit(scatter_pq, **row_kw)(*args)
            out.slot_scale = None
        else:

            def scatter_plain(buf, rows, sl):
                return buf.at[sl].set(rows.astype(store), mode="drop")

            out.corpus = jax.jit(scatter_plain, **row_kw)(
                corpus, new_rows, slots_dev
            )
            out.slot_scale = None
        if self.reduced_dim is not None:

            def scatter_low(low, rows, sl, proj):
                return low.at[sl].set(
                    (rows @ proj).astype(jnp.bfloat16), mode="drop"
                )

            out.corpus_low = jax.jit(scatter_low, **row_kw)(
                corpus_low, new_rows, slots_dev, self.proj
            )
        else:
            out.corpus_low = None

        # row_ids: edited on host, placed fresh (the id array is tiny; a
        # host edit keeps the mirror and the device array trivially
        # consistent)
        new_row_ids = row_ids_host.copy()
        new_row_ids[slots] = np.arange(
            self.n_total, self.n_total + n_new, dtype=new_row_ids.dtype
        )
        out.row_ids = (
            jnp.asarray(new_row_ids) if mesh is None
            else shard_rows_to_mesh(new_row_ids, mesh)
        )
        out.n_total = self.n_total + n_new
        out._set_layout_maps(new_row_ids)
        if out.capacity == self.capacity:
            # storage shapes unchanged: compiled programs stay valid
            out._adopt_programs(self)
        return out

    def remove_rows(self, removed) -> "IVFIPIndex":
        """Drop rows by corpus position — the FAISS ``remove_ids`` analog.
        Surviving positions SHIFT DOWN (FAISS renumbering semantics).

        Static-shape discipline makes this nearly free: removed slots are
        masked empty (``row_ids = -1`` — search already scores empty slots
        -inf) and survivors renumber, so ONLY the [K*capacity] id array is
        rewritten. Row storage (codes, scales, projected rows) is SHARED
        with the old index object untouched — stale codes in masked slots
        are unreachable through every consumer (search, reconstruct,
        persistence round-trips the mask). Freed slots are reused by later
        ``append_sharded`` calls."""
        removed = np.unique(np.asarray(removed, np.int64).reshape(-1))
        if removed.size == 0:
            return self
        if removed[0] < 0 or removed[-1] >= self.n_total:
            raise IndexError(
                f"remove ids must be in [0, {self.n_total}); got "
                f"[{removed[0]}, {removed[-1]}]"
            )
        if removed.size >= self.n_total:
            raise ValueError("cannot remove every row; build a new index")
        out = self._clone_shell()
        out.capacity = self.capacity
        out.n_total = self.n_total - int(removed.size)
        out.corpus = self.corpus
        out.slot_scale = self.slot_scale
        out.corpus_low = self.corpus_low
        r = self._row_ids_host
        is_removed = np.isin(r, removed.astype(r.dtype)) & (r >= 0)
        shift = np.searchsorted(removed, np.clip(r, 0, None)).astype(r.dtype)
        new_row_ids = np.where((r < 0) | is_removed, np.int32(-1), r - shift)
        out.row_ids = (
            jnp.asarray(new_row_ids) if self.mesh is None
            else shard_rows_to_mesh(new_row_ids, self.mesh)
        )
        out._set_layout_maps(new_row_ids)
        out._adopt_programs(self)
        return out

    def _finish_tuning(self, nprobe, max_nprobe, tune_sample, tune_k, seed,
                       *, sample_fn):
        n_shards = (
            self.mesh.shape[DATA_AXIS] if self.mesh is not None else 1
        )
        self.local_clusters = self.n_clusters // n_shards
        if nprobe == "auto":
            rng = np.random.default_rng(seed + 1)
            n_sample = min(tune_sample, self.n_total)
            sample_idx = rng.choice(
                self.n_total, size=n_sample, replace=False
            )
            sample = sample_fn(sample_idx)
            self.nprobe = self._tune_nprobe(
                sample, tune_k,
                max_nprobe if max_nprobe is not None else self.local_clusters,
            )
        else:
            self.nprobe = int(nprobe)
            if self.nprobe < 1:
                raise ValueError("nprobe must be >= 1")

    def _tune_nprobe(self, sample: np.ndarray, k: int,
                     max_nprobe: int) -> int:
        """Pick the smallest nprobe meeting ``recall_target`` against the
        storage-precision exact search over corpus-row pseudo-queries
        (slight upward bias — the self-hit is free — FAISS tunes nprobe
        the same way).

        ANALYTIC, not a search ladder: for plain IVF the hit set at probe
        count p is exactly the rows whose cluster ranks < p among each
        query's (per-shard) centroid scores, so ONE ``exact_search`` plus
        a host-side rank computation yields recall(p) for EVERY p at once.
        A search-per-ladder-step would compile a fresh XLA program per
        probe — minutes each through a remote-compile setup. The analytic
        choice is then VERIFIED with one real search (the hybrid's
        candidate stage adds loss the analysis cannot see) and bumped a
        bounded number of times if short."""
        k = min(k, self.n_total)
        cap = min(max_nprobe, self.local_clusters)
        n_sample = len(sample)
        _, ref_idx = self.exact_search(sample, k=k)
        ref_sets = [set(row.tolist()) for row in ref_idx]

        # per-query centroid ranks, computed as the device does: bf16-cast
        # inputs, fp32 accumulation, ties to the lower index (stable sort)
        import ml_dtypes

        q_b = sample.astype(ml_dtypes.bfloat16).astype(np.float32)
        c_b = self._centroids_host.astype(ml_dtypes.bfloat16).astype(
            np.float32
        )
        scores = q_b @ c_b.T  # [S, K]
        if self._assign_bias_host is not None:
            # balanced build: probe SELECTION ranks by the biased scores
            # (cf. probe_clusters) — the analytic ranks must match
            scores = scores - self._assign_bias_host[None, :]
        local_clusters = self.local_clusters
        n_shards = self.n_clusters // local_clusters
        blocks = scores.reshape(n_sample, n_shards, local_clusters)
        order = np.argsort(-blocks, axis=2, kind="stable")
        rank = np.empty_like(order)
        np.put_along_axis(
            rank, order,
            np.broadcast_to(np.arange(local_clusters), order.shape),
            axis=2,
        )
        cluster = self._cluster_of_row[ref_idx]  # [S, k] global ids
        need = rank[
            np.arange(n_sample)[:, None],
            cluster // local_clusters,
            cluster % local_clusters,
        ].ravel()
        required = int(math.ceil(self.recall_target * need.size))
        if required <= 0:
            p = 1
        else:
            p = int(np.partition(need, required - 1)[required - 1]) + 1
        p = max(1, min(p, cap))
        logger.info(
            "IVFIPIndex tune (analytic): nprobe=%d predicted recall=%.4f "
            "(target %.2f)",
            p, float((need < p).mean()), self.recall_target,
        )

        # bounded verification: one real search; bump if the measured
        # compound recall (hybrid candidate stage, bf16 accumulation
        # differences) falls short. For the hybrid, a probe bump can HURT:
        # more probed rows crowd the fixed top-C projected-space selection
        # (measured: 1M d'=128 C=512 recall 0.896 at p=32 -> 0.650 at
        # p=64) — when p growth stops helping, grow the candidate pool
        # instead (sticky on the instance, like the refine index's tuned C)
        hybrid = self.reduced_dim is not None
        prev_recall = -1.0
        for _ in range(4 if hybrid else 3):
            _, idx = self.search(sample, k=k, nprobe=p)
            recall = float(
                np.mean([
                    len(set(idx[r].tolist()) & ref_sets[r]) / k
                    for r in range(n_sample)
                ])
            )
            logger.info(
                "IVFIPIndex tune (verify): nprobe=%d candidates=%s "
                "recall=%.4f (target %.2f)",
                p, self.candidates, recall, self.recall_target,
            )
            if recall >= self.recall_target:
                break
            if hybrid and recall <= prev_recall:
                self.candidates = min(
                    2 * self._effective_candidates(k, None),
                    p * self.capacity,
                )
                logger.info(
                    "IVFIPIndex tune: probe bump regressed recall "
                    "(candidate-pool crowding) — candidates -> %d",
                    self.candidates,
                )
            elif p >= cap:
                break
            else:
                p = min(max(p + 1, int(p * 1.5)), cap)
            prev_recall = recall
        else:
            logger.warning(
                "IVFIPIndex: recall below target %.2f at nprobe=%d after "
                "bounded verification — raise max_nprobe or capacity_slack, "
                "lower n_clusters, or use FlatIPIndex/RefineIPIndex",
                self.recall_target, p,
            )
        return p

    # ------------------------------------------------------------------
    @property
    def search_arrays(self) -> tuple:
        """Device arrays ``search_callable`` consumes, in order (the index
        protocol serving composes against: ``fn(*search_arrays, queries)``).
        Layout: (corpus, row_ids, centroids[, assign_bias][, slot_scale]
        [, codebooks][, rotation][, corpus_low, proj]) — optional groups
        present when balanced / quantized / pq / pq_rotate / hybrid."""
        arrays = (self.corpus, self.row_ids, self.centroids)
        if self.assign_bias is not None:
            arrays += (self.assign_bias,)
        if self.quantized:
            arrays += (self.slot_scale,)
        if self.pq_m is not None:
            arrays += (self.codebooks,)
            if self.rotation is not None:
                arrays += (self.rotation,)
        if self.reduced_dim is not None:
            arrays += (self.corpus_low, self.proj)
        return arrays

    def search_arg_shardings(self, mesh: Mesh) -> tuple:
        """NamedShardings for ``search_arrays`` (same protocol)."""
        specs = (
            NamedSharding(mesh, P(DATA_AXIS, None)),
            NamedSharding(mesh, P(DATA_AXIS)),
            NamedSharding(mesh, P(DATA_AXIS, None)),
        )
        if self.assign_bias is not None:
            specs += (NamedSharding(mesh, P(DATA_AXIS)),)
        if self.quantized:
            specs += (NamedSharding(mesh, P(DATA_AXIS)),)
        if self.pq_m is not None:
            specs += (NamedSharding(mesh, P()),)  # codebooks replicated
            if self.rotation is not None:
                specs += (NamedSharding(mesh, P()),)
        if self.reduced_dim is not None:
            specs += (
                NamedSharding(mesh, P(DATA_AXIS, None)),
                NamedSharding(mesh, P()),
            )
        return specs

    def _effective_probe(self, k: int, nprobe: Optional[int]) -> Tuple[int, int]:
        """(nprobe, per-shard k) with nprobe floored so the merged candidate
        width always reaches k (probing all local clusters covers the whole
        corpus, so the floor is always satisfiable)."""
        n_shards = (
            self.mesh.shape[DATA_AXIS] if self.mesh is not None else 1
        )
        p = int(nprobe if nprobe is not None else self.nprobe)
        p = max(p, -(-k // (n_shards * self.capacity)))
        p = min(p, self.local_clusters)
        return p, min(k, p * self.capacity)

    def _gather_bytes_per_query(self, p_used: int, c_used: int) -> float:
        """Per-query device bytes of the probed-row gather + rerank temps,
        for the search() batch-shrink guard. Tier pricing must match what
        the kernel actually gathers: the PCA hybrid's stage 1 touches bf16
        REDUCED-dim rows (pricing it at full-dim fp32 over-shrinks the batch
        ~30x on exactly the large configs the tier targets), and its stage 2
        reranks only ``c_used`` full-dim rows in the store dtype; fp32 score
        temps add 4 bytes per gathered row element in both stages."""
        if self.reduced_dim is not None:
            store = np.dtype(self.corpus.dtype).itemsize
            return (
                p_used * self.capacity * (2 * self.reduced_dim + 4)
                + c_used * self.dim * (store + 4)
            )
        elem = 4 + (
            self.pq_m / self.dim if self.pq_m is not None
            else (1 if self.quantized else 4)
        )
        return p_used * self.capacity * self.dim * elem

    def _effective_candidates(self, k: int, candidates) -> int:
        """Rerank candidate count for the hybrid path: explicit wins, else
        the instance setting, else proportional-to-k ('auto' has no tuning
        ladder — the nprobe tuner measures the COMPOUND projection x
        selection recall at the configured C, so C just needs a sane
        scale)."""
        c = candidates if candidates is not None else self.candidates
        if c == "auto":
            c = max(2 * k, 128)
        return max(int(c), k)

    def search_callable(self, k: int, nprobe: Optional[int] = None,
                        candidates: Optional[int] = None,
                        *, selector: bool = False):
        """Unjitted ``(*search_arrays, queries) -> (scores, idx)`` for
        composing into larger jitted programs (serving fuses encode+search
        into one dispatch). Consumes exactly ``search_arrays`` (see its
        documented layout for the quantized / hybrid optional groups)
        followed by the replicated queries.

        ``selector=True`` builds the FILTERED variant (IDSelector analog):
        a trailing replicated bool mask in ROW-ID space (padded to the
        global slot count) joins the signature; probed rows whose global id
        is ineligible score -inf. Like FAISS IVF selectors, the filter does
        NOT change which clusters are probed — a highly selective filter
        may want a larger nprobe."""
        from rankpo_tpu.ops.topk import storage_exact_precision

        k = min(k, self.n_total)
        p, kk = self._effective_probe(k, nprobe)
        cap = self.capacity
        mesh = self.mesh
        local_clusters = self.local_clusters
        hybrid = self.reduced_dim is not None
        quantized = self.quantized
        balanced = self.assign_bias is not None
        pq = self.pq_m is not None
        pq_m = self.pq_m or 0
        pq_ds = (self.dim // pq_m) if pq else 0
        pq_rot = pq and self.rotation is not None
        c_cand = self._effective_candidates(k, candidates) if hybrid else 0
        cc = min(c_cand, p * cap) if hybrid else 0
        kk_out = min(kk, cc) if hybrid else kk

        def unpack(args):
            """(*search_arrays, queries[, sel]) in the documented layout."""
            clustered, ids, cents, *rest = args
            bias = rest.pop(0) if balanced else None
            scale = rest.pop(0) if quantized else None
            cb = rest.pop(0) if pq else None
            rot = rest.pop(0) if pq_rot else None
            low, proj = (rest.pop(0), rest.pop(0)) if hybrid else (None, None)
            sel = rest.pop() if selector else None
            (queries,) = rest
            return (clustered, ids, cents, bias, scale, cb, rot, low, proj,
                    queries, sel)

        def eligible(hit_ids, sel):
            """Empty-slot mask (-1 ids) composed with the IDSelector mask
            (global-row-id lookup; the clip keeps -1 in range — the >= 0
            term already vetoes those slots)."""
            ok = hit_ids >= 0
            if sel is not None:
                ok &= jnp.take(sel, jnp.clip(hit_ids, 0), axis=0)
            return ok

        def probe_clusters(ids, cents, bias, queries):
            """Stage 0 shared by all variants: local top-p clusters expanded
            to flat SLOT ids, the probed slots' global row ids, and the
            probed centroid scores (the PQ path's q.centroid term comes
            free from here). Row-level slot expansion deliberately replaces
            the earlier whole-block ``jnp.take(blocks, probe)``: composed
            with in-jit probe ids the block gather lowered ~8x slower at
            small query batches (9.2 -> 1.2 ms at Q=8/p=8/1M on v5e,
            benchmarks/gather_probe.py FULL variants; large batches
            neutral)."""
            q = queries.shape[0]
            qc = jnp.einsum(
                "qd,kd->qk",
                queries.astype(jnp.bfloat16),
                cents.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            if bias is None:
                cent_s, probe = lax.top_k(qc, p)  # [Q, p] local clusters
            else:
                # balanced build: SELECT clusters by the biased scores the
                # assignment used (the partition's metric — see
                # _set_assign_bias), but keep the RAW q.centroid scores
                # for the PQ decode term
                _, probe = lax.top_k(qc - bias[None, :], p)
                cent_s = jnp.take_along_axis(qc, probe, axis=1)
            slots = (
                probe[:, :, None] * cap
                + lax.iota(jnp.int32, cap)[None, None, :]
            ).reshape(q, p * cap)
            # ids gather stays BLOCK-shaped: element-gathering Q*p*cap int32
            # scalars through `slots` hit the same wall (1M/Q=256 plain IVF
            # regressed 20.7 -> 39 ms, measured) — 1.3 KB id blocks were
            # never the pathology, only the 655 KB row blocks were
            id_blocks = ids.reshape(local_clusters, cap)
            hit_ids = jnp.take(id_blocks, probe, axis=0).reshape(q, p * cap)
            return probe, slots, hit_ids, cent_s

        def rerank_dtype(rows):
            # int8 codes compute in bf16 with the dequant scale applied to
            # the fp32-accumulated products (FlatIPIndex's int8 scheme)
            return jnp.bfloat16 if rows.dtype == jnp.int8 else rows.dtype

        # bf16/fp32 plain-IVF rerank on TPU: the Pallas streaming kernel
        # (ops/ivf_gather_pallas.py) double-buffers the probed blocks
        # HBM->VMEM with a fused dot — measured ~1.7x the XLA row-take on
        # floor-subtracted time at 1M/Q=256, and EXACT fp32 accumulation
        # (2.3e-5 vs the numpy oracle) where XLA's fused gather+einsum
        # carries ~0.7% score error (benchmarks/ivf_pallas_probe.py).
        # int8/PQ/hybrid keep the XLA path (scale/decode fusion not ported)
        pallas_gather = (
            not quantized and not pq and not hybrid
            and jax.default_backend() == "tpu"
            and self.dim % 128 == 0 and cap % 8 == 0
        )

        # IVF+PQ large-probe scoring on TPU: the fused ADC kernel
        # (ops/pq_adc_pallas.py) never reconstructs rows — per-query LUTs
        # stay in VMEM, only the probed uint8 CODE blocks move, and the
        # one-hot mask+reduce never touches HBM. 2.0x the chunked
        # one-hot-matmul decode and 6.3x the element-gather reconstruct at
        # 1M/Q=256 (27.8 vs 56.6 vs 174.5 ms, pq_decode_probe on v5e);
        # below the threshold the ds-wide take still wins (1.2 vs 1.5 ms
        # at Q=8 — grid dispatch overhead), so the small-probe path keeps
        # it. FORCE_INTERPRET routes CPU tests through the kernel.
        pq_cols = pq and self.pq_layout == "cols"
        if pq:
            from rankpo_tpu.ops import pq_adc_pallas as _adc

            # supported()/supported_t() also guard capacities without a
            # legal VMEM tiling (legacy persisted indexes built before PQ
            # capacities were rounded) — those keep the XLA decode.
            codes_gb = self.n_clusters * cap * pq_m / (1 << 30)
            on_backend = (
                jax.default_backend() == "tpu" or _adc.FORCE_INTERPRET
            )
            if pq_cols:
                # transposed [m, slots] tiles padding-free at any m x32 —
                # no relayout copy to budget, the codes are the whole cost
                # (the layout that unblocked 100M x m=64 on one chip)
                pallas_adc = (
                    _adc.supported_t(cap, pq_m)
                    and codes_gb <= 12.0
                    and on_backend
                )
            else:
                # rows [slots, m]: the TPU int8 tile pads m up to the next
                # x128 lanes, and the program carries a relayout COPY of
                # the whole padded array per call — measured at the 100M
                # tier (u8[130M, 64]: a 15.5 G copy for 8.3 G of codes;
                # compile OOM at 23.9 G). Price the padding UNIFORMLY:
                # pad = ceil(m/128)*128/m — m=192 still pads 1.33x, it is
                # not free just because m > 128. Past the budget the XLA
                # decode path takes over (natural-layout gather,
                # batch-shrunk by _gather_bytes_per_query).
                pad = (-(-pq_m // 128) * 128) / pq_m
                budget_gb = codes_gb * (1.0 + pad) if pad > 1.0 else codes_gb
                pallas_adc = (
                    _adc.supported(cap, pq_m)
                    and budget_gb <= 12.0
                    and on_backend
                )
        else:
            pallas_adc = False

        def probe_block(*args):
            """Plain IVF: gather probed full rows, rerank exactly (at
            storage precision; int8 = against the quantized rows)."""
            clustered, ids, cents, bias, scale, _, _, _, _, queries, sel = (
                unpack(args)
            )
            q = queries.shape[0]
            probe, slots, hit_ids, _ = probe_clusters(
                ids, cents, bias, queries
            )
            if pallas_gather:
                from rankpo_tpu.ops.ivf_gather_pallas import probe_scores

                s = probe_scores(
                    clustered, probe, queries, cap=cap
                ).reshape(q, p * cap)
            else:
                rows = jnp.take(clustered, slots, axis=0)  # [Q, p*cap, D]
                cdt = rerank_dtype(rows)
                s = jnp.einsum(
                    "qd,qnd->qn", queries.astype(cdt), rows.astype(cdt),
                    preferred_element_type=jnp.float32,
                    precision=storage_exact_precision(rows.dtype),
                )
            if scale is not None:
                s = s * jnp.take(
                    scale.reshape(local_clusters, cap), probe, axis=0
                ).reshape(q, p * cap)
            s = jnp.where(eligible(hit_ids, sel), s, NEG_INF)
            top_s, pos = lax.top_k(s, kk)
            return top_s, jnp.take_along_axis(hit_ids, pos, axis=1)

        def probe_block_pq(*args):
            """IVF+PQ: gather probed CODES (m bytes/row — 32x below bf16
            rows at m=64, D=1024), reconstruct rows from the VMEM-resident
            codebooks, and rerank on the MXU. Scores are ADC-style
            approximations: q.centroid (free from stage 0) + q.decode(code);
            like FAISS IVFPQ they rank well but are not exact inner
            products."""
            clustered, ids, cents, bias, _, cb, rot, _, _, queries, sel = (
                unpack(args)
            )
            q = queries.shape[0]
            probe, slots, hit_ids, cent_s = probe_clusters(
                ids, cents, bias, queries
            )
            # pq_rotate: codes store ROTATED residuals z = x @ rot; the
            # decode score term q . x_hat = (q @ rot) . z, so one [Q, D]
            # rotation replaces un-rotating every reconstructed row
            q_dec = queries if rot is None else _rotate_rows(queries, rot)
            rows_n = q * p * cap
            # transposed layout dispatches the kernel at EVERY size when
            # supported: its XLA fallback is a lane-axis gather (strided
            # column reads), so the rows layout's small-probe
            # take-reconstruct preference does not transfer
            if pallas_adc and (pq_cols or rows_n >= (1 << 16)):
                # fused ADC — the kernel gathers the code blocks itself
                # (scalar-prefetch index_map), so no jnp.take here at all
                from rankpo_tpu.ops.pq_adc_pallas import (
                    FORCE_INTERPRET, pq_probe_scores, pq_probe_scores_t,
                )

                cbm = cb.reshape(pq_m, PQ_K, pq_ds)
                q_sub = q_dec.astype(jnp.bfloat16).reshape(q, pq_m, pq_ds)
                lut = jnp.einsum(
                    "qmd,mkd->qmk", q_sub, cbm,
                    preferred_element_type=jnp.float32,
                )
                adc = pq_probe_scores_t if pq_cols else pq_probe_scores
                s = adc(
                    clustered, probe, lut, cap=cap,
                    interpret=FORCE_INTERPRET,
                ).reshape(q, p * cap)
                s = s + jnp.repeat(cent_s, cap, axis=1)
                s = jnp.where(eligible(hit_ids, sel), s, NEG_INF)
                top_s, pos = lax.top_k(s, kk)
                return top_s, jnp.take_along_axis(hit_ids, pos, axis=1)
            if pq_cols:  # XLA fallback for transposed codes (CPU tests,
                # unsupported tilings): lane-axis gather + transpose back
                codes = jnp.transpose(
                    jnp.take(clustered, slots, axis=1), (1, 2, 0)
                )  # [Q, p*cap, m]
            else:
                codes = jnp.take(clustered, slots, axis=0)  # [Q, p*cap, m]
            if rows_n < (1 << 16):
                # small probed sets: the ds-wide codebook take is fastest
                # (1.12 vs 2.99 ms at Q=8/p=8/1M, pq_decode_probe)
                recon = _pq_reconstruct(codes, cb, pq_m, pq_ds)
            else:
                # large probed sets: decode AS A MATMUL — one_hot(codes)
                # einsum codebooks, chunked so the one-hot transient stays
                # bounded. 3x the element-gather reconstruct at Q=256
                # (57.9 vs 174.7 ms, pq_decode_probe); the remaining cost
                # is the one-hot's own HBM traffic, not FLOPs
                cbm = cb.reshape(pq_m, PQ_K, pq_ds)
                flat_codes = codes.reshape(rows_n, pq_m)
                chunk = min(rows_n, 1 << 14)
                n_chunks = -(-rows_n // chunk)

                def body(ci, out):
                    start = jnp.minimum(ci * chunk, rows_n - chunk)
                    blk = lax.dynamic_slice_in_dim(flat_codes, start, chunk)
                    onehot = jax.nn.one_hot(blk, PQ_K, dtype=jnp.bfloat16)
                    rows = jnp.einsum(
                        "rmk,mkd->rmd", onehot, cbm,
                        preferred_element_type=jnp.bfloat16,
                    ).reshape(chunk, pq_m * pq_ds)
                    return lax.dynamic_update_slice_in_dim(
                        out, rows, start, axis=0
                    )

                buf0 = jnp.zeros((rows_n, pq_m * pq_ds), jnp.bfloat16)
                if mesh is not None:
                    buf0 = lax.pcast(buf0, (DATA_AXIS,), to="varying")
                recon = lax.fori_loop(0, n_chunks, body, buf0).reshape(
                    q, p * cap, pq_m * pq_ds
                )
            s = jnp.einsum(
                "qd,qnd->qn", q_dec.astype(jnp.bfloat16), recon,
                preferred_element_type=jnp.float32,
            ) + jnp.repeat(cent_s, cap, axis=1)
            s = jnp.where(eligible(hit_ids, sel), s, NEG_INF)
            top_s, pos = lax.top_k(s, kk)
            return top_s, jnp.take_along_axis(hit_ids, pos, axis=1)

        def probe_block_hybrid(*args):
            """IVF+PCA: score probed rows in the projected d' space (d'/D of
            the gather bytes), gather only the top-C full rows, rerank
            exactly."""
            clustered, ids, cents, bias, scale, _, _, low, proj, queries, sel = (
                unpack(args)
            )
            _, slots, hit_ids, _ = probe_clusters(ids, cents, bias, queries)
            rows_low = jnp.take(low, slots, axis=0)  # [Q, p*cap, d']
            q_low = (queries.astype(jnp.float32) @ proj).astype(jnp.bfloat16)
            s1 = jnp.einsum(
                "qe,qne->qn", q_low, rows_low,
                preferred_element_type=jnp.float32,
            )
            # filter BEFORE candidate selection so the rerank pool is not
            # wasted on ineligible rows (same rationale as the refine tier)
            s1 = jnp.where(eligible(hit_ids, sel), s1, NEG_INF)
            # the 0.95 here is approx_max_k's OWN selection recall on the
            # projected scores; the nprobe tuner measures the COMPOUND
            # recall on the final config, so it self-corrects
            _, cpos = lax.approx_max_k(
                s1, cc, recall_target=0.95, aggregate_to_topk=True
            )
            # flat probed position -> slot id -> full row gather
            slots_sel = jnp.take_along_axis(slots, cpos, axis=1)  # [Q, cc]
            rows = jnp.take(clustered, slots_sel, axis=0)  # [Q, cc, D]
            cand_ids = jnp.take_along_axis(hit_ids, cpos, axis=1)
            cdt = rerank_dtype(rows)
            s2 = jnp.einsum(
                "qd,qcd->qc", queries.astype(cdt), rows.astype(cdt),
                preferred_element_type=jnp.float32,
                precision=storage_exact_precision(rows.dtype),
            )
            if scale is not None:
                s2 = s2 * jnp.take(scale, slots_sel, axis=0)
            s2 = jnp.where(eligible(cand_ids, sel), s2, NEG_INF)
            top_s, pos = lax.top_k(s2, kk_out)
            return top_s, jnp.take_along_axis(cand_ids, pos, axis=1)

        block_fn = (
            probe_block_hybrid if hybrid
            else probe_block_pq if pq
            else probe_block
        )

        if mesh is None:

            def single(*args):
                return block_fn(*args)

            return single

        array_specs = (
            (P(DATA_AXIS, None), P(DATA_AXIS), P(DATA_AXIS, None))
            + ((P(DATA_AXIS),) if balanced else ())
            + ((P(DATA_AXIS),) if quantized else ())
            + ((P(),) if pq else ())
            + ((P(),) if pq_rot else ())
            + ((P(DATA_AXIS, None), P()) if hybrid else ())
        )
        shard_fn = jax.shard_map(
            block_fn,
            mesh=mesh,
            # queries replicated; selector mask (row-id space) replicated too
            in_specs=array_specs + (P(),) + ((P(),) if selector else ()),
            out_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS)),
            # pallas_call outputs carry no vma metadata; with the default
            # check_vma=True the Pallas gather/ADC paths fail to trace on a
            # TPU mesh (same workaround as ops/attention.py flash-TP and
            # parallel/ring_attention.py)
            check_vma=not (pallas_gather or pallas_adc),
        )
        n_shards = mesh.shape[DATA_AXIS]
        k_final = min(k, n_shards * kk_out)

        def sharded(*args):
            cand_scores, cand_idx = shard_fn(*args)
            final_scores, pos = lax.top_k(cand_scores, k_final)
            return final_scores, jnp.take_along_axis(cand_idx, pos, axis=1)

        return sharded

    def _build_search(self, k: int, nprobe: int, candidates: Optional[int],
                      *, selector: bool = False):
        fn = self.search_callable(k, nprobe, candidates, selector=selector)
        if self.mesh is None:
            return jax.jit(fn)
        mesh = self.mesh
        sel_shard = ((NamedSharding(mesh, P()),) if selector else ())
        return jax.jit(
            fn,
            in_shardings=self.search_arg_shardings(mesh)
            + (NamedSharding(mesh, P()),)
            + sel_shard,
            out_shardings=NamedSharding(mesh, P()),
        )

    def search(
        self,
        queries,
        k: int = 100,
        batch_size: int = 64,
        nprobe: Optional[int] = None,
        candidates: Optional[int] = None,
        *,
        allowed_ids=None,
        disallowed_ids=None,
        selector=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched probe-and-rerank search. Returns fp32 scores and int32
        indices, shapes [Q, k] — same surface as ``FlatIPIndex.search``
        (default batch_size is smaller: the probed-row gather is the
        memory peak). Unreachable tail slots are score -inf / index -1,
        matching FAISS IVF semantics. ``candidates`` applies only to the
        PCA-hybrid configuration (rerank pool size).

        ``allowed_ids``/``disallowed_ids``/``selector`` filter results to a
        subset of corpus row ids (FAISS IDSelector analog; see
        ``search_callable`` for the IVF probing caveat)."""
        from rankpo_tpu.index.flat import (
            build_selector_mask,
            mask_filtered_misses,
        )

        k = min(k, self.n_total)
        sel_mask = build_selector_mask(
            self.n_total, allowed_ids, disallowed_ids, selector
        )
        p_used, _ = self._effective_probe(k, nprobe)
        c_used = (
            self._effective_candidates(k, candidates)
            if self.reduced_dim is not None else 0
        )
        # gather-budget guard: at a large tuned nprobe (data that genuinely
        # needs many probes) a caller-supplied batch can otherwise request a
        # 100+ GB allocation. Shrinking the query batch is always safe —
        # each (k, p) already compiles its own program.
        per_q = self._gather_bytes_per_query(p_used, c_used)
        max_bq = max(1, int(_GATHER_BUDGET // max(per_q, 1)))
        if max_bq < batch_size:
            logger.info(
                "IVF search: shrinking query batch %d -> %d (nprobe %d x "
                "capacity %d x dim %d gather would exceed the %.1f GB "
                "budget)", batch_size, max_bq, p_used, self.capacity,
                self.dim, _GATHER_BUDGET / (1 << 30),
            )
            batch_size = max_bq
        queries = np.asarray(queries, np.float32)
        if queries.shape[0] == 0:
            return (
                np.zeros((0, k), np.float32),
                np.zeros((0, k), np.int32),
            )
        with self._search_lock:
            key = (k, p_used, c_used, sel_mask is not None)
            search_fn = self._search_fns.get(key)
            if search_fn is None:
                search_fn = self._search_fns[key] = self._build_search(
                    k, p_used, candidates, selector=sel_mask is not None
                )
        sel_args = ()
        if sel_mask is not None:
            # row-id-space mask padded to the (stable) global slot count —
            # the clip in `eligible` may read pad entries, which stay False
            padded = np.zeros(int(self.row_ids.shape[0]), np.bool_)
            padded[: self.n_total] = sel_mask
            if self.mesh is not None:
                sel_args = (replicate_to_mesh(padded, self.mesh),)
            else:
                sel_args = (jnp.asarray(padded),)
        n_q = queries.shape[0]
        pending = []
        for lo in range(0, n_q, batch_size):
            block = queries[lo : lo + batch_size]
            real = block.shape[0]
            if real < batch_size:
                block = np.concatenate(
                    [block, np.zeros((batch_size - real, self.dim), np.float32)]
                )
            if self.mesh is not None and jax.process_count() > 1:
                block_dev = replicate_to_mesh(block, self.mesh)
            else:
                block_dev = jnp.asarray(block)
            scores, idx = search_fn(*self.search_arrays, block_dev, *sel_args)
            scores.copy_to_host_async()
            idx.copy_to_host_async()
            pending.append((scores, idx, real))
        all_scores = [
            np.asarray(s)[:r].astype(np.float32, copy=False)
            for s, _, r in pending
        ]
        all_idx = [
            np.asarray(i)[:r].astype(np.int32, copy=False)
            for _, i, r in pending
        ]
        out_scores = np.concatenate(all_scores)
        out_idx = np.concatenate(all_idx)
        if sel_mask is not None:
            out_idx = mask_filtered_misses(out_scores, out_idx)
        return out_scores, out_idx

    # ------------------------------------------------------------------
    def _exact_callable(self, k: int, n_queries: int):
        """Unjitted exact brute-force top-k over the STORED rows
        (dequantized at storage precision), streaming fixed row-chunks
        with a running top-k merge — O(Q*k) state, no second corpus copy.
        The nprobe tuner's reference; also the recall oracle for corpora
        too large to materialize in fp32."""
        from rankpo_tpu.ops.topk import storage_exact_precision

        cap = self.capacity
        local_clusters = self.local_clusters
        quantized = self.quantized
        pq = self.pq_m is not None
        pq_m = self.pq_m or 0
        pq_ds = (self.dim // pq_m) if pq else 0
        pq_rot = pq and self.rotation is not None
        pq_cols = pq and self.pq_layout == "cols"
        mesh = self.mesh
        rows_local = local_clusters * cap
        k_local = min(k, rows_local)
        chunk = min(rows_local, max(8, ((1 << 22) // max(n_queries, 1)) // 8 * 8))
        n_chunks = -(-rows_local // chunk)
        padded = n_chunks * chunk

        def scan_block(*args):
            if quantized:
                clustered, ids, scale, queries = args
                cents = cb = None
            elif pq and pq_rot:
                clustered, ids, cents, cb, rot, queries = args
                scale = None
            elif pq:
                clustered, ids, cents, cb, queries = args
                scale = None
            else:
                clustered, ids, queries = args
                scale = cents = cb = None
            if not pq_rot:
                rot = None
            qn = queries.shape[0]
            clustered_p = jnp.pad(
                clustered,
                ((0, 0), (0, padded - rows_local)) if pq_cols
                else ((0, padded - rows_local), (0, 0)),
            )
            ids_p = jnp.pad(
                ids, (0, padded - rows_local), constant_values=-1
            )
            scale_p = (
                jnp.pad(scale, (0, padded - rows_local))
                if scale is not None else None
            )
            cdt = jnp.bfloat16 if (quantized or pq) else clustered.dtype
            q_c = queries.astype(cdt)
            prec = (
                None if pq else storage_exact_precision(clustered.dtype)
            )
            if rot is not None:
                # rotated codec: decode term scores (q @ rot) . z; the
                # centroid term comes from ONE [Q, K_c] matmul instead of
                # adding centroids to every decoded row (Q*K_c*D once vs
                # Q*rows*D across chunks)
                q_dec = _rotate_rows(queries, rot).astype(cdt)
                qc_all = jnp.einsum(
                    "qd,kd->qk", q_c, cents.astype(cdt),
                    preferred_element_type=jnp.float32,
                )

            def body(ci, carry):
                best_s, best_i = carry
                if pq_cols:  # [m, chunk] lane slice -> [chunk, m] codes
                    rows = lax.dynamic_slice_in_dim(
                        clustered_p, ci * chunk, chunk, axis=1
                    ).T
                else:
                    rows = lax.dynamic_slice_in_dim(
                        clustered_p, ci * chunk, chunk
                    )
                ids_c = lax.dynamic_slice_in_dim(ids_p, ci * chunk, chunk)
                cent_term = None
                if pq:
                    # decode: residual reconstruction + the slot's cluster
                    # centroid (padded slots clamp to the last cluster and
                    # are masked below)
                    cl = (ci * chunk + lax.iota(jnp.int32, chunk)) // cap
                    cl = jnp.minimum(cl, local_clusters - 1)
                    recon = _pq_reconstruct(rows, cb, pq_m, pq_ds)
                    if rot is not None:
                        rows = recon
                        cent_term = jnp.take(qc_all, cl, axis=1)
                    else:
                        rows = recon + jnp.take(
                            cents, cl, axis=0
                        ).astype(jnp.bfloat16)
                s = jnp.einsum(
                    "qd,rd->qr", (q_c if cent_term is None else q_dec),
                    rows.astype(cdt),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                if cent_term is not None:
                    s = s + cent_term
                if scale_p is not None:
                    s = s * lax.dynamic_slice_in_dim(
                        scale_p, ci * chunk, chunk
                    )[None, :]
                s = jnp.where(ids_c[None, :] >= 0, s, NEG_INF)
                cat_s = jnp.concatenate([best_s, s], axis=1)
                cat_i = jnp.concatenate(
                    [best_i, jnp.broadcast_to(ids_c[None, :], (qn, chunk))],
                    axis=1,
                )
                top_s, pos = lax.top_k(cat_s, k_local)
                return top_s, jnp.take_along_axis(cat_i, pos, axis=1)

            carry0 = (
                jnp.full((qn, k_local), NEG_INF, jnp.float32),
                jnp.full((qn, k_local), -1, jnp.int32),
            )
            if mesh is not None:
                carry0 = tuple(
                    lax.pcast(x, (DATA_AXIS,), to="varying") for x in carry0
                )
            return lax.fori_loop(0, n_chunks, body, carry0)

        if mesh is None:
            return scan_block

        specs = (
            (P(DATA_AXIS, None), P(DATA_AXIS))
            + ((P(DATA_AXIS),) if quantized else ())
            + ((P(DATA_AXIS, None), P()) if pq else ())
            + ((P(),) if pq_rot else ())
        )
        shard_fn = jax.shard_map(
            scan_block,
            mesh=mesh,
            in_specs=specs + (P(),),
            out_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS)),
        )
        n_shards = mesh.shape[DATA_AXIS]
        k_final = min(k, n_shards * k_local)

        def sharded(*args):
            cand_s, cand_i = shard_fn(*args)
            top_s, pos = lax.top_k(cand_s, k_final)
            return top_s, jnp.take_along_axis(cand_i, pos, axis=1)

        return sharded

    def reconstruct(self, ids) -> np.ndarray:
        """Stored rows for original corpus ids, decoded to fp32 — the
        FAISS ``IndexIVF.reconstruct``/``reconstruct_batch`` analog (the
        stored approximation, not the original vector): fp32/bf16 rows at
        storage precision, int8 dequantized through the slot scale, PQ as
        cluster centroid + codebook decode, un-rotating the codec for
        ``pq_rotate`` builds. Also the tuner's pseudo-query source in
        streamed builds where the fp32 originals are gone by design."""
        from rankpo_tpu.index.flat import (
            _canonical_recon_ids,
            _chunked_row_gather,
        )

        ids = _canonical_recon_ids(ids, self.n_total)
        if ids.size == 0:
            return np.zeros((0, self.dim), np.float32)
        slots = self._slot_of_row[ids]
        with self._search_lock:
            fn = self._search_fns.get("reconstruct")
            if fn is None:
                pq_m, cap = self.pq_m, self.capacity
                pq_ds = self.dim // pq_m if pq_m else 0
                quantized = self.quantized
                has_rot = self.pq_m is not None and self.rotation is not None

                pq_cols = self._pq_cols

                def gather(corpus, scale, cents, cb, rot, slot_idx):
                    if pq_cols:
                        stored = jnp.take(corpus, slot_idx, axis=1).T
                    else:
                        stored = jnp.take(corpus, slot_idx, axis=0)
                    if pq_m is not None:
                        z = _pq_reconstruct(stored, cb, pq_m, pq_ds).astype(
                            jnp.float32
                        )
                        if has_rot:
                            # codes store ROTATED residuals z = res @ rot;
                            # res_hat = z_hat @ rot^T (rot orthogonal)
                            z = jnp.dot(
                                z, rot.T,
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST,
                            )
                        return z + jnp.take(
                            cents, slot_idx // cap, axis=0
                        ).astype(jnp.float32)
                    rows = stored.astype(jnp.float32)
                    if quantized:
                        rows = rows * jnp.take(scale, slot_idx)[:, None]
                    return rows

                if self.mesh is None:
                    fn = jax.jit(gather)
                else:
                    mesh = self.mesh
                    fn = jax.jit(
                        gather,
                        in_shardings=(
                            NamedSharding(mesh, P(DATA_AXIS, None)),
                            NamedSharding(mesh, P(DATA_AXIS))
                            if self.quantized else None,
                            NamedSharding(mesh, P(DATA_AXIS, None)),
                            NamedSharding(mesh, P())
                            if self.pq_m is not None else None,
                            NamedSharding(mesh, P()) if has_rot else None,
                            NamedSharding(mesh, P()),
                        ),
                        out_shardings=NamedSharding(mesh, P()),
                    )
                self._search_fns["reconstruct"] = fn
        scale = self.slot_scale if self.quantized else None
        cb = self.codebooks if self.pq_m is not None else None
        rot = (
            self.rotation
            if self.pq_m is not None and self.rotation is not None else None
        )
        return _chunked_row_gather(
            fn, (self.corpus, scale, self.centroids, cb, rot), slots,
            self.mesh,
        )

    def exact_search(
        self, queries, k: int = 100, batch_size: int = 256,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact (at storage precision) brute-force search over the stored
        rows. Same output surface as ``search``; used as the tuner's
        reference and as a recall oracle at scales where a second fp32
        corpus copy cannot exist."""
        k = min(k, self.n_total)
        queries = np.asarray(queries, np.float32)
        if queries.shape[0] == 0:
            return (
                np.zeros((0, k), np.float32),
                np.zeros((0, k), np.int32),
            )
        arrays = (
            (self.corpus, self.row_ids)
            + ((self.slot_scale,) if self.quantized else ())
            + (
                (self.centroids, self.codebooks)
                if self.pq_m is not None else ()
            )
            + (
                (self.rotation,)
                if self.pq_m is not None and self.rotation is not None
                else ()
            )
        )
        with self._search_lock:
            key = ("exact", k, batch_size)
            fn = self._search_fns.get(key)
            if fn is None:
                inner = self._exact_callable(k, batch_size)
                if self.mesh is None:
                    fn = jax.jit(inner)
                else:
                    mesh = self.mesh
                    ext = (NamedSharding(mesh, P(DATA_AXIS)),) if self.quantized else ()
                    if self.pq_m is not None:
                        ext += (
                            NamedSharding(mesh, P(DATA_AXIS, None)),
                            NamedSharding(mesh, P()),
                        )
                        if self.rotation is not None:
                            ext += (NamedSharding(mesh, P()),)
                    fn = jax.jit(
                        inner,
                        in_shardings=(
                            NamedSharding(mesh, P(DATA_AXIS, None)),
                            NamedSharding(mesh, P(DATA_AXIS)),
                        ) + ext + (NamedSharding(mesh, P()),),
                        out_shardings=NamedSharding(mesh, P()),
                    )
                self._search_fns[key] = fn
        n_q = queries.shape[0]
        pending = []
        for lo in range(0, n_q, batch_size):
            block = queries[lo : lo + batch_size]
            real = block.shape[0]
            if real < batch_size:
                block = np.concatenate(
                    [block, np.zeros((batch_size - real, self.dim), np.float32)]
                )
            if self.mesh is not None and jax.process_count() > 1:
                block_dev = replicate_to_mesh(block, self.mesh)
            else:
                block_dev = jnp.asarray(block)
            scores, idx = fn(*arrays, block_dev)
            scores.copy_to_host_async()
            idx.copy_to_host_async()
            pending.append((scores, idx, real))
        return (
            np.concatenate([np.asarray(s)[:r] for s, _, r in pending]).astype(
                np.float32, copy=False
            ),
            np.concatenate([np.asarray(i)[:r] for _, i, r in pending]).astype(
                np.int32, copy=False
            ),
        )

    @property
    def ntotal(self) -> int:
        return self.n_total
