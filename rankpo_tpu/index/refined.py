"""Two-stage approximate inner-product index: PCA prefilter + exact rerank.

TPU-native analog of FAISS's ``IndexRefineFlat`` over a PCA-reduced coarse
index (FAISS composes this as ``IndexPreTransform(PCAMatrix, ...)`` +
``IndexRefineFlat``; the reference itself only ever builds ``IndexFlatIP``,
src/utils.py:38-56 — this index is the designed upgrade path for corpora
where the flat scan's FLOPs dominate serving cost).

Why this shape on TPU: the single-stage approx path (bf16 matmul +
``approx_max_k``) measured ~81% MXU-bound at [1024q, 1M, d1024] — more QPS
needs FEWER FLOPs. Stage 1 scores all N rows in a PCA-projected d' << D
space (d'/D of the FLOPs and bytes, still one big MXU matmul), keeps the
top-C candidate rows per query; stage 2 gathers those C full-width rows
(contiguous D-sized slices, far above the 128-byte gather-efficiency
floor) and reranks them exactly in fp32 accumulation. Both stages are
static-shape, jit-compiled, and shard over the data axis exactly like
``FlatIPIndex`` (each shard runs its own two-stage pass over its rows;
per-shard winners concat-merge, so gathers never cross shards).

Recall is DATA-DEPENDENT (PCA exploits spectrum decay; an isotropic
corpus is the worst case — measured sweep in
benchmarks/lowd_rerank_probe.py), so the candidate count is AUTO-TUNED at
build time: a held-out sample of corpus rows is searched exactly (at
storage precision) and C is raised along a doubling ladder until the
two-stage recall meets ``recall_target`` on the sample. Pass an integer
``candidates`` to skip tuning (one compile per ladder step otherwise).

Contract: approximate — scores of RETURNED hits are exact at storage
precision (fp32-accumulated rerank), but the hit SET may miss true
neighbors (recall target) and tie ORDER is not FAISS-bit-exact. Callers
needing FAISS-exact semantics use ``FlatIPIndex``.
"""

from __future__ import annotations

import logging
import threading
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rankpo_tpu.core.mesh import DATA_AXIS, replicate_to_mesh, shard_rows_to_mesh

logger = logging.getLogger(__name__)

NEG_INF = float("-inf")  # plain python at module scope (CLAUDE.md: a jnp
# scalar here would initialize the XLA backend at import time)

# auto-tune ladder: smallest C meeting recall_target on the held-out sample,
# doubling from max(2k, 128) up to max_candidates
TUNE_SAMPLE = 256
TUNE_K = 100


class RefineIPIndex:
    """PCA-prefiltered, exactly-reranked approximate IP index.

    Storage: projected corpus [N, d'] bf16 (stage 1) + full corpus [N, D]
    ``store_dtype`` (stage-2 rerank; bf16 default halves gather traffic and
    memory vs fp32 — rerank still accumulates fp32).
    """

    def __init__(
        self,
        embeddings,
        mesh: Optional[Mesh] = None,
        *,
        reduced_dim: int = 256,
        candidates: Union[int, str] = "auto",
        recall_target: float = 0.95,
        store_dtype=jnp.bfloat16,
        tune_sample: int = TUNE_SAMPLE,
        tune_k: int = TUNE_K,
        max_candidates: int = 4096,
        seed: int = 0,
    ):
        self.mesh = mesh
        self.n_total = int(embeddings.shape[0])
        self.dim = int(embeddings.shape[1])
        if not 0 < reduced_dim <= self.dim:
            raise ValueError(
                f"reduced_dim={reduced_dim} must be in (0, {self.dim}]"
            )
        self.reduced_dim = int(reduced_dim)
        self.recall_target = float(recall_target)
        if not jnp.issubdtype(jnp.dtype(store_dtype), jnp.floating):
            raise ValueError(
                f"store_dtype={store_dtype} must be a float type (rerank "
                "rows are stored as-is; int8 quantized storage is a "
                "FlatIPIndex option)"
            )
        self.store_dtype = store_dtype

        n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
        pad = (-self.n_total) % n_shards
        self.n_padded = self.n_total + pad
        self._shard_rows = self.n_padded // n_shards

        emb = np.asarray(embeddings, dtype=np.float32)
        if pad:
            emb = np.concatenate(
                [emb, np.zeros((pad, self.dim), np.float32)], axis=0
            )

        def put_rows(x):
            if mesh is None:
                return jax.device_put(jnp.asarray(x))
            return shard_rows_to_mesh(np.asarray(x), mesh)

        # PCA projection = top eigenvectors of the UNCENTERED corpus second
        # moment (inner-product search scores q.x; centering would shift
        # scores — cf. FAISS PCAMatrix): the [D, D] second moment reduces on
        # device (the only O(N)
        # matmul; rows are sharded, padding rows are zeros and contribute
        # nothing) with a REPLICATED output so every process can fetch it;
        # the tiny [D, D] eigh runs on the host — deterministic across
        # processes, and jnp.linalg.eigh over a sharded input would force
        # a gather anyway.
        self.corpus = put_rows(emb.astype(np.dtype(store_dtype)))
        cov_fn = jax.jit(
            lambda c: jnp.einsum(
                "nd,ne->de", c.astype(jnp.float32), c.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ),
            **(
                {}
                if mesh is None
                else {"out_shardings": NamedSharding(mesh, P())}
            ),
        )
        cov = np.asarray(cov_fn(self.corpus))
        _, v = np.linalg.eigh(cov)  # ascending eigenvalues
        proj = np.ascontiguousarray(v[:, -self.reduced_dim :], np.float32)
        self.proj = (
            jax.device_put(jnp.asarray(proj)) if mesh is None
            else replicate_to_mesh(proj, mesh)
        )
        low = (emb @ proj).astype(np.dtype(jnp.bfloat16))
        self.corpus_low = put_rows(low)

        self._n_valid_dev = self._put_n_valid()
        self._search_fns: dict = {}
        self._search_lock = threading.Lock()

        if candidates == "auto":
            rng = np.random.default_rng(seed)
            n_sample = min(tune_sample, self.n_total)
            sample_idx = rng.choice(
                self.n_total, size=n_sample, replace=False
            )
            # exact reference AT STORAGE PRECISION: what a perfect candidate
            # stage could possibly recover from the stored rows
            from rankpo_tpu.index.flat import FlatIPIndex

            exact = FlatIPIndex(
                np.asarray(
                    emb[: self.n_total].astype(np.dtype(self.store_dtype)),
                    dtype=np.float32,
                ),
                self.mesh,
            )
            self.candidates = self._tune_candidates(
                emb[sample_idx], exact, tune_k, max_candidates
            )
            del exact
        else:
            self.candidates = int(candidates)
            if self.candidates < 1:
                raise ValueError("candidates must be >= 1")

    # ------------------------------------------------------------------
    def _hit_shard_ranks(self, sample: np.ndarray, ref_idx: np.ndarray
                         ) -> np.ndarray:
        """[S, k] per-shard rank of each true hit in its query's PROJECTED
        score ordering — computed by ONE jitted chunked counting pass over
        ``corpus_low``. The candidate stage at count C admits exactly the
        rows with rank < C (per shard), so recall(C) for EVERY C follows
        from these ranks without compiling a search per ladder step
        (minutes each through a remote-compile setup)."""
        shard_rows = self._shard_rows
        n_padded = self.n_padded
        chunk = max(128, min(n_padded, (1 << 21) // max(len(sample), 1)))
        n_chunks = -(-n_padded // chunk)
        padded = n_chunks * chunk

        def ranks_fn(low, proj, queries, hit_ids):
            q_low = (queries.astype(jnp.float32) @ proj).astype(jnp.bfloat16)
            hit_rows = jnp.take(low, hit_ids, axis=0)  # [S, k, d']
            hs = jnp.einsum(
                "se,ske->sk", q_low, hit_rows,
                preferred_element_type=jnp.float32,
            )
            hit_shard = hit_ids // shard_rows
            low_p = jnp.pad(low, ((0, padded - n_padded), (0, 0)))

            def body(ci, counts):
                rows = lax.dynamic_slice_in_dim(low_p, ci * chunk, chunk)
                s1 = jnp.einsum(
                    "se,re->sr", q_low, rows,
                    preferred_element_type=jnp.float32,
                )  # [S, chunk]
                gidx = ci * chunk + lax.iota(jnp.int32, chunk)
                row_shard = gidx // shard_rows
                valid = gidx < n_padded
                above = (
                    (s1[:, None, :] > hs[:, :, None])
                    & (row_shard[None, None, :] == hit_shard[:, :, None])
                    & valid[None, None, :]
                )
                return counts + jnp.sum(above, axis=2, dtype=jnp.int32)

            return lax.fori_loop(
                0, n_chunks, body,
                jnp.zeros(hit_ids.shape, jnp.int32),
            )

        kwargs = {}
        if self.mesh is not None:
            kwargs = {
                "in_shardings": (
                    NamedSharding(self.mesh, P(DATA_AXIS, None)),
                    NamedSharding(self.mesh, P()),
                    NamedSharding(self.mesh, P()),
                    NamedSharding(self.mesh, P()),
                ),
                "out_shardings": NamedSharding(self.mesh, P()),
            }
        queries_dev = (
            replicate_to_mesh(sample.astype(np.float32), self.mesh)
            if self.mesh is not None and jax.process_count() > 1
            else jnp.asarray(sample, jnp.float32)
        )
        hits_dev = (
            replicate_to_mesh(ref_idx.astype(np.int32), self.mesh)
            if self.mesh is not None and jax.process_count() > 1
            else jnp.asarray(ref_idx, jnp.int32)
        )
        return np.asarray(
            jax.jit(ranks_fn, **kwargs)(
                self.corpus_low, self.proj, queries_dev, hits_dev
            )
        )

    def _tune_candidates(
        self, sample: np.ndarray, exact_index, k: int, max_candidates: int,
    ) -> int:
        """Smallest C whose two-stage recall meets ``recall_target``
        against ``exact_index`` (the storage-precision exact search) over
        ``sample`` pseudo-queries (corpus rows: biases recall slightly up —
        the self-hit is free — FAISS tunes nprobe the same way; pass
        ``candidates=<int>`` with an app-measured value when real query
        traffic is available).

        ANALYTIC, not a search ladder: one hit-rank pass yields recall(C)
        for every C at once (see ``_hit_shard_ranks``); the choice is then
        VERIFIED with a real search (``approx_max_k``'s own selection loss
        is invisible to the analysis) and bumped a bounded number of times
        if short."""
        k = min(k, self.n_total)
        n_sample = len(sample)
        cap = min(max_candidates, self.n_total)
        _, ref_idx = exact_index.search(sample, k=k)
        ref_sets = [set(row.tolist()) for row in ref_idx]

        need = self._hit_shard_ranks(sample, ref_idx).ravel()
        required = int(np.ceil(self.recall_target * need.size))
        if required <= 0:
            c = k
        else:
            c = int(np.partition(need, required - 1)[required - 1]) + 1
        c = max(c, max(2 * k, 128) // 2)  # sane floor for tiny ranks
        c = min(max(c, k), cap)
        logger.info(
            "RefineIPIndex tune (analytic): C=%d predicted recall=%.4f "
            "(target %.2f)",
            c, float((need < c).mean()), self.recall_target,
        )

        for _ in range(3):
            _, idx = self.search(sample, k=k, candidates=c)
            recall = float(
                np.mean([
                    len(set(idx[r].tolist()) & ref_sets[r]) / k
                    for r in range(n_sample)
                ])
            )
            logger.info(
                "RefineIPIndex tune (verify): C=%d recall=%.4f (target %.2f)",
                c, recall, self.recall_target,
            )
            if recall >= self.recall_target or c >= cap:
                break
            c = min(max(c + 1, int(c * 1.5)), cap)
        else:
            logger.warning(
                "RefineIPIndex: recall below target %.2f at C=%d after "
                "bounded verification — corpus spectrum may be too flat for "
                "reduced_dim=%d (raise it or use FlatIPIndex)",
                self.recall_target, c, self.reduced_dim,
            )
        return c

    # ------------------------------------------------------------------
    @classmethod
    def from_sharded(
        cls,
        embeddings,
        n_total: int,
        mesh: Optional[Mesh] = None,
        *,
        reduced_dim: int = 256,
        candidates: Union[int, str] = "auto",
        recall_target: float = 0.95,
        store_dtype=jnp.bfloat16,
        tune_sample: int = TUNE_SAMPLE,
        tune_k: int = TUNE_K,
        max_candidates: int = 4096,
        seed: int = 0,
    ) -> "RefineIPIndex":
        """Build from a DEVICE-RESIDENT row-sharded fp32 matrix (the
        ``InferenceEncoder.encode_sharded`` layout — see
        ``FlatIPIndex.from_sharded``). The second moment, projection matmul,
        dtype cast, and candidate tuning all run on device; the host only
        sees the [D, D] covariance (for eigh) and a [tune_sample, D] query
        probe."""
        from rankpo_tpu.index.flat import FlatIPIndex

        self = cls.__new__(cls)
        self.mesh = mesh
        self.n_total = int(n_total)
        self.n_padded = int(embeddings.shape[0])
        self.dim = int(embeddings.shape[1])
        if not 0 < reduced_dim <= self.dim:
            raise ValueError(
                f"reduced_dim={reduced_dim} must be in (0, {self.dim}]"
            )
        self.reduced_dim = int(reduced_dim)
        self.recall_target = float(recall_target)
        if not jnp.issubdtype(jnp.dtype(store_dtype), jnp.floating):
            raise ValueError(
                f"store_dtype={store_dtype} must be a float type"
            )
        self.store_dtype = store_dtype
        n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
        if self.n_padded % n_shards or self.n_padded < self.n_total:
            raise ValueError(
                f"sharded embeddings rows ({self.n_padded}) must be >= "
                f"n_total ({n_total}) and divisible by {n_shards} shards"
            )
        self._shard_rows = self.n_padded // n_shards

        row_kw = (
            {}
            if mesh is None
            else {"out_shardings": NamedSharding(mesh, P(DATA_AXIS, None))}
        )
        rep_kw = (
            {}
            if mesh is None
            else {"out_shardings": NamedSharding(mesh, P())}
        )
        self.corpus = jax.jit(
            lambda c: c.astype(jnp.dtype(store_dtype)), **row_kw
        )(embeddings)
        cov = np.asarray(
            jax.jit(
                lambda c: jnp.einsum(
                    "nd,ne->de", c, c, preferred_element_type=jnp.float32
                ),
                **rep_kw,
            )(embeddings)
        )
        _, v = np.linalg.eigh(cov)
        proj = np.ascontiguousarray(v[:, -self.reduced_dim :], np.float32)
        self.proj = (
            jax.device_put(jnp.asarray(proj)) if mesh is None
            else replicate_to_mesh(proj, mesh)
        )
        self.corpus_low = jax.jit(
            lambda c, p: (c @ p).astype(jnp.bfloat16), **row_kw
        )(embeddings, self.proj)

        self._n_valid_dev = self._put_n_valid()
        self._search_fns = {}
        self._search_lock = threading.Lock()

        if candidates == "auto":
            rng = np.random.default_rng(seed)
            n_sample = min(tune_sample, self.n_total)
            sample_idx = rng.choice(
                self.n_total, size=n_sample, replace=False
            )
            idx_dev = (
                replicate_to_mesh(sample_idx.astype(np.int32), mesh)
                if mesh is not None else jnp.asarray(sample_idx, jnp.int32)
            )
            # only the [n_sample, D] probe crosses to the host
            sample = np.asarray(
                jax.jit(
                    lambda c, i: jnp.take(c, i, axis=0), **rep_kw
                )(embeddings, idx_dev),
                np.float32,
            )
            exact = FlatIPIndex.from_sharded(
                jax.jit(
                    lambda c: c.astype(jnp.dtype(store_dtype)).astype(
                        jnp.float32
                    ),
                    **row_kw,
                )(embeddings),
                self.n_total,
                mesh,
            )
            self.candidates = self._tune_candidates(
                sample, exact, tune_k, max_candidates
            )
            del exact
        else:
            self.candidates = int(candidates)
            if self.candidates < 1:
                raise ValueError("candidates must be >= 1")
        return self

    # ------------------------------------------------------------------
    def _put_n_valid(self):
        """``n_total`` as a replicated device scalar riding
        ``search_arrays`` — cf. ``FlatIPIndex._put_n_valid``: programs read
        the valid-row count at run time, so shape-preserving mutations
        reuse compiled programs."""
        nv = np.asarray(self.n_total, np.int32)
        if self.mesh is None:
            return jnp.asarray(nv)
        return replicate_to_mesh(nv, self.mesh)

    def _clone_shell(self) -> "RefineIPIndex":
        """New index carrying this one's config, PCA basis, and tuned
        candidate count (not row storage) — mutations return NEW objects so
        in-flight searches on the old one stay valid."""
        out = RefineIPIndex.__new__(RefineIPIndex)
        out.mesh = self.mesh
        out.dim = self.dim
        out.reduced_dim = self.reduced_dim
        out.recall_target = self.recall_target
        out.store_dtype = self.store_dtype
        out.candidates = self.candidates
        out.proj = self.proj
        out._search_fns = {}
        out._search_lock = threading.Lock()
        return out

    def _row_kw(self):
        if self.mesh is None:
            return {}
        return {
            "out_shardings": (
                NamedSharding(self.mesh, P(DATA_AXIS, None)),
                NamedSharding(self.mesh, P(DATA_AXIS, None)),
            )
        }

    def _adopt_programs(self, src) -> None:
        """Share the compiled-program cache with the mutation source —
        valid on shape-preserving mutations because programs read all
        corpus state as arguments (cf. ``FlatIPIndex._adopt_programs``)."""
        self._search_fns = src._search_fns
        self._search_lock = src._search_lock

    def append_sharded(self, new_rows, n_new: int, *,
                       headroom: float = 0.0) -> "RefineIPIndex":
        """Append device-resident rows (``encode_sharded`` layout: fp32
        [n_buf, D], zero past ``n_new``) without a host round trip. The
        TRAINED PCA basis and tuned candidate count are reused — exactly
        FAISS ``IndexPreTransform.add`` semantics (the transform is fixed
        after train; it is NOT refit on add). New rows project through it
        on device; old stage-1/stage-2 rows ride over bit-exactly. Rows
        that fit the existing pad space take the shape-preserving path
        (compiled programs survive); otherwise storage grows with
        ``headroom`` pre-paid pad rows — cf. ``FlatIPIndex.append_sharded``."""
        from rankpo_tpu.index.flat import validate_append_args

        n_shards = self.mesh.shape[DATA_AXIS] if self.mesh is not None else 1
        n_new = validate_append_args(
            new_rows, n_new, headroom, self.dim, n_shards
        )
        out = self._clone_shell()
        out.n_total = self.n_total + n_new
        n_old = self.n_total
        store = jnp.dtype(self.store_dtype)

        if n_new <= self.n_padded - self.n_total:
            # shape-preserving fast path (cf. FlatIPIndex.append_sharded)
            out.n_padded = self.n_padded
            out._shard_rows = self._shard_rows
            out._n_valid_dev = out._put_n_valid()

            def place(rows_old, low_old, proj, rows_new):
                fresh = rows_new[:n_new]
                full = lax.dynamic_update_slice_in_dim(
                    rows_old, fresh.astype(store), n_old, 0
                )
                low = lax.dynamic_update_slice_in_dim(
                    low_old, (fresh @ proj).astype(jnp.bfloat16), n_old, 0
                )
                return full, low

            out.corpus, out.corpus_low = jax.jit(place, **self._row_kw())(
                self.corpus, self.corpus_low, self.proj, new_rows
            )
            out._adopt_programs(self)
            return out

        want = int(np.ceil(out.n_total * (1.0 + headroom)))
        out.n_padded = want + (-want) % n_shards
        out._shard_rows = out.n_padded // n_shards
        out._n_valid_dev = out._put_n_valid()
        pad = out.n_padded - out.n_total

        def merge(rows_old, low_old, proj, rows_new):
            fresh = rows_new[:n_new]
            full = jnp.pad(
                jnp.concatenate(
                    [rows_old[:n_old], fresh.astype(store)], axis=0
                ),
                ((0, pad), (0, 0)),
            )
            low = jnp.pad(
                jnp.concatenate(
                    [low_old[:n_old], (fresh @ proj).astype(jnp.bfloat16)],
                    axis=0,
                ),
                ((0, pad), (0, 0)),
            )
            return full, low

        out.corpus, out.corpus_low = jax.jit(merge, **self._row_kw())(
            self.corpus, self.corpus_low, self.proj, new_rows
        )
        return out

    def remove_rows(self, removed) -> "RefineIPIndex":
        """Drop rows by corpus position (FAISS ``remove_ids`` semantics:
        survivors shift down). Both storage tiers are gathered on device;
        the PCA basis and tuned candidate count stay fixed. The padded row
        count is KEPT (shapes preserved — compiled programs survive; freed
        rows become append headroom)."""
        removed = np.unique(np.asarray(removed, np.int64).reshape(-1))
        if removed.size == 0:
            return self
        if removed[0] < 0 or removed[-1] >= self.n_total:
            raise IndexError(
                f"remove ids must be in [0, {self.n_total}); got "
                f"[{removed[0]}, {removed[-1]}]"
            )
        keep = np.ones(self.n_total, bool)
        keep[removed] = False
        keep_idx = np.nonzero(keep)[0].astype(np.int32)
        if keep_idx.size == 0:
            raise ValueError("cannot remove every row; build a new index")
        out = self._clone_shell()
        out.n_total = int(keep_idx.size)
        out.n_padded = self.n_padded
        out._shard_rows = self._shard_rows
        out._n_valid_dev = out._put_n_valid()
        n_keep = out.n_total
        idx = np.concatenate(
            [keep_idx, np.zeros(out.n_padded - n_keep, np.int32)]
        )
        if self.mesh is not None and jax.process_count() > 1:
            idx_dev = replicate_to_mesh(idx, self.mesh)
        else:
            idx_dev = jnp.asarray(idx)

        def take(rows, low, i):
            valid = lax.iota(jnp.int32, i.shape[0]) < n_keep
            full = jnp.where(valid[:, None], jnp.take(rows, i, axis=0), 0)
            lo = jnp.where(valid[:, None], jnp.take(low, i, axis=0), 0)
            return full, lo

        out.corpus, out.corpus_low = jax.jit(take, **self._row_kw())(
            self.corpus, self.corpus_low, idx_dev
        )
        out._adopt_programs(self)
        return out

    @property
    def search_arrays(self) -> tuple:
        """Device arrays ``search_callable`` consumes, in order (the index
        protocol serving composes against: ``fn(*search_arrays, queries)``).
        The valid-row count rides as a replicated scalar (cf.
        ``_put_n_valid``)."""
        return (self.corpus, self.corpus_low, self.proj, self._n_valid_dev)

    def search_arg_shardings(self, mesh: Mesh) -> tuple:
        """NamedShardings for ``search_arrays`` (same protocol)."""
        return (
            NamedSharding(mesh, P(DATA_AXIS, None)),
            NamedSharding(mesh, P(DATA_AXIS, None)),
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P()),
        )

    def search_callable(self, k: int, candidates: Optional[int] = None,
                        *, selector: bool = False):
        """Unjitted ``(corpus, corpus_low, proj, n_valid, queries) ->
        (scores, idx)`` for composing into larger jitted programs (serving
        fuses encode+search into one dispatch).

        ``selector=True`` builds the FILTERED variant (IDSelector analog):
        a trailing bool [n_padded] eligibility mask (row-sharded) joins the
        signature. The stage-1 prefilter selects its top-C among ELIGIBLE
        rows only — filtering before selection, not after — so the rerank
        pool is not wasted on excluded rows and the tuned recall target
        carries over to filtered searches."""
        c_cand = int(candidates if candidates is not None else self.candidates)
        c_cand = max(c_cand, k)
        mesh = self.mesh

        def two_stage(corpus_rows, low_rows, proj, queries, n_valid, offset,
                      sel):
            """One shard's (or the whole, mesh=None) two-stage pass."""
            n_rows = low_rows.shape[0]
            cc = min(c_cand, n_rows)
            kk = min(k, n_rows)
            q_low = (queries.astype(jnp.float32) @ proj).astype(jnp.bfloat16)
            s1 = jnp.einsum(
                "qd,nd->qn", q_low, low_rows,
                preferred_element_type=jnp.bfloat16,
            )
            col = jax.lax.broadcasted_iota(jnp.int32, s1.shape, dimension=1)
            s1 = jnp.where(col < n_valid, s1, jnp.asarray(NEG_INF, s1.dtype))
            if sel is not None:
                s1 = jnp.where(
                    sel[None, :], s1, jnp.asarray(NEG_INF, s1.dtype)
                )
            # the 0.95 here is approx_max_k's OWN selection recall on the
            # projected scores; the build-time tuner measures the COMPOUND
            # (projection x selection) recall, so C self-corrects for it
            _, cand = jax.lax.approx_max_k(
                s1, cc, recall_target=0.95, aggregate_to_topk=True
            )
            rows = jnp.take(corpus_rows, cand, axis=0)  # [Q, cc, D]
            from rankpo_tpu.ops.topk import storage_exact_precision

            s2 = jnp.einsum(
                "qd,qcd->qc", queries.astype(rows.dtype), rows,
                preferred_element_type=jnp.float32,
                precision=storage_exact_precision(rows.dtype),
            )
            # padding rows can reach the candidate list only when the shard
            # has fewer than cc valid rows; mask them out of the rerank
            s2 = jnp.where(cand < n_valid, s2, NEG_INF)
            if sel is not None:
                # candidates may still include ineligible rows when fewer
                # than cc eligible rows exist in this shard
                s2 = jnp.where(jnp.take(sel, cand, axis=0), s2, NEG_INF)
            top_s, pos = jax.lax.top_k(s2, kk)
            top_i = jnp.take_along_axis(cand, pos, axis=1)
            return top_s, top_i + jnp.int32(offset)

        if mesh is None:

            if selector:

                def single_sel(corpus_arg, low_arg, proj_arg, n_valid,
                               queries, sel):
                    return two_stage(
                        corpus_arg, low_arg, proj_arg, queries, n_valid, 0,
                        sel,
                    )

                return single_sel

            def single(corpus_arg, low_arg, proj_arg, n_valid, queries):
                return two_stage(
                    corpus_arg, low_arg, proj_arg, queries, n_valid, 0, None
                )

            return single

        shard_rows = self._shard_rows

        def per_shard(corpus_local, low_local, proj_arg, n_valid, queries,
                      *sel):
            shard_id = jax.lax.axis_index(DATA_AXIS)
            offset = shard_id * shard_rows
            n_valid_local = jnp.clip(n_valid - offset, 0, shard_rows)
            return two_stage(
                corpus_local, low_local, proj_arg, queries,
                n_valid_local, offset, sel[0] if sel else None,
            )

        sel_spec = (P(DATA_AXIS),) if selector else ()
        shard_fn = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), P(), P(), P())
            + sel_spec,
            out_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS)),
        )

        # k clamp against the PADDED row count (static by shape): callers
        # clamp k <= n_total host-side; baking n_total here would tie the
        # compiled program to one corpus size
        k_out = min(k, self.n_padded)

        def sharded(corpus_arg, low_arg, proj_arg, n_valid, queries, *sel):
            cand_scores, cand_idx = shard_fn(
                corpus_arg, low_arg, proj_arg, n_valid, queries, *sel
            )
            final_scores, pos = jax.lax.top_k(cand_scores, k_out)
            final_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
            return final_scores, final_idx

        return sharded

    def _build_search(self, k: int, candidates: int, *,
                      selector: bool = False):
        fn = self.search_callable(k, candidates, selector=selector)
        if self.mesh is None:
            return jax.jit(fn)
        mesh = self.mesh
        sel_shard = (
            (NamedSharding(mesh, P(DATA_AXIS)),) if selector else ()
        )
        return jax.jit(
            fn,
            in_shardings=self.search_arg_shardings(mesh)
            + (NamedSharding(mesh, P()),)
            + sel_shard,
            out_shardings=NamedSharding(mesh, P()),
        )

    def _place_selector(self, mask: np.ndarray):
        """Pad a bool [n_total] eligibility mask to the padded row count and
        shard it like the rows (pad rows ineligible)."""
        padded = np.zeros(self.n_padded, np.bool_)
        padded[: self.n_total] = mask
        if self.mesh is None:
            return jnp.asarray(padded)
        from rankpo_tpu.core.mesh import shard_rows_to_mesh

        return shard_rows_to_mesh(padded, self.mesh)

    def search(
        self,
        queries,
        k: int = 100,
        batch_size: int = 256,
        candidates: Optional[int] = None,
        *,
        allowed_ids=None,
        disallowed_ids=None,
        selector=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched two-stage search. Returns fp32 scores and int32 indices,
        shapes [Q, k] — same surface as ``FlatIPIndex.search``, including
        the ``allowed_ids``/``disallowed_ids``/``selector`` filter kwargs
        (FAISS IDSelector analog; unfillable tail padded score -inf /
        index -1). The stage-1 prefilter applies the filter BEFORE
        candidate selection (see ``search_callable``)."""
        from rankpo_tpu.index.flat import (
            build_selector_mask,
            mask_filtered_misses,
        )

        k = min(k, self.n_total)
        c_used = int(candidates if candidates is not None else self.candidates)
        c_used = max(c_used, k)
        queries = np.asarray(queries, np.float32)
        sel_mask = build_selector_mask(
            self.n_total, allowed_ids, disallowed_ids, selector
        )
        if queries.shape[0] == 0:
            return (
                np.zeros((0, k), np.float32),
                np.zeros((0, k), np.int32),
            )
        with self._search_lock:
            key = (k, c_used, sel_mask is not None)
            search_fn = self._search_fns.get(key)
            if search_fn is None:
                search_fn = self._search_fns[key] = self._build_search(
                    k, c_used, selector=sel_mask is not None
                )
        sel_args = ()
        if sel_mask is not None:
            sel_args = (self._place_selector(sel_mask),)
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
            scores, idx = search_fn(
                self.corpus, self.corpus_low, self.proj, self._n_valid_dev,
                block_dev, *sel_args,
            )
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

    def reconstruct(self, ids) -> np.ndarray:
        """Stored rerank rows for corpus ids, decoded to fp32 — FAISS
        ``reconstruct_batch`` analog. Rows come from the full-dimension
        stage-2 storage at storage precision (bf16 default), not the
        projected prefilter."""
        from rankpo_tpu.index.flat import (
            _canonical_recon_ids,
            _chunked_row_gather,
        )

        ids = _canonical_recon_ids(ids, self.n_total)
        if ids.size == 0:
            return np.zeros((0, self.dim), np.float32)
        with self._search_lock:
            fn = self._search_fns.get("reconstruct")
            if fn is None:
                def gather(corpus, idx):
                    return jnp.take(corpus, idx, axis=0).astype(jnp.float32)

                if self.mesh is None:
                    fn = jax.jit(gather)
                else:
                    fn = jax.jit(
                        gather,
                        in_shardings=(
                            NamedSharding(self.mesh, P(DATA_AXIS, None)),
                            NamedSharding(self.mesh, P()),
                        ),
                        out_shardings=NamedSharding(self.mesh, P()),
                    )
                self._search_fns["reconstruct"] = fn
        return _chunked_row_gather(fn, (self.corpus,), ids, self.mesh)

    @property
    def ntotal(self) -> int:
        return self.n_total
