"""Exact brute-force inner-product retrieval on the device mesh.

TPU-native replacement for FAISS ``IndexFlatIP`` (reference: src/utils.py:38-80
create_faiss_index/faiss_search; consumed by evaluate.py:214-225 and
get_hard_negatives.py:229-243). This is the BASELINE.json centerpiece: the
corpus embedding matrix lives in HBM sharded over the data axis, queries are
replicated, and search is a sharded matmul + per-shard top-k + cross-shard
merge — one code path serving evaluation, hard-negative mining, and pod-scale
query serving.

Exactness & tie-breaking: scores are fp32; ``lax.top_k`` breaks ties by lowest
index, and the cross-shard merge concatenates per-shard candidates in ascending
global-index order, so the final ranking also prefers the lowest global index —
matching FAISS's deterministic heap behavior closely enough for bit-identical
metrics (verified in tests against a numpy oracle).

The compute core is the XLA path in rankpo_tpu/ops/topk.py: a dense
matmul under a score-matrix memory budget (chunked above it), with exact
top-k via the two-pass block-max prefilter (exact_topk_blockmax) and a
``recall_target`` knob for the approx serving mode. A fused Pallas kernel was
implemented, PROFILED, and rejected — Mosaic has no sort/top_k lowering and
XLA's approx path is already matmul-bound; the measured decision record and
the (closed) gate live in rankpo_tpu/ops/topk_pallas.py.
"""

from __future__ import annotations

import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rankpo_tpu.core.mesh import DATA_AXIS, replicate_to_mesh, shard_rows_to_mesh

NEG_INF = float("-inf")  # plain python: a module-level jnp scalar would initialize
# the XLA backend at import time, breaking jax.distributed.initialize in CLIs


def validate_append_args(new_rows, n_new, headroom, dim, n_shards) -> int:
    """The shared argument contract of every tier's ``append_sharded``
    (flat/refine/IVF): ``new_rows`` must be the ``encode_sharded`` layout —
    [n_buf >= n_new, dim] with n_buf divisible by the shard count — and the
    knobs in range. One copy so the three tiers cannot drift."""
    n_new = int(n_new)
    if n_new < 1:
        raise ValueError("append_sharded needs n_new >= 1")
    if headroom < 0.0:
        raise ValueError("headroom must be >= 0")
    if int(new_rows.shape[1]) != dim:
        raise ValueError(
            f"new rows dim {new_rows.shape[1]} != index dim {dim}"
        )
    if int(new_rows.shape[0]) < n_new or int(new_rows.shape[0]) % n_shards:
        raise ValueError(
            f"new rows buffer ({new_rows.shape[0]}) must be >= n_new "
            f"({n_new}) and divisible by {n_shards} shards"
        )
    return n_new


def quantize_rows_int8(rows):
    """The ONE device-side int8 row codec: symmetric per-row max-abs
    quantization, scale floored at 1e-12 (zero rows quantize to zero
    codes), codes clipped/rounded to +-127. Every site that encodes rows —
    flat/IVF builds, device mutations — must call this: the scheme is
    parity-critical (dequant fuses into the search matmul; appended rows
    must quantize IDENTICALLY to built rows or the bit-exact-ride-over
    contract of the mutation paths silently breaks). Returns
    ``(codes int8 [N, D], scale fp32 [N])``."""
    rows = rows.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(rows), axis=1) / 127.0, 1e-12)
    codes = jnp.clip(
        jnp.round(rows / scale[:, None]), -127, 127
    ).astype(jnp.int8)
    return codes, scale.astype(jnp.float32)

_RECON_BATCH = 1024  # fixed reconstruct-gather batch: one compiled program
# regardless of how many ids a caller asks for


def build_selector_mask(
    n_total: int,
    allowed_ids=None,
    disallowed_ids=None,
    selector=None,
) -> Optional[np.ndarray]:
    """The FAISS ``IDSelector`` analog, shared by every index tier: turn a
    per-search filter into a bool eligibility mask over corpus positions
    (True = row may be returned). At most one of the three may be given:

    - ``allowed_ids``: only these positions are eligible (IDSelectorBatch /
      IDSelectorArray);
    - ``disallowed_ids``: these positions are excluded (IDSelectorNot);
    - ``selector``: a prebuilt bool [n_total] mask (arbitrary predicates —
      what FAISS expresses via custom IDSelector subclasses; serving uses
      this for external-id translation in stable_ids mode).

    Returns None when no filter is given (the unfiltered fast path keeps
    its own compiled programs). On TPU the mask costs ONE where-select on
    the score matrix before top-k — there is no FAISS-style per-row branch
    in the scan loop to skip, so filtered search runs at unfiltered speed.
    """
    given = [x is not None for x in (allowed_ids, disallowed_ids, selector)]
    if sum(given) == 0:
        return None
    if sum(given) > 1:
        raise ValueError(
            "give at most one of allowed_ids / disallowed_ids / selector"
        )
    if selector is not None:
        mask = np.asarray(selector)
        if mask.dtype != np.bool_ or mask.shape != (n_total,):
            raise ValueError(
                f"selector must be a bool array of shape ({n_total},); got "
                f"{mask.dtype} {mask.shape}"
            )
        return mask.copy()
    ids = np.asarray(
        allowed_ids if allowed_ids is not None else disallowed_ids, np.int64
    ).reshape(-1)
    if ids.size and (ids.min() < 0 or ids.max() >= n_total):
        raise IndexError(
            f"selector ids must be in [0, {n_total}); got "
            f"[{ids.min()}, {ids.max()}]"
        )
    if allowed_ids is not None:
        mask = np.zeros(n_total, np.bool_)
        mask[ids] = True
    else:
        mask = np.ones(n_total, np.bool_)
        mask[ids] = False
    return mask


def mask_filtered_misses(
    scores: np.ndarray, indices: np.ndarray
) -> np.ndarray:
    """FAISS pads a filtered search's unfillable tail with label -1; the
    engine surfaces masked rows as score -inf with their real index.
    Rewrite those to -1 host-side (shared by every tier's filtered path)."""
    return np.where(np.isfinite(scores), indices, -1).astype(
        indices.dtype, copy=False
    )


def _canonical_recon_ids(ids, n_total: int) -> np.ndarray:
    """Canonicalize a reconstruct id argument (scalar or 1-D, int64,
    bounds-checked). Shared by every index tier's ``reconstruct``."""
    ids = np.atleast_1d(np.asarray(ids, np.int64))
    if ids.ndim != 1:
        raise ValueError("ids must be a scalar or 1-D sequence")
    if ids.size and (ids.min() < 0 or ids.max() >= n_total):
        raise IndexError(
            f"ids must be in [0, {n_total}); got [{ids.min()}, {ids.max()}]"
        )
    return ids


def _chunked_row_gather(fn, arrays: tuple, idx: np.ndarray, mesh) -> np.ndarray:
    """Drive a jitted row-gather ``fn(*arrays, idx_chunk) -> rows`` over
    fixed ``_RECON_BATCH`` chunks: pad each chunk to the full batch (one
    compiled program for any len(idx)), replicate the chunk to the mesh in
    multi-process runs (a host-local array is not addressable mesh-wide),
    and slice the pad rows back off. Shared by the flat/IVF/refine tiers so
    the batching discipline lives in exactly one place."""
    out = []
    for lo in range(0, idx.size, _RECON_BATCH):
        chunk = idx[lo : lo + _RECON_BATCH].astype(np.int32)
        real = chunk.size
        if real < _RECON_BATCH:
            chunk = np.concatenate(
                [chunk, np.zeros(_RECON_BATCH - real, np.int32)]
            )
        if mesh is not None and jax.process_count() > 1:
            idx_dev = replicate_to_mesh(chunk, mesh)
        else:
            idx_dev = jnp.asarray(chunk)
        out.append(np.asarray(fn(*arrays, idx_dev))[:real])
    return np.concatenate(out).astype(np.float32, copy=False)


def numpy_search(
    corpus: np.ndarray, queries: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side oracle with FAISS IndexFlatIP semantics: exact IP scores,
    descending, ties broken by lower corpus index. Used for parity tests and
    as the CPU baseline in benchmarks."""
    scores = queries.astype(np.float32) @ corpus.astype(np.float32).T
    k = min(k, corpus.shape[0])
    # stable descending sort: equal scores keep ascending-index order — the
    # FAISS boundary-tie rule. (An argpartition prefilter is NOT tie-safe:
    # it admits an arbitrary subset of a tie group straddling the k boundary,
    # dropping lower-index members the final sort can never recover.)
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    out_scores = np.take_along_axis(scores, order, axis=1)
    return out_scores, order.astype(np.int64)


class FlatIPIndex:
    """Sharded exact inner-product index.

    corpus embeddings: [N, D]; stored padded to a multiple of the shard count
    (padded rows scored -inf so they never surface).
    """

    def __init__(
        self,
        embeddings,
        mesh: Optional[Mesh] = None,
        *,
        dtype=jnp.float32,
        recall_target: float = 1.0,
        precision: Optional[str] = None,
    ):
        """recall_target < 1.0 trades exactness for throughput via the TPU
        PartialReduce top-k (serving mode); 1.0 keeps FAISS-exact semantics.

        dtype: fp32 (exact-parity default), bf16 (2x memory), or jnp.int8
        (4x memory, symmetric per-row max-abs quantization — scores are
        rescaled after the int8 matmul; a serving-mode accuracy trade)."""
        self.mesh = mesh
        self.recall_target = recall_target
        # None: fp32-faithful scores in exact mode, fast bf16-pass in approx
        # serving mode (see ops/topk.py dense_matmul_topk)
        self.precision = precision
        self.n_total = int(embeddings.shape[0])
        self.dim = int(embeddings.shape[1])
        self.dtype = dtype

        n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
        pad = (-self.n_total) % n_shards
        self.n_padded = self.n_total + pad

        emb = np.asarray(embeddings, dtype=np.float32)
        if pad:
            emb = np.concatenate(
                [emb, np.zeros((pad, self.dim), np.float32)], axis=0
            )
        def put_rows(x):
            # row-sharded placement that also works when the mesh spans
            # multiple processes (every host holds the full array)
            if mesh is None:
                return jax.device_put(jnp.asarray(x))
            return shard_rows_to_mesh(np.asarray(x), mesh)

        self.quantized = dtype == jnp.int8
        if self.quantized:
            scale = np.abs(emb).max(axis=1, keepdims=True) / 127.0
            scale = np.maximum(scale, 1e-12)
            q = np.clip(np.round(emb / scale), -127, 127).astype(np.int8)
            self.corpus = put_rows(q)
            self.row_scale = put_rows(scale[:, 0].astype(np.float32))
        else:
            self.corpus = put_rows(emb.astype(np.dtype(dtype)))
            self.row_scale = None
        self._n_valid_dev = self._put_n_valid()
        # compiled search per k (serving mixes k values across threads; a
        # single-slot cache would both recompile on every flip and race)
        self._search_fns: dict = {}
        self._search_lock = threading.Lock()

    def _put_n_valid(self):
        """``n_total`` as a replicated device scalar: search programs read
        the valid-row count at RUN time (an argument via ``search_arrays``),
        so a mutation that keeps storage shapes — append into pad headroom,
        remove without shrink — reuses compiled programs instead of paying
        a recompile (minutes through a remote-compile setup)."""
        nv = np.asarray(self.n_total, np.int32)
        if self.mesh is None:
            return jnp.asarray(nv)
        return replicate_to_mesh(nv, self.mesh)

    # ------------------------------------------------------------------
    @classmethod
    def from_sharded(
        cls,
        embeddings,
        n_total: int,
        mesh: Optional[Mesh] = None,
        *,
        dtype=jnp.float32,
        recall_target: float = 1.0,
        precision: Optional[str] = None,
    ) -> "FlatIPIndex":
        """Build from a DEVICE-RESIDENT row-sharded fp32 matrix (the
        ``InferenceEncoder.encode_sharded`` layout: [n_buf, D] with n_buf
        divisible by the data-axis shard count and zero rows past
        ``n_total``) — no host round trip, no O(N*D) host RAM. Casting and
        int8 quantization run as sharded device programs."""
        import jax

        self = cls.__new__(cls)
        self.mesh = mesh
        self.recall_target = recall_target
        self.precision = precision
        self.n_total = int(n_total)
        self.n_padded = int(embeddings.shape[0])
        self.dim = int(embeddings.shape[1])
        self.dtype = dtype
        n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
        if self.n_padded % n_shards or self.n_padded < self.n_total:
            raise ValueError(
                f"sharded embeddings rows ({self.n_padded}) must be >= "
                f"n_total ({n_total}) and divisible by {n_shards} shards"
            )

        row_sharding = (
            NamedSharding(mesh, P(DATA_AXIS, None)) if mesh is not None
            else None
        )
        def shard_kw(spec=None):
            if mesh is None:
                return {}
            return {"out_shardings": NamedSharding(mesh, spec or P(DATA_AXIS, None))}

        self.quantized = dtype == jnp.int8
        if self.quantized:
            self.corpus, self.row_scale = jax.jit(
                quantize_rows_int8,
                **(
                    {}
                    if mesh is None
                    else {
                        "out_shardings": (
                            row_sharding,
                            NamedSharding(mesh, P(DATA_AXIS)),
                        )
                    }
                ),
            )(embeddings)
        else:
            self.corpus = jax.jit(
                lambda c: c.astype(jnp.dtype(dtype)), **shard_kw()
            )(embeddings)
            self.row_scale = None
        self._n_valid_dev = self._put_n_valid()
        self._search_fns = {}
        self._search_lock = threading.Lock()
        return self

    # ------------------------------------------------------------------
    def _clone_shell(self) -> "FlatIPIndex":
        """New index object carrying this one's config (not storage):
        mutations return NEW objects so in-flight searches holding the old
        index keep working on its (immutable) arrays."""
        out = FlatIPIndex.__new__(FlatIPIndex)
        out.mesh = self.mesh
        out.recall_target = self.recall_target
        out.precision = self.precision
        out.dim = self.dim
        out.dtype = self.dtype
        out.quantized = self.quantized
        out._search_fns = {}
        out._search_lock = threading.Lock()
        return out

    def _storage_shard_kw(self):
        """out_shardings for (rows, per-row scalar) storage programs."""
        if self.mesh is None:
            return {}, {}
        rows = {"out_shardings": NamedSharding(self.mesh, P(DATA_AXIS, None))}
        both = {
            "out_shardings": (
                NamedSharding(self.mesh, P(DATA_AXIS, None)),
                NamedSharding(self.mesh, P(DATA_AXIS)),
            )
        }
        return rows, both

    def _adopt_programs(self, src) -> None:
        """Share the compiled-program cache with the index this one was
        mutated from. Every cached program reads ALL corpus state (storage,
        scales, the valid-row count) as arguments, so it stays valid as
        long as storage shapes/dtypes and the baked static knobs are
        unchanged — callers only adopt on shape-preserving mutations, and
        the clone carries the knobs. This is what makes mutations cheap in
        serving: no per-bucket recompile (minutes each through a
        remote-compile setup), no rewarm."""
        self._search_fns = src._search_fns
        self._search_lock = src._search_lock

    def append_sharded(self, new_rows, n_new: int, *,
                       headroom: float = 0.0) -> "FlatIPIndex":
        """Append device-resident rows — the FAISS ``index.add`` analog
        WITHOUT the host round trip (cf. the serving layer's former
        fetch-concat-rebuild, an O(N*D) fp32 host copy). ``new_rows`` is
        the ``InferenceEncoder.encode_sharded`` layout: fp32 [n_buf, D],
        n_buf divisible by the shard count, zero rows past ``n_new``.

        Existing rows ride over BIT-EXACTLY (int8 codes and their per-row
        scales are sliced, never dequantized); only the new rows are
        cast/quantized, on device. When the new rows FIT the existing pad
        rows, storage shapes are preserved and every compiled search
        program survives (``_adopt_programs``); otherwise storage grows to
        ``(n_total + n_new) * (1 + headroom)`` — the headroom pre-pays pad
        rows so FOLLOWING appends take the shape-preserving path. Returns
        a NEW index; peak device memory is old+new storage during the copy
        (storage arrays are immutable — donation would invalidate
        in-flight searches)."""
        n_shards = self.mesh.shape[DATA_AXIS] if self.mesh is not None else 1
        n_new = validate_append_args(
            new_rows, n_new, headroom, self.dim, n_shards
        )
        out = self._clone_shell()
        out.n_total = self.n_total + n_new
        n_old = self.n_total
        row_kw, both_kw = self._storage_shard_kw()

        if n_new <= self.n_padded - self.n_total:
            # shape-preserving fast path: write into the existing pad rows
            # (a contiguous static-offset update) — compiled programs and
            # serving's fused programs stay valid, only n_valid moves
            out.n_padded = self.n_padded
            out._n_valid_dev = out._put_n_valid()

            if self.quantized:

                def place_q(codes, scales, rows):
                    q, s = quantize_rows_int8(rows[:n_new])
                    return (
                        lax.dynamic_update_slice_in_dim(codes, q, n_old, 0),
                        lax.dynamic_update_slice_in_dim(scales, s, n_old, 0),
                    )

                out.corpus, out.row_scale = jax.jit(place_q, **both_kw)(
                    self.corpus, self.row_scale, new_rows
                )
            else:
                store = jnp.dtype(self.dtype)

                def place(rows_old, rows_new):
                    return lax.dynamic_update_slice_in_dim(
                        rows_old, rows_new[:n_new].astype(store), n_old, 0
                    )

                out.corpus = jax.jit(place, **row_kw)(self.corpus, new_rows)
                out.row_scale = None
            out._adopt_programs(self)
            return out

        want = int(np.ceil(out.n_total * (1.0 + headroom)))
        out.n_padded = want + (-want) % n_shards
        out._n_valid_dev = out._put_n_valid()
        pad = out.n_padded - out.n_total

        if self.quantized:

            def merge_q(codes, scales, rows):
                q, s = quantize_rows_int8(rows[:n_new])
                merged = jnp.concatenate([codes[:n_old], q], axis=0)
                sc = jnp.concatenate([scales[:n_old], s])
                return (
                    jnp.pad(merged, ((0, pad), (0, 0))),
                    jnp.pad(sc, (0, pad), constant_values=1e-12),
                )

            out.corpus, out.row_scale = jax.jit(merge_q, **both_kw)(
                self.corpus, self.row_scale, new_rows
            )
        else:
            store = jnp.dtype(self.dtype)

            def merge(rows_old, rows_new):
                merged = jnp.concatenate(
                    [rows_old[:n_old], rows_new[:n_new].astype(store)],
                    axis=0,
                )
                return jnp.pad(merged, ((0, pad), (0, 0)))

            out.corpus = jax.jit(merge, **row_kw)(self.corpus, new_rows)
            out.row_scale = None
        return out

    def remove_rows(self, removed) -> "FlatIPIndex":
        """Drop rows by corpus position — the FAISS ``remove_ids`` compact
        on device (surviving positions shift down, as FAISS renumbers).
        int8 codes and scales are gathered, never requantized. The padded
        row count is KEPT, so storage shapes are preserved and compiled
        programs survive (``_adopt_programs``); the freed rows become pad
        headroom for later appends. Returns a NEW index (see
        ``append_sharded`` for the immutability contract)."""
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
        out._n_valid_dev = out._put_n_valid()
        n_keep = out.n_total
        idx = np.concatenate(
            [keep_idx, np.zeros(out.n_padded - n_keep, np.int32)]
        )
        if self.mesh is not None and jax.process_count() > 1:
            idx_dev = replicate_to_mesh(idx, self.mesh)
        else:
            idx_dev = jnp.asarray(idx)
        row_kw, both_kw = self._storage_shard_kw()

        if self.quantized:

            def take_q(codes, scales, i):
                valid = lax.iota(jnp.int32, i.shape[0]) < n_keep
                c = jnp.where(
                    valid[:, None], jnp.take(codes, i, axis=0), 0
                )
                s = jnp.where(
                    valid, jnp.take(scales, i), jnp.float32(1e-12)
                )
                return c, s

            out.corpus, out.row_scale = jax.jit(take_q, **both_kw)(
                self.corpus, self.row_scale, idx_dev
            )
        else:

            def take(rows, i):
                valid = lax.iota(jnp.int32, i.shape[0]) < n_keep
                return jnp.where(
                    valid[:, None], jnp.take(rows, i, axis=0), 0
                )

            out.corpus = jax.jit(take, **row_kw)(self.corpus, idx_dev)
            out.row_scale = None
        out._adopt_programs(self)
        return out

    @property
    def search_arrays(self) -> tuple:
        """Device arrays ``search_callable`` consumes, in order (the index
        protocol serving composes against: ``fn(*search_arrays, queries)``).
        Arrays ride jitted programs as ARGUMENTS, never closures. The valid
        row count is one of them (a replicated scalar) — see
        ``_put_n_valid`` — so compiled programs survive shape-preserving
        mutations."""
        return (self.corpus, self.row_scale, self._n_valid_dev)

    def search_arg_shardings(self, mesh: Mesh) -> tuple:
        """NamedShardings for ``search_arrays`` (same protocol)."""
        return (
            NamedSharding(mesh, P(DATA_AXIS, None)),
            NamedSharding(mesh, P(DATA_AXIS)) if self.quantized
            else NamedSharding(mesh, P()),
            NamedSharding(mesh, P()),
        )

    def search_callable(self, k: int, *, selector: bool = False):
        """The unjitted search computation ``(corpus, row_scale, n_valid,
        queries) -> (scores, idx)``, for composing into LARGER jitted
        programs (the serving path fuses encode+search into one dispatch;
        through a ~25-30ms-floor remote tunnel the second dispatch was pure
        latency). ``queries`` may be any float dtype; it is cast to the
        corpus compute dtype inside.

        ``selector=True`` builds the FILTERED variant (IDSelector analog):
        the signature gains a trailing bool [n_padded] eligibility mask
        (row-sharded like the corpus); masked rows score -inf."""
        from rankpo_tpu.ops.topk import matmul_topk

        mesh = self.mesh

        # queries compute in the corpus dtype, except int8 storage where they
        # stay bf16 and the corpus dequant fuses into the matmul
        def q_cast(queries, corpus_arg):
            if corpus_arg.dtype == jnp.int8:
                return queries.astype(jnp.bfloat16)
            return queries.astype(corpus_arg.dtype)

        # NOTE: the corpus is a jit ARGUMENT, never a closure capture — a
        # captured array becomes an HLO constant, which ships the whole index
        # to the compiler (and breaks remote-compile setups on >100MB corpora).
        if mesh is None:

            def single(corpus_arg, col_scale, n_valid, queries, sel=None):
                return matmul_topk(
                    q_cast(queries, corpus_arg),
                    corpus_arg,
                    k=k,
                    n_valid=n_valid,
                    recall_target=self.recall_target,
                    col_scale=col_scale,
                    precision=self.precision,
                    row_mask=sel,
                )

            if selector:
                return single

            def single_plain(corpus_arg, col_scale, n_valid, queries):
                return single(corpus_arg, col_scale, n_valid, queries)

            return single_plain

        n_shards = mesh.shape[DATA_AXIS]
        shard_rows = self.n_padded // n_shards
        k_local = min(k, shard_rows)

        def per_shard(corpus_local, scale_local, n_valid, queries, sel_local):
            # corpus_local: this shard's [n_padded/W, D] slice
            shard_id = jax.lax.axis_index(DATA_AXIS)
            offset = shard_id * shard_rows
            n_valid_local = jnp.clip(n_valid - offset, 0, shard_rows)
            scores, idx = matmul_topk(
                q_cast(queries, corpus_local),
                corpus_local,
                k=k_local,
                n_valid=n_valid_local,
                index_offset=offset,
                recall_target=self.recall_target,
                col_scale=scale_local,
                precision=self.precision,
                row_mask=sel_local,
            )
            return scores, idx

        # shard_map body variants: the scale and the selector mask exist
        # only in some configurations, and absent args cannot ride specs
        scale_spec = (P(DATA_AXIS),) if self.quantized else ()
        sel_spec = (P(DATA_AXIS),) if selector else ()

        def body(corpus_local, *rest):
            rest = list(rest)
            scale_local = rest.pop(0) if self.quantized else None
            sel_local = rest.pop() if selector else None
            n_valid, queries = rest
            return per_shard(
                corpus_local, scale_local, n_valid, queries, sel_local
            )

        shard_fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None),) + scale_spec + (P(), P())
            + sel_spec,
            out_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS)),
        )

        def sharded(corpus_arg, col_scale, n_valid, queries, *sel):
            # per-shard candidates concatenated in ascending-shard (ascending
            # global index) order: [Q, W*k_local]
            args = (corpus_arg,)
            if self.quantized:
                args += (col_scale,)
            args += (n_valid, queries) + sel
            cand_scores, cand_idx = shard_fn(*args)
            final_scores, pos = jax.lax.top_k(cand_scores, k)
            final_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
            return final_scores, final_idx

        return sharded

    def _build_search(self, k: int, *, selector: bool = False):
        fn = self.search_callable(k, selector=selector)
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
            # replicated results: every process fetches the full [Q, k] arrays
            out_shardings=NamedSharding(mesh, P()),
        )

    def _place_selector(self, mask: np.ndarray):
        """Pad a bool [n_total] eligibility mask to the padded row count and
        shard it like the corpus rows (pad rows ineligible)."""
        padded = np.zeros(self.n_padded, np.bool_)
        padded[: self.n_total] = mask
        if self.mesh is None:
            return jnp.asarray(padded)
        return shard_rows_to_mesh(padded, self.mesh)

    def search(
        self,
        queries,
        k: int = 100,
        batch_size: int = 256,
        *,
        allowed_ids=None,
        disallowed_ids=None,
        selector=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched exact top-k (analog of utils.py:58-80 faiss_search).
        Returns fp32 scores and int32 indices, shapes [Q, k].

        ``allowed_ids`` / ``disallowed_ids`` / ``selector`` restrict the
        search to a subset of corpus positions — the FAISS
        ``SearchParameters(sel=IDSelector...)`` analog (see
        ``build_selector_mask``). When fewer than k rows are eligible the
        tail is padded with score -inf / index -1, like FAISS."""
        k = min(k, self.n_total)
        queries = np.asarray(queries, np.float32)
        sel_mask = build_selector_mask(
            self.n_total, allowed_ids, disallowed_ids, selector
        )
        if queries.shape[0] == 0:  # zero-query batch: every caller branch
            return (
                np.zeros((0, k), np.float32),
                np.zeros((0, k), np.int32),
            )
        key = ("sel", k) if sel_mask is not None else k
        with self._search_lock:
            search_fn = self._search_fns.get(key)
            if search_fn is None:
                search_fn = self._search_fns[key] = self._build_search(
                    k, selector=sel_mask is not None
                )
        sel_args = ()
        if sel_mask is not None:
            sel_args = (self._place_selector(sel_mask),)
        n_q = queries.shape[0]
        # async dispatch + per-chunk D2H: each chunk's results travel home
        # while later chunks compute (see in-loop comment)
        pending = []
        for lo in range(0, n_q, batch_size):
            block = queries[lo : lo + batch_size]
            real = block.shape[0]
            if real < batch_size:  # static shapes: pad the final block
                block = np.concatenate(
                    [block, np.zeros((batch_size - real, self.dim), np.float32)]
                )
            if self.mesh is not None and jax.process_count() > 1:
                block_dev = replicate_to_mesh(block, self.mesh)
            else:
                block_dev = jnp.asarray(block)
            scores, idx = search_fn(
                self.corpus, self.row_scale, self._n_valid_dev, block_dev,
                *sel_args,
            )
            # start this chunk's D2H immediately: true per-chunk double
            # buffering — chunk i's results come back while chunk i+1's H2D
            # and compute are in flight (staging all dispatches before any
            # copy serialized the whole D2H tail after the last compute)
            scores.copy_to_host_async()
            idx.copy_to_host_async()
            pending.append((scores, idx, real))
        all_scores = [np.asarray(s)[:r].astype(np.float32, copy=False) for s, _, r in pending]
        all_indices = [np.asarray(i)[:r].astype(np.int32, copy=False) for _, i, r in pending]
        out_scores = np.concatenate(all_scores)
        out_idx = np.concatenate(all_indices)
        if sel_mask is not None:
            out_idx = mask_filtered_misses(out_scores, out_idx)
        return out_scores, out_idx

    def reconstruct(self, ids) -> np.ndarray:
        """Stored rows for corpus ids, decoded to fp32 — the FAISS
        ``reconstruct``/``reconstruct_batch`` analog (the reference keeps
        its fp32 rows inside faiss.IndexFlatIP, src/utils.py:38-51). fp32
        storage returns rows exactly; bf16 at storage precision; int8
        dequantizes through the per-row max-abs scale (the stored
        approximation — FAISS scalar-quantizer decode semantics, not the
        original vector)."""
        ids = _canonical_recon_ids(ids, self.n_total)
        if ids.size == 0:
            return np.zeros((0, self.dim), np.float32)
        with self._search_lock:
            fn = self._search_fns.get("reconstruct")
            if fn is None:
                quantized = self.quantized

                def gather(corpus, scale, idx):
                    rows = jnp.take(corpus, idx, axis=0).astype(jnp.float32)
                    if quantized:
                        rows = rows * jnp.take(scale, idx)[:, None]
                    return rows

                if self.mesh is None:
                    fn = jax.jit(gather)
                else:
                    fn = jax.jit(
                        gather,
                        in_shardings=self.search_arg_shardings(self.mesh)[:2]
                        + (NamedSharding(self.mesh, P()),),
                        out_shardings=NamedSharding(self.mesh, P()),
                    )
                self._search_fns["reconstruct"] = fn
        return _chunked_row_gather(
            fn, (self.corpus, self.row_scale), ids, self.mesh
        )

    def range_search(
        self, queries, radius: float, *, batch_size: int = 256,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """All corpus items scoring STRICTLY above ``radius`` per query —
        the FAISS ``range_search`` analog for inner product (FAISS's
        RangeSearchResult keeps hits with score > radius). Returns
        CSR-style ``(lims [Q+1] int64, scores, ids)``: query q's hits are
        ``ids[lims[q]:lims[q+1]]`` in descending-score order (FAISS
        leaves within-query order unspecified; sorted is a superset of
        that contract).

        TPU shape discipline: one compiled pass counts hits per query
        batch, then the existing exact top-k engine runs at k = the
        batch's max count rounded up to a power of two (one program per
        bucket). A completeness guard re-runs at larger k when the k-th
        returned score still clears the radius (the bf16 count pass and
        the fp32-faithful top-k pass may disagree at the boundary); final
        membership always comes from the search path's scores. In
        ``recall_target < 1`` serving mode the result is approximate,
        like ``search``."""
        queries = np.asarray(queries, np.float32)
        radius = float(radius)
        n_q = queries.shape[0]
        if n_q == 0:
            return (
                np.zeros(1, np.int64),
                np.zeros(0, np.float32),
                np.zeros(0, np.int64),
            )
        with self._search_lock:
            count_fn = self._search_fns.get("range_count")
            if count_fn is None:
                quantized = self.quantized

                def count(corpus, scale, nv, q, r):
                    s = jnp.einsum(
                        "qd,nd->qn",
                        q.astype(jnp.bfloat16),
                        corpus.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    )
                    if quantized:
                        s = s * scale[None, :]
                    valid = (
                        lax.iota(jnp.int32, corpus.shape[0]) < nv
                    )[None, :]
                    return jnp.sum((s > r) & valid, axis=1)

                if self.mesh is None:
                    count_fn = jax.jit(count)
                else:
                    count_fn = jax.jit(
                        count,
                        in_shardings=self.search_arg_shardings(self.mesh)
                        + (
                            NamedSharding(self.mesh, P()),
                            NamedSharding(self.mesh, P()),
                        ),
                        out_shardings=NamedSharding(self.mesh, P()),
                    )
                self._search_fns["range_count"] = count_fn
        per_query_scores: list = []
        per_query_ids: list = []
        for lo in range(0, n_q, batch_size):
            block = queries[lo : lo + batch_size]
            real = block.shape[0]
            padded = block
            if real < batch_size:
                padded = np.concatenate(
                    [block, np.zeros((batch_size - real, self.dim), np.float32)]
                )
            if self.mesh is not None and jax.process_count() > 1:
                block_dev = replicate_to_mesh(padded, self.mesh)
            else:
                block_dev = jnp.asarray(padded)
            counts = np.asarray(
                count_fn(self.corpus, self.row_scale, self._n_valid_dev,
                         block_dev, jnp.float32(radius))
            )[:real]
            max_c = int(counts.max()) if counts.size else 0
            if max_c == 0:
                # the count pass is bf16; a boundary-straddling hit could
                # still exist — probe the top-1 to be sure
                max_c = 1
            k = min(self.n_total, 1 << (max_c - 1).bit_length())
            while True:
                # batch_size (not real): search pads its final block to the
                # full batch, so every residual count reuses one compiled
                # [batch_size, D] program per k bucket instead of compiling
                # a fresh shape per distinct residual (minutes each through
                # the remote compile server); results come back real-sliced
                s, i = self.search(block, k=k, batch_size=batch_size)
                if k >= self.n_total or not (s[:, -1] > radius).any():
                    break
                k = min(self.n_total, k * 2)  # guard: k-th hit still clears
            for r in range(real):
                m = s[r] > radius
                per_query_scores.append(s[r][m])
                per_query_ids.append(i[r][m].astype(np.int64))
        lims = np.zeros(n_q + 1, np.int64)
        np.cumsum([len(x) for x in per_query_ids], out=lims[1:])
        return (
            lims,
            (np.concatenate(per_query_scores) if per_query_scores
             else np.zeros(0, np.float32)).astype(np.float32, copy=False),
            (np.concatenate(per_query_ids) if per_query_ids
             else np.zeros(0, np.int64)),
        )

    @property
    def ntotal(self) -> int:
        return self.n_total
