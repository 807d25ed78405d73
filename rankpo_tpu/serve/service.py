"""Retrieval serving: encoder + sharded index behind one query API.

The pod-scale serving target of BASELINE.json ("multi-million-passage sharded
matmul+top-k index"): the corpus lives sharded in HBM across the mesh; queries
are encoded and searched without leaving the device between the two steps.
The reference has no serving path at all (its closest is the offline
evaluate.py loop) — this is the productionized form of the same
encode→search→rank pipeline, reusing the exact components evaluation and
mining use, so serving scores are bit-identical to evaluation scores.
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from rankpo_tpu.index import (
    FlatIPIndex,
    InferenceEncoder,
    IVFIPIndex,
    RefineIPIndex,
)

logger = logging.getLogger(__name__)


def finalize_hits(result: Dict, k: int, return_passages: bool = True) -> Dict:
    """Slice a search-at-k_max result down to the client's k. Shared by the
    HTTP handler and the micro-batcher, which both search once at a fixed
    compiled k and slice per request.

    Passage texts must already ride the hits (call ``query`` with
    ``return_passages=True``): the service decorates hits from the SAME
    ``_state`` snapshot the search ran on, whereas decorating here from live
    ``service.corpus_texts`` would race concurrent /add //remove mutations
    and pair a hit's id with another document's text."""
    result["hits"] = result["hits"][:k]
    if not return_passages:
        for h in result["hits"]:
            h.pop("passage", None)
    return result


class RetrievalService:
    def __init__(
        self,
        encoder: InferenceEncoder,
        *,
        mesh=None,
        max_query_length: int = 512,
        query_batch_size: int = 64,
        recall_target: float = 1.0,
        index_dtype=None,
        index_type: str = "flat",
        index_kwargs: Optional[Dict] = None,
        pack_queries: bool = False,
        pack_max_segments: int = 16,
        stable_ids: bool = False,
        rewarm_after_mutation: bool = False,
        mutation_headroom: float = 0.25,
    ):
        """recall_target < 1.0 enables the approx serving mode (flat index:
        PartialReduce top-k, 8x QPS at recall 0.95 on v5e; refine index: the
        build-time candidate-tune target). 1.0 = exact/FAISS-parity (flat).
        index_dtype: fp32 (default) / bf16 (2x memory) / int8 (4x memory,
        flat only). index_type: "flat" (exact brute force), "refine"
        (two-stage PCA prefilter + exact rerank, RefineIPIndex), "ivf"
        (clustered inverted-file probing, IVFIPIndex) — the latter two are
        approximate by contract, tuned to recall_target — or a FAISS
        index_factory-style spec string ("IVF4096,PQ64", "PCA128,Flat",
        "SQ8", ...; rankpo_tpu/index/factory.py). index_kwargs: forwarded
        to the index constructor (e.g. reduced_dim / candidates for refine;
        n_clusters / nprobe for ivf); explicit kwargs win over factory-spec
        components. stable_ids: FAISS ``IndexIDMap`` analog — passages carry
        caller-assigned int64 ids that SURVIVE removals (no renumbering);
        hits gain an ``id`` field, ``/remove`` takes external ids, and
        ``/add`` accepts explicit ids (auto-continues from max+1 otherwise).
        Off (default), ids are corpus positions with FAISS ``remove_ids``
        renumbering semantics. mutation_headroom: when an /add outgrows
        the index's storage buffer, the rebuilt buffer pre-pays this
        fraction of extra pad rows so FOLLOWING adds keep storage shapes —
        shape-preserving mutations carry every compiled program (fused
        serving programs included) across, paying neither recompiles nor
        a rewarm."""
        import jax.numpy as jnp

        self.encoder = encoder
        self.mesh = mesh
        self.max_query_length = max_query_length
        self.query_batch_size = query_batch_size
        self.recall_target = recall_target
        if index_type not in ("flat", "refine", "ivf"):
            from rankpo_tpu.index.factory import resolve_index_spec

            index_type, spec_kwargs = resolve_index_spec(
                index_type, index_kwargs
            )
            # flat storage ("SQ8"/"SQbf16") rides index_dtype, not kwargs
            if index_type == "flat" and "dtype" in spec_kwargs:
                if index_dtype is None:
                    index_dtype = spec_kwargs.pop("dtype")
                else:
                    spec_kwargs.pop("dtype")
            if (index_type in ("refine", "ivf") and index_dtype is None
                    and "pq_m" not in spec_kwargs):
                # keep the tier's documented bf16 storage default: without
                # this, _approx_kwargs would setdefault store_dtype from
                # index_dtype's fp32 fallback — 2x the HBM the spec
                # promises, and different rows than the same spec builds
                # via evaluate/mining (an explicit SQ component or
                # index_dtype still wins)
                spec_kwargs.setdefault("store_dtype", jnp.bfloat16)
            index_kwargs = spec_kwargs
        self.index_dtype = index_dtype if index_dtype is not None else jnp.float32
        if index_type == "refine" and self.index_dtype == jnp.int8:
            raise ValueError(
                "index_type='refine' stores fp32/bf16 rerank rows; int8 "
                "storage is a FlatIPIndex or IVFIPIndex option"
            )
        self.index_type = index_type
        self.index_kwargs = dict(index_kwargs or {})
        # sequence-packed query encode (data/packing.py): micro-batch groups
        # with MIXED lengths stop paying the longest member's length bucket —
        # texts pack into full rows, the fused program scatters per-segment
        # reps into a FIXED query_batch_size slot block, search unchanged.
        # Compile surface: one program per ROW bucket (vs batch x length
        # buckets unpacked).
        self.pack_queries = pack_queries
        self.pack_max_segments = pack_max_segments
        self.stable_ids = stable_ids
        # (index, corpus_texts, ext_ids) swap ATOMICALLY as one tuple: a
        # query must never decorate one index's hit ids with another
        # corpus's texts or external ids (build_index/add_passages can race
        # in-flight queries). ext_ids maps corpus position -> stable
        # external id; in positional mode it is always arange(n)
        self._state: tuple = (None, [], np.zeros(0, np.int64))
        # WRITERS serialize: /add and /remove are read-modify-swap on
        # _state — two concurrent mutations would both read the same tuple
        # and the second swap would silently erase the first (each HTTP
        # POST runs on its own ThreadingHTTPServer thread). Readers stay
        # lock-free on the atomic tuple.
        self._mutate_lock = threading.Lock()
        # fused serving: tokens -> embed -> sharded search in ONE compiled
        # program. The embeddings never leave HBM between the two stages, and
        # one dispatch replaces two — through a ~25-30ms-floor remote tunnel
        # the second dispatch per micro-batch group was pure added latency
        # (measured p50 77ms with ~50-60ms of dispatch floors).
        self.fuse_encode_search = True
        self._fused_fns: Dict[int, object] = {}
        self._fused_lock = threading.Lock()
        # /add //remove rebuild the index, so the fused programs (which bake
        # n_total) are cleared — warmup()'s "requests never pay XLA
        # compiles" guarantee no longer holds for post-mutation traffic.
        # rewarm_after_mutation makes the MUTATION call replay the last
        # warmup() before returning (minutes through a remote compiler —
        # the mutator pays, searchers stay compile-free)
        self.rewarm_after_mutation = rewarm_after_mutation
        if mutation_headroom < 0.0:
            raise ValueError("mutation_headroom must be >= 0")
        self.mutation_headroom = float(mutation_headroom)
        self._warmup_spec: Optional[Dict] = None

    @classmethod
    def from_pretrained(cls, model_path: str, tokenizer=None, mesh=None, **kwargs):
        encoder = InferenceEncoder.from_pretrained(
            model_path, tokenizer=tokenizer, mesh=mesh
        )
        return cls(encoder, mesh=mesh, **kwargs)

    # ------------------------------------------------------------------
    def build_index(
        self,
        corpus_texts: Sequence[str],
        *,
        max_passage_length: int = 512,
        batch_size: int = 256,
        device_resident: bool = True,
        ids=None,
    ) -> None:
        """Encode the corpus on the mesh and pin it sharded in HBM.

        ``ids``: optional per-passage external int64 ids (stable_ids mode);
        default 0..n-1. Must be unique and len(corpus_texts) long.

        ``device_resident`` (default) keeps the embedding matrix on device
        end to end (encode_sharded -> from_sharded): no full-corpus
        D2H + H2D round trip and no O(N*D) host-RAM ceiling — the path that
        makes multi-million-passage indexes buildable on one host. False
        restores the host-numpy route (useful when the matrix is wanted
        host-side anyway)."""
        t0 = time.time()
        self._require_stable_for(ids)
        ext_ids = self._validate_ids(ids, len(corpus_texts))
        if device_resident and not corpus_texts:
            device_resident = False  # empty corpus: keep the host path's error
        if device_resident:
            emb_dev, n_total = self.encoder.encode_sharded(
                list(corpus_texts),
                batch_size=batch_size,
                max_length=max_passage_length,
                description="Indexing corpus (device-resident)",
            )
            index = self._make_index_sharded(emb_dev, n_total)
        else:
            embeddings = self.encoder.encode(
                list(corpus_texts),
                batch_size=batch_size,
                max_length=max_passage_length,
                description="Indexing corpus",
            )
            index = self._make_index(embeddings)
        self._state = (index, list(corpus_texts), ext_ids)
        with self._fused_lock:
            self._fused_fns.clear()  # fused programs bake in n_total/k_local
        logger.info(
            "indexed %d passages in %.1fs", len(corpus_texts), time.time() - t0
        )

    def _approx_kwargs(self, overrides: Optional[Dict] = None):
        """Shared kwargs for the approximate index tiers: the service-level
        recall_target is the build-time tune target; 1.0 would ladder the
        tuner to its cap chasing unreachable exactness — these indexes are
        approximate by contract, so default their target.

        ``overrides`` carries tuned values (candidate count / nprobe) for
        THIS build only — an /add rebuild or a persisted-index load reuses
        them, but they never stick to the service config, so a later
        build_index on a fresh corpus re-tunes from scratch. An override
        only fills a knob the caller left on 'auto' (or unset)."""
        kwargs = dict(self.index_kwargs)
        for key, value in (overrides or {}).items():
            if kwargs.get(key, "auto") == "auto":
                kwargs[key] = value
        kwargs.setdefault(
            "recall_target",
            self.recall_target if self.recall_target < 1.0 else 0.95,
        )
        kwargs.setdefault("store_dtype", self.index_dtype)
        return kwargs

    def _make_index_sharded(self, emb_dev, n_total: int,
                            overrides: Optional[Dict] = None):
        if self.index_type == "refine":
            return RefineIPIndex.from_sharded(
                emb_dev, n_total, mesh=self.mesh,
                **self._approx_kwargs(overrides),
            )
        if self.index_type == "ivf":
            return IVFIPIndex.from_sharded(
                emb_dev, n_total, mesh=self.mesh,
                **self._approx_kwargs(overrides),
            )
        return FlatIPIndex.from_sharded(
            emb_dev, n_total, mesh=self.mesh,
            recall_target=self.recall_target,
            dtype=(overrides or {}).get("dtype", self.index_dtype),
            **self.index_kwargs,
        )

    def _make_index(self, embeddings, overrides: Optional[Dict] = None):
        if self.index_type == "refine":
            return RefineIPIndex(
                embeddings, mesh=self.mesh, **self._approx_kwargs(overrides)
            )
        if self.index_type == "ivf":
            return IVFIPIndex(
                embeddings, mesh=self.mesh, **self._approx_kwargs(overrides)
            )
        return FlatIPIndex(
            embeddings, mesh=self.mesh, recall_target=self.recall_target,
            dtype=(overrides or {}).get("dtype", self.index_dtype),
            **self.index_kwargs,
        )

    @property
    def index(self):
        return self._state[0]

    @property
    def corpus_texts(self) -> List[str]:
        return self._state[1]

    @property
    def passage_ids(self) -> np.ndarray:
        """External id per corpus position (FAISS IndexIDMap id_map analog).
        Positional mode: always 0..n-1."""
        return self._state[2]

    def _require_stable_for(self, ids) -> None:
        """Caller-supplied external ids only make sense in stable_ids mode:
        positional mode's invariant is passage_ids == 0..n-1 (and hits never
        carry 'id'), so silently accepting ids there would corrupt the map
        and make later /add //remove behave inconsistently."""
        if ids is not None and not self.stable_ids:
            raise ValueError(
                "external ids require stable_ids mode (RetrievalService("
                "stable_ids=True) / serve --stable_ids); positional mode "
                "numbers passages 0..n-1"
            )

    @staticmethod
    def _validate_ids(ids, n: int) -> np.ndarray:
        """Canonicalize per-passage external ids: default arange, int64,
        unique, one per passage."""
        if ids is None:
            return np.arange(n, dtype=np.int64)
        ext = np.asarray(ids, np.int64).reshape(-1)
        if ext.size != n:
            raise ValueError(
                f"ids must match the corpus: {n} passages, {ext.size} ids"
            )
        if np.unique(ext).size != ext.size:
            raise ValueError("ids must be unique")
        return ext

    def load_index(self, embeddings: np.ndarray, corpus_texts: Sequence[str],
                   overrides: Optional[Dict] = None, *, ids=None):
        """Attach a prebuilt embedding matrix (e.g. from an offline encode).
        ``overrides``: tuned index knobs to reuse for this build only (see
        _approx_kwargs). ``ids``: optional external ids (see build_index)."""
        self._state = (
            self._make_index(embeddings, overrides),
            list(corpus_texts),
            self._validate_ids(ids, len(corpus_texts)),
        )
        with self._fused_lock:
            self._fused_fns.clear()  # fused programs bake in n_total/k_local

    def adopt_index(self, index, corpus_texts: Sequence[str], *, ids=None):
        """Attach an EXTERNALLY BUILT index object (e.g. a 10M
        ``IVFIPIndex.from_chunk_fn`` build whose fp32 matrix never existed
        and so could not ride ``load_index``'s host-numpy signature).
        Everything downstream — fused encode+search, /add //remove device
        mutation, autosave — works as with ``build_index``; the index's
        dim must match the encoder's embedding width."""
        dim = getattr(index, "dim", None)
        if dim is not None and dim != self.encoder.config.hidden_size:
            raise ValueError(
                f"index dim {dim} != encoder hidden "
                f"{self.encoder.config.hidden_size}"
            )
        if index.ntotal != len(corpus_texts):
            raise ValueError(
                f"index has {index.ntotal} rows, got "
                f"{len(corpus_texts)} corpus texts"
            )
        self._state = (
            index,
            list(corpus_texts),
            self._validate_ids(ids, len(corpus_texts)),
        )
        with self._fused_lock:
            self._fused_fns.clear()  # fused programs bake in n_total/k_local

    def _stored_embeddings(self, index) -> np.ndarray:
        """Fetch an index's fp32 embedding matrix back to the host
        (dequantized for int8 storage). Multi-process gathers ride
        ``index.io._fetch`` (the one addressability-aware device->host
        contract) rather than a second hand-rolled copy.

        Only the FALLBACK mutation path uses this (index types without
        ``append_sharded``/``remove_rows`` — none of the built-in tiers):
        it is an O(N*D) fp32 host round trip, which the device mutation
        path exists to avoid."""
        from rankpo_tpu.index.io import _fetch

        def gather(arr):
            return _fetch(arr)

        def fetch(arr):
            return np.asarray(gather(arr), np.float32)

        if isinstance(index, IVFIPIndex):
            # IVF stores rows cluster-major with empty slots: de-permute by
            # row_ids to recover the original corpus order. row_ids stay
            # integer end to end — a float32 hop would corrupt ids above
            # 2^24 (the multi-million-row regime this index targets)
            if index.pq_m is not None:
                # decode residual codes on host: codebook lookup, UN-rotate
                # (codes store z = residual @ rot — ivf.py encode_shard —
                # and the codebooks live in that rotated space), then add
                # the slot's cluster centroid (rows round-trip with PQ
                # error, the codec's contract — cf. int8 dequant below)
                codes = np.asarray(gather(index.corpus))  # [slots, m] uint8
                if getattr(index, "pq_layout", "rows") == "cols":
                    codes = codes.T  # transposed [m, slots] physical layout
                m, ds = index.pq_m, index.dim // index.pq_m
                cb = index._codebooks_host  # [m, 256, ds] fp32
                recon = cb[np.arange(m)[None, :], codes.astype(np.int64)]
                clustered = recon.reshape(codes.shape[0], index.dim)
                if index._rotation_host is not None:
                    clustered = clustered @ index._rotation_host.T
                cluster = np.arange(codes.shape[0]) // index.capacity
                clustered = clustered + index._centroids_host[cluster]
            else:
                clustered = fetch(index.corpus)  # int8 codes cast losslessly
                if index.quantized:
                    clustered = clustered * fetch(index.slot_scale)[:, None]
            row_ids = np.asarray(gather(index.row_ids), np.int64)
            emb = np.zeros((index.n_total, clustered.shape[1]), np.float32)
            valid = row_ids >= 0
            emb[row_ids[valid]] = clustered[valid]
            return emb
        emb = fetch(index.corpus)[: index.n_total]
        if getattr(index, "quantized", False):
            emb = emb * fetch(index.row_scale)[: index.n_total, None]
        return emb

    def add_passages(
        self,
        texts: Sequence[str],
        *,
        max_passage_length: int = 512,
        batch_size: int = 256,
        ids=None,
    ) -> None:
        """Append passages to a built index (FAISS ``index.add`` analog;
        with ``ids``, the ``add_with_ids`` analog).

        New texts encode on the mesh into a device-resident buffer and the
        index appends them ON DEVICE (``append_sharded``): existing storage
        rides over bit-exactly (int8/PQ codes included), trained artifacts
        (centroids, codebooks, OPQ rotation, PCA basis) and tuned knobs
        stay FIXED — exactly FAISS's add-time contract — and the host never
        sees an O(N*D) matrix. The encode of the NEW passages is the only
        model work. New passages get the next corpus indices, preserving
        existing ids. ``ids``: external ids for the NEW passages (must not
        collide with live ones); default continues from max(live)+1."""
        self._require_stable_for(ids)
        with self._mutate_lock:
            index, old_texts, old_ext = self._state
            if index is None:
                raise RuntimeError("no index built; call build_index first")
            if ids is None:
                start = int(old_ext.max()) + 1 if old_ext.size else 0
                new_ext = np.arange(start, start + len(texts), dtype=np.int64)
            else:
                new_ext = self._validate_ids(ids, len(texts))
                clash = np.intersect1d(new_ext, old_ext)
                if clash.size:
                    raise ValueError(
                        f"ids already present: {clash[:8].tolist()}"
                    )
            texts_all = old_texts + list(texts)
            ids_all = np.concatenate([old_ext, new_ext])
            if hasattr(index, "append_sharded"):
                # device path: new texts encode straight into a row-sharded
                # HBM buffer and the index appends them ON DEVICE — existing
                # storage (int8 codes, PQ codes, tuned knobs, trained
                # centroids/codebooks/PCA basis) rides over bit-exactly, and
                # the O(N*D) fp32 host round trip the rebuild paid is gone
                new_dev, n_new = self.encoder.encode_sharded(
                    list(texts),
                    batch_size=batch_size,
                    max_length=max_passage_length,
                    description="Encoding added passages",
                )
                new_index = index.append_sharded(
                    new_dev, n_new, headroom=self.mutation_headroom
                )
                self._state = (new_index, texts_all, ids_all)
                rebound = self._rebind_fused(new_index, texts_all, ids_all)
            else:
                # host fallback for index types without device mutation
                new_emb = self.encoder.encode(
                    list(texts),
                    batch_size=batch_size,
                    max_length=max_passage_length,
                    description="Encoding added passages",
                )
                merged = np.concatenate(
                    [self._stored_embeddings(index), new_emb], axis=0
                )
                self.load_index(merged, texts_all,
                                self._rebuild_overrides(index), ids=ids_all)
                rebound = False
        logger.info(
            "added %d passages (index now %d)", len(texts), self.ntotal
        )
        self._post_mutation(rebound)

    @staticmethod
    def _rebuild_overrides(index) -> Dict:
        """Tuned/structural knobs an in-place rebuild (/add, /remove) must
        carry from the LIVE index: re-running the recall tuner on every
        mutation would stall serving, and codec knobs (pq_m, hybrid
        projection) exist only on the index after a persisted-file restart —
        dropping them would silently rebuild a plain bf16 IVF at 32x the
        memory the codec targets. Overrides never stick to the service
        config — a later build_index on a fresh corpus re-tunes from
        scratch."""
        if isinstance(index, RefineIPIndex):
            return {
                "candidates": index.candidates,
                "reduced_dim": index.reduced_dim,
                "store_dtype": index.store_dtype,
            }
        if isinstance(index, IVFIPIndex):
            return {
                "nprobe": index.nprobe,
                "n_clusters": index.n_clusters,
                "pq_m": index.pq_m,
                "pq_rotate": getattr(index, "pq_rotate", "none"),
                "reduced_dim": index.reduced_dim,
                "candidates": index.candidates,
                "store_dtype": index.store_dtype,
            }
        # storage dtype rides along for the same reason as the codec knobs:
        # after a persisted-file restart whose --index_dtype differs from
        # the save, the first /add must NOT silently rebuild at the new
        # dtype (4x HBM growth for an int8-sized corpus, changed scores)
        return {"dtype": index.dtype}

    def remove_passages(self, ids: Sequence[int]) -> int:
        """Drop passages (FAISS ``remove_ids`` analog).

        Positional mode (default): ids are corpus positions, out-of-range
        raises, and remaining ids SHIFT DOWN to stay sequential — callers
        tracking external keys keep their own id map, exactly as with plain
        FAISS. stable_ids mode (IndexIDMap analog): ids are EXTERNAL ids,
        unknown ids are ignored (FAISS returns the count actually removed),
        and survivors keep their external ids — no renumbering.

        Removal runs ON DEVICE (``remove_rows``): flat/refine tiers gather
        the surviving rows (codes and scales travel as stored — never
        requantized), the IVF tier just masks the dropped slots and
        renumbers (storage shared, no copy at all). The model never runs
        and the host never sees an O(N*D) matrix. Returns the number of
        removed passages."""
        with self._mutate_lock:
            index, old_texts, old_ext = self._state
            if index is None:
                raise RuntimeError("no index built; call build_index first")
            n = len(old_texts)
            uniq = sorted({int(i) for i in ids})
            if not uniq:
                return 0
            if self.stable_ids:
                keep = ~np.isin(old_ext, np.asarray(uniq, np.int64))
                n_removed = int(n - keep.sum())
                if n_removed == 0:
                    return 0
            else:
                if uniq[0] < 0 or uniq[-1] >= n:
                    raise ValueError(
                        f"remove id out of range: corpus has {n} passages, "
                        f"got ids in [{uniq[0]}, {uniq[-1]}]"
                    )
                keep = np.ones(n, bool)
                keep[uniq] = False
                n_removed = len(uniq)
            if not keep.any():
                raise ValueError(
                    "cannot remove every passage; build a new index instead"
                )
            kept_texts = [t for t, k in zip(old_texts, keep) if k]
            # stable mode: survivors keep their ids; positional mode: the
            # default arange re-establishes position==id after the shift
            kept_ids = (
                old_ext[keep] if self.stable_ids
                else np.arange(int(keep.sum()), dtype=np.int64)
            )
            if hasattr(index, "remove_rows"):
                # device path: positions drop on device (flat/refine gather
                # survivors; IVF just masks slots and renumbers — storage is
                # shared, no copy) — no O(N*D) host round trip. Removal
                # preserves storage shapes, so compiled programs carry over
                new_index = index.remove_rows(np.nonzero(~keep)[0])
                self._state = (new_index, kept_texts, kept_ids)
                rebound = self._rebind_fused(new_index, kept_texts, kept_ids)
            else:
                kept_emb = self._stored_embeddings(index)[keep]
                self.load_index(
                    kept_emb, kept_texts, self._rebuild_overrides(index),
                    ids=old_ext[keep] if self.stable_ids else None,
                )
                rebound = False
        logger.info(
            "removed %d passages (index now %d)", n_removed, self.ntotal
        )
        self._post_mutation(rebound)
        return n_removed

    @staticmethod
    def _arrays_compatible(a: tuple, b: tuple) -> bool:
        """True when two ``search_arrays`` tuples are drop-in replacements
        for each other as jitted-program arguments: same arity, same
        presence, same shapes and dtypes per slot."""
        if len(a) != len(b):
            return False
        for x, y in zip(a, b):
            if (x is None) != (y is None):
                return False
            if x is not None and (x.shape != y.shape or x.dtype != y.dtype):
                return False
        return True

    def _rebind_fused(self, index, texts, ext_ids) -> bool:
        """Rebind cached fused programs to a mutated index when its storage
        shapes/dtypes match the snapshot each program was compiled against.
        The programs read every piece of corpus state — storage, scales,
        row ids, the valid-row count — as ARGUMENTS, and a mutation clones
        the static knobs, so a shape-preserving mutation leaves them valid:
        post-mutation traffic pays NO recompile and needs NO rewarm.
        Entries whose shapes no longer match (storage grew) are dropped.
        Only mutation paths may call this — build_index/load_index install
        arbitrary new indexes (fresh tuning, different knobs) and must keep
        clearing. Returns True when every entry was rebound."""
        all_rebound = True
        with self._fused_lock:
            for k_eff in list(self._fused_fns):
                fn, old_index, _t, _i = self._fused_fns[k_eff]
                if (
                    type(old_index) is type(index)
                    and k_eff <= index.ntotal
                    and self._arrays_compatible(
                        old_index.search_arrays, index.search_arrays
                    )
                ):
                    self._fused_fns[k_eff] = (fn, index, texts, ext_ids)
                    if k_eff == old_index.ntotal and index.ntotal > k_eff:
                        # this entry was (possibly) an ntotal-CLAMPED k: the
                        # same client k now resolves to a LARGER k_eff that
                        # has no compiled program yet. The entry stays (still
                        # valid for literal k == k_eff requests), but report
                        # not-all-rebound so rewarm_after_mutation can
                        # pre-pay the new clamp's compile
                        all_rebound = False
                else:
                    del self._fused_fns[k_eff]
                    all_rebound = False
        return all_rebound

    def _post_mutation(self, all_rebound: bool = False) -> None:
        """A shape-preserving mutation carried every compiled program over
        (``all_rebound``) — nothing to rewarm. Otherwise the mutation
        dropped fused programs (storage shapes changed): either re-pay the
        compiles now, inside the mutation call, or warn that post-mutation
        searches will pay them per bucket."""
        if all_rebound:
            logger.info(
                "mutation preserved storage shapes: compiled serving "
                "programs carried over (no recompile, no rewarm)"
            )
            return
        if self.rewarm_after_mutation and self._warmup_spec is not None:
            t0 = time.time()
            self.warmup(**self._warmup_spec)
            logger.info(
                "re-warmed serving programs after mutation in %.1fs",
                time.time() - t0,
            )
        else:
            logger.info(
                "index mutated: fused programs cleared — next searches "
                "recompile per (batch, length) bucket; enable "
                "rewarm_after_mutation (--rewarm_after_mutations) or call "
                "warmup() to pre-pay"
            )

    def save_index(self, path: str) -> None:
        """Persist the BUILT index structurally + the passages (FAISS
        write_index analog, rankpo_tpu.index.io format): a restart skips the
        corpus encode AND the whole build — k-means, PCA, recall tuning —
        and restores bit-identical storage (no int8 dequant/requant round
        trip). Multi-process: every process calls (the state gather is
        collective) and every process writes its copy (atomic rename)."""
        from rankpo_tpu.index import io as index_io

        index, texts, ext_ids = self._state
        if index is None:
            raise RuntimeError("no index built; call build_index first")
        state = index_io.index_state(index)
        state["corpus_texts"] = np.asarray(texts, dtype=object)
        state["corpus_ext_ids"] = ext_ids
        index_io.save_state(state, path)
        logger.info("saved index (%d passages) to %s", index.ntotal, path)

    def load_index_file(self, path: str) -> None:
        with np.load(path, allow_pickle=True) as data:
            self._load_index_data(data, path)

    def _check_loaded_ids(self, ext: np.ndarray, n: int, path: str) -> None:
        """A positional-mode service must not install a stable external-id
        map (same hazard as the kind mismatch below: the next /add would
        extend a map the mode's position==id invariant says cannot exist).
        Positional saves carry ext == 0..n-1, which loads fine either way."""
        if not self.stable_ids and not np.array_equal(
            ext, np.arange(n, dtype=np.int64)
        ):
            raise ValueError(
                f"{path} carries stable external ids but the service runs "
                "in positional mode — restart with --stable_ids (or rebuild "
                "from the corpus)"
            )

    def _load_index_data(self, data, path: str) -> None:
        from rankpo_tpu.index import io as index_io

        if index_io.is_index_state(data):
            # structural restore: pure placement, no rebuild. The saved kind
            # must match the configured index_type — silently switching
            # would make the next /add rebuild as a DIFFERENT index class
            kind = index_io.state_kind(data)
            if kind != self.index_type:
                raise ValueError(
                    f"{path} holds a {kind!r} index but the service is "
                    f"configured index_type={self.index_type!r} — restart "
                    f"with --index_type {kind} (or rebuild from the corpus)"
                )
            texts = [str(t) for t in data["corpus_texts"]]
            # pre-IDMap files carry no ext ids: default positional
            ext = (np.asarray(data["corpus_ext_ids"], np.int64)
                   if "corpus_ext_ids" in data
                   else np.arange(len(texts), dtype=np.int64))
            self._check_loaded_ids(ext, len(texts), path)
            index = index_io.index_from_state(data, mesh=self.mesh)
            self._state = (index, texts, ext)
            with self._fused_lock:
                self._fused_fns.clear()
            logger.info(
                "restored %s index (%d passages) from %s — no rebuild",
                kind, self.ntotal, path,
            )
            return
        # legacy format: raw embeddings + tuned knobs; rebuild (k-means /
        # PCA re-run) with the saved knobs reused where still applicable
        overrides = {}
        if self.index_type == "ivf" and "ivf_nprobe" in data:
            # restart path: reuse the tuned nprobe FOR THIS LOAD instead of
            # re-running the recall ladder — valid when the caller left
            # nprobe on "auto" and is not forcing a different cluster count
            # than the one the nprobe was tuned at (k-means still re-trains)
            saved_k = int(data["ivf_n_clusters"])
            user_k = self.index_kwargs.get("n_clusters", "auto")
            if user_k in ("auto", saved_k):
                overrides = {
                    "nprobe": int(data["ivf_nprobe"]),
                    "n_clusters": saved_k,
                }
        if self.index_type == "refine" and "refine_candidates" in data:
            # restart path: reuse the tuned candidate count FOR THIS LOAD —
            # valid when the caller is not forcing a different reduced_dim
            # than the one the count was tuned at
            saved_dim = int(data["refine_reduced_dim"])
            if self.index_kwargs.get("reduced_dim", saved_dim) == saved_dim:
                overrides = {
                    "candidates": int(data["refine_candidates"]),
                    "reduced_dim": saved_dim,
                }
        legacy_texts = [str(t) for t in data["corpus_texts"]]
        legacy_ids = (np.asarray(data["corpus_ext_ids"], np.int64)
                      if "corpus_ext_ids" in data else None)
        if legacy_ids is not None:
            self._check_loaded_ids(legacy_ids, len(legacy_texts), path)
            if not self.stable_ids:
                legacy_ids = None  # checked equal to arange: use the default
        self.load_index(
            data["embeddings"], legacy_texts, overrides, ids=legacy_ids,
        )
        logger.info("loaded index (%d passages) from %s", self.ntotal, path)

    # ------------------------------------------------------------------
    def _batch_bucket(self, n: int) -> int:
        """Power-of-two batch buckets (capped at query_batch_size): every
        distinct batch shape is a separate XLA compile, so serving variable
        group sizes raw causes compile storms (measured: 8s p99 through the
        remote-compile tunnel). Buckets bound the compile count to ~log2."""
        b = 8
        while b < n and b < self.query_batch_size:
            b *= 2
        return min(b, self.query_batch_size)

    def _default_warmup_lengths(self) -> list:
        """Every length bucket real traffic can produce. _bucket_length caps
        buckets at max_query_length, so the capped bucket must be warmed even
        when max_query_length is not a multiple of length_multiple (and when
        max_query_length < length_multiple this still warms the single real
        bucket instead of being a no-op)."""
        m = getattr(self.encoder, "length_multiple", 64)
        return sorted(
            {
                min(self.max_query_length, L)
                for L in range(m, self.max_query_length + m, m)
            }
        )

    def warmup(self, k: int = 10, *, query_fn=None, lengths=None) -> None:
        """Pre-compile serving programs so requests never pay XLA compiles.

        Every (batch bucket, sequence-length bucket) pair is a distinct XLA
        program; real traffic varies BOTH, so by default this walks the full
        cross product (through a remote-compile setup that is minutes of
        one-time startup for a long-lived server). ``lengths`` narrows the
        length buckets (e.g. ``(64,)`` when all queries are short);
        ``query_fn`` substitutes the dispatch entry (the multi-host frontend
        passes its broadcast-wrapped query so followers replay the warmups).
        Length targeting is tokenizer-approximate (one word ≈ one token)."""
        self._warmup_spec = {"k": k, "lengths": lengths}
        q_fn = query_fn or self.query
        m = getattr(self.encoder, "length_multiple", 64)
        if self.pack_queries:
            # packed mode: one program per ROW bucket (slot block is fixed),
            # so warm each bucket with enough full-length texts to fill it
            full = "warm " * self.max_query_length  # truncates to one row
            n_dev = self.mesh.devices.size if self.mesh is not None else 1
            r = n_dev
            while True:
                q_fn([full] * min(r, self.query_batch_size), k=k,
                     return_passages=False)
                if r >= self._rows_bucket(self.query_batch_size):
                    break
                r *= 2
            return
        if lengths is None:
            lengths = self._default_warmup_lengths()
        for length in lengths:
            text = "warm " * max(1, length - m // 2)
            b = 8
            while True:
                q_fn([text] * min(b, self.query_batch_size), k=k,
                     return_passages=False)
                if b >= self.query_batch_size:
                    break
                b *= 2

    def _get_fused(self, k: int):
        """One jitted program per k: tokens -> embed -> sharded search.
        jit itself re-specializes per (batch, length) bucket shape.

        Returns ``(fn, index, corpus_texts)`` — the state snapshot the
        program was built against. The caller must pass THAT index's corpus
        to the fn AND decorate hits with THAT snapshot's texts: the program
        bakes n_total/shard_rows as constants, and a concurrent index
        rebuild (add_passages) between lookup and dispatch must not mix a
        stale program with the new corpus (or stale hit ids with new
        passage texts). Cache entries self-invalidate when their index is
        no longer current; a build that races a rebuild is retried rather
        than cached (TOCTOU guard).

        ``k`` is clamped against THIS snapshot's ntotal (not any earlier
        read of the state): a rebuild that shrinks the corpus below a
        caller's earlier clamp must not reach top_k with k > rows (crash)
        or k > ntotal (returns -inf padding rows whose ids index past the
        snapshot's text list)."""
        while True:
            with self._fused_lock:
                index, texts, ext_ids = self._state
                k_eff = min(k, index.ntotal)
                entry = self._fused_fns.get(k_eff)
                if entry is not None and entry[1] is index:
                    return entry
            fn = self._build_fused(k_eff, index)
            with self._fused_lock:
                if self._state[0] is index:
                    self._fused_fns[k_eff] = (fn, index, texts, ext_ids)
                    return fn, index, texts, ext_ids
            # the index was rebuilt while this program was being built:
            # loop and rebuild against the current one

    def _build_fused(self, k: int, index):
        if self.pack_queries:
            return self._build_fused_packed(k, index)
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from rankpo_tpu.core.mesh import DATA_AXIS
        from rankpo_tpu.models import encoder as enc_mod

        enc_obj = self.encoder
        search = index.search_callable(k)
        mesh = self.mesh

        def fused(params, *rest):
            # rest = index.search_arrays + (ids, mask): the index protocol
            # keeps this path agnostic to flat vs refine storage layouts
            *arrays, ids, mask = rest
            reps = enc_mod.embed(
                params,
                enc_obj.config,
                {"input_ids": ids, "attention_mask": mask},
                normalize=enc_obj.normalize,
                compute_dtype=enc_obj.compute_dtype,
                deterministic=True,
                attn_impl=enc_obj.attn_impl,
            )
            reps = reps.astype(jnp.float32)
            if mesh is not None:
                # encode runs batch-sharded; search wants queries replicated
                # against the row-sharded corpus — one all-gather in between,
                # all inside the same program (the reps never leave HBM)
                reps = jax.lax.with_sharding_constraint(
                    reps, NamedSharding(mesh, P())
                )
            return search(*arrays, reps)

        if mesh is None:
            fn = jax.jit(fused)
        else:
            fn = jax.jit(
                fused,
                in_shardings=(
                    (NamedSharding(mesh, P()),)  # params replicated
                    + index.search_arg_shardings(mesh)
                    + (
                        NamedSharding(mesh, P(DATA_AXIS, None)),  # ids
                        NamedSharding(mesh, P(DATA_AXIS, None)),  # mask
                    )
                ),
                out_shardings=NamedSharding(mesh, P()),
            )
        return fn

    def _build_fused_packed(self, k: int, index):
        """Packed variant of the fused program: packed token rows + slot
        table in, per-segment embeddings scattered to a fixed slot block,
        then the same sharded search. See _build_fused for the snapshot /
        TOCTOU contract (shared via _get_fused)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from rankpo_tpu.core.mesh import DATA_AXIS
        from rankpo_tpu.models import encoder as enc_mod
        from rankpo_tpu.models.packing import scatter_packed_reps

        enc_obj = self.encoder
        search = index.search_callable(k)
        mesh = self.mesh

        def fused(params, *rest):
            *arrays, ids, segs, slot_idx, slots = rest
            reps, _valid = enc_mod.embed_packed(
                params,
                enc_obj.config,
                {"input_ids": ids, "segment_ids": segs},
                slot_idx.shape[1],
                normalize=enc_obj.normalize,
                compute_dtype=enc_obj.compute_dtype,
                deterministic=True,
                attn_impl=enc_obj.attn_impl,
            )
            reps = scatter_packed_reps(reps, slot_idx, slots.shape[0])
            reps = reps.astype(jnp.float32)
            if mesh is not None:
                reps = jax.lax.with_sharding_constraint(
                    reps, NamedSharding(mesh, P())
                )
            return search(*arrays, reps)

        if mesh is None:
            return jax.jit(fused)
        row_sharded = NamedSharding(mesh, P(DATA_AXIS, None))
        return jax.jit(
            fused,
            in_shardings=(
                (NamedSharding(mesh, P()),)  # params replicated
                + index.search_arg_shardings(mesh)
                + (
                    row_sharded,  # ids
                    row_sharded,  # segment_ids
                    row_sharded,  # slot_index
                    NamedSharding(mesh, P()),  # slots (shape carrier)
                )
            ),
            out_shardings=NamedSharding(mesh, P()),
        )

    def _rows_bucket(self, rows: int) -> int:
        """Power-of-two row buckets (starting at the device count for mesh
        divisibility): same compile-storm rationale as _batch_bucket."""
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        b = n_dev
        while b < rows:
            b *= 2
        return b

    def _prepare_packed_queries(self, chunk: List[str]):
        """Tokenize + bin-pack one micro-batch group into static-shape
        packed arrays; the slot table maps segments to the group's request
        order, so result row i is request i."""
        import jax

        from rankpo_tpu.data.packing import pack_token_lists

        pad_id = self.encoder.config.pad_token_id or 0
        encoded = self.encoder.tokenizer(
            list(chunk), max_length=self.max_query_length, truncation=True
        )
        ids_list = [x or [pad_id] for x in encoded["input_ids"]]
        cap = self.max_query_length
        packed = pack_token_lists(
            ids_list, cap, self.pack_max_segments, pad_id
        )
        rows = self._rows_bucket(packed.n_rows)
        m = self.pack_max_segments
        pad_rows = rows - packed.n_rows
        ids = np.pad(packed.input_ids, ((0, pad_rows), (0, 0)),
                     constant_values=pad_id)
        segs = np.pad(packed.segment_ids, ((0, pad_rows), (0, 0)))
        slot_idx = np.pad(
            packed.text_index,
            ((0, pad_rows), (0, m - packed.max_segments)),
            constant_values=-1,
        )
        # FIXED slot block: every packed program scatters into
        # query_batch_size slots, so only the ROW count varies across groups
        slots = np.arange(self.query_batch_size, dtype=np.int32)
        batch = {
            "ids": ids.astype(np.int32),
            "segs": segs.astype(np.int32),
            "slot_idx": slot_idx.astype(np.int32),
        }
        if self.encoder.process_count > 1:
            local = rows // self.encoder.process_count
            sl = slice(self.encoder.process_index * local,
                       (self.encoder.process_index + 1) * local)
            batch = jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    self.encoder._batch_sharding, np.ascontiguousarray(x[sl])
                ),
                batch,
            )
        return batch["ids"], batch["segs"], batch["slot_idx"], slots

    def _query_fused(self, texts: List[str], k: int):
        """Fused-dispatch top-k: returns (scores, indices, corpus_texts,
        ext_ids) — numpy [Q, k] arrays plus the text list and external-id
        map of the index snapshot actually searched (hit decoration must use
        THESE, not live state, or a concurrent rebuild mixes ids and
        passages). Groups larger than
        query_batch_size run as several fused dispatches (so the fused path
        — the only one warmup precompiles — serves every group size); each
        chunk's D2H copy starts right after its dispatch (per-chunk double
        buffering: chunk i's results travel home while chunk i+1 computes;
        staging all dispatches before any copy serialized the D2H tail
        after the last compute — same finding as FlatIPIndex.search).
        ``k`` is clamped to the searched snapshot's ntotal inside
        _get_fused; the returned arrays' width is that effective k."""
        fn, index, corpus_texts, ext_ids = self._get_fused(k)
        if not texts:
            return (
                np.zeros((0, min(k, index.ntotal)), np.float32),
                np.zeros((0, min(k, index.ntotal)), np.int32),
                corpus_texts,
                ext_ids,
            )
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        pending = []
        for lo in range(0, len(texts), self.query_batch_size):
            chunk = texts[lo : lo + self.query_batch_size]
            if self.pack_queries:
                ids, segs, slot_idx, slots = self._prepare_packed_queries(
                    list(chunk)
                )
                scores, indices = fn(
                    self.encoder.params, *index.search_arrays,
                    ids, segs, slot_idx, slots,
                )
            else:
                b = self._batch_bucket(max(len(chunk), 1))
                if b % n_dev != 0:
                    b = -(-b // n_dev) * n_dev
                # single-process: prepare_batch returns host numpy and jit's
                # in_shardings place it; multi-process: already globally
                # sharded
                batch = self.encoder.prepare_batch(
                    list(chunk), b, self.max_query_length
                )
                scores, indices = fn(
                    self.encoder.params,
                    *index.search_arrays,
                    batch["input_ids"],
                    batch["attention_mask"],
                )
            scores.copy_to_host_async()
            indices.copy_to_host_async()
            pending.append((scores, indices, len(chunk)))
        all_s = [np.asarray(s, np.float32)[:n] for s, _, n in pending]
        all_i = [np.asarray(i, np.int32)[:n] for _, i, n in pending]
        return (np.concatenate(all_s), np.concatenate(all_i), corpus_texts,
                ext_ids)

    def _selector_kwargs(self, allowed_ids, disallowed_ids,
                         ext_ids) -> Dict:
        """Translate per-request filters into index-tier selector kwargs —
        the FAISS ``SearchParameters(sel=...)`` analog. In stable_ids mode
        the ids are EXTERNAL ids (unknown ids simply never match, like a
        FAISS IDSelectorBatch holding absent ids); in positional mode they
        are corpus positions (range-checked by the tier)."""
        if allowed_ids is None and disallowed_ids is None:
            return {}
        if allowed_ids is not None and disallowed_ids is not None:
            raise ValueError(
                "give at most one of allowed_ids / disallowed_ids"
            )
        if self.stable_ids:
            ids = np.asarray(
                allowed_ids if allowed_ids is not None else disallowed_ids,
                np.int64,
            ).reshape(-1)
            mask = np.isin(np.asarray(ext_ids, np.int64), ids)
            if disallowed_ids is not None:
                mask = ~mask
            return {"selector": mask}
        if allowed_ids is not None:
            return {"allowed_ids": allowed_ids}
        return {"disallowed_ids": disallowed_ids}

    def query(
        self,
        texts: Sequence[str] | str,
        k: int = 10,
        *,
        return_passages: bool = True,
        allowed_ids=None,
        disallowed_ids=None,
        nprobe: Optional[int] = None,
        candidates: Optional[int] = None,
    ) -> List[Dict]:
        """Top-k passages per query text. Hits carry ``index`` (corpus
        position) and, in stable_ids mode, ``id`` (the external id).

        ``allowed_ids`` / ``disallowed_ids`` restrict the search to a
        passage subset (FAISS IDSelector analog) — external ids under
        stable_ids, corpus positions otherwise. ``nprobe`` (IVF tiers) and
        ``candidates`` (refine / IVF+PCA rerank pool) override the tuned
        index knobs for this call — the FAISS ``SearchParametersIVF`` /
        per-call parameter analog (FAISS search(..., params=...)).
        Requests carrying any of these take the two-dispatch path (the
        fused program bakes the tuned knobs and has no mask argument); each
        applies to this call only."""
        index, corpus_texts, ext_ids = self._state  # one consistent snapshot
        if index is None:
            raise RuntimeError("no index built; call build_index first")
        sel_kwargs = self._selector_kwargs(
            allowed_ids, disallowed_ids, ext_ids
        )
        if nprobe is not None:
            if not hasattr(index, "nprobe"):
                raise ValueError(
                    "nprobe applies to IVF indexes only (--index_type ivf)"
                )
            sel_kwargs["nprobe"] = int(nprobe)
        if candidates is not None:
            if not hasattr(index, "candidates"):
                raise ValueError(
                    "candidates applies to two-stage indexes only "
                    "(--index_type refine, or ivf with --ivf_reduced_dim)"
                )
            sel_kwargs["candidates"] = int(candidates)
        single = isinstance(texts, str)
        if single:
            texts = [texts]
        if (not sel_kwargs and self.fuse_encode_search
                and self.encoder.mesh is self.mesh):
            # the fused path re-snapshots internally (its compiled program,
            # corpus, AND k clamp must come from one state read); use ITS
            # texts/ids for hit decoration
            scores, indices, corpus_texts, ext_ids = self._query_fused(
                list(texts), k
            )
        elif not texts:
            k_eff = min(k, index.ntotal)
            scores = np.zeros((0, k_eff), np.float32)
            indices = np.zeros((0, k_eff), np.int32)
        else:
            k_eff = min(k, index.ntotal)
            q_emb = self.encoder.encode(
                list(texts),
                batch_size=self._batch_bucket(max(len(texts), 1)),
                max_length=self.max_query_length,
                description="Encoding queries",
            )
            scores, indices = index.search(
                q_emb, k=k_eff, batch_size=self.query_batch_size,
                **sel_kwargs,
            )
        results = []
        for qi in range(len(texts)):
            hits = []
            for score, idx in zip(scores[qi], indices[qi]):
                if idx < 0:
                    # IVF pads unreachable tail slots with -1/-inf (FAISS
                    # IVF semantics); never surface them as hits
                    continue
                hit = {"index": int(idx), "score": float(score)}
                if self.stable_ids:
                    hit["id"] = int(ext_ids[int(idx)])
                if return_passages:
                    hit["passage"] = corpus_texts[int(idx)]
                hits.append(hit)
            results.append({"query": texts[qi], "hits": hits})
        return results[0] if single else results

    @property
    def ntotal(self) -> int:
        return self.index.ntotal if self.index is not None else 0
