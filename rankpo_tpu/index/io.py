"""Structural index persistence — FAISS ``write_index``/``read_index`` analog.

The reference never persists its index: ``evaluate.py`` re-encodes the corpus
and rebuilds ``IndexFlatIP`` on every run (src/utils.py:38-56). FAISS users
get ``write_index``/``read_index``; this module is that surface for the TPU
index tiers. The serving layer's legacy ``save_index`` stored the fp32
embedding matrix and REBUILT the index at load — which re-runs k-means
(minutes at 10M rows), the PCA eigendecomposition, and the recall tuner on
every restart, and round-trips int8 storage through a lossy
dequantize/requantize. The structural format instead captures the built
artifacts themselves (cluster-major storage, centroids, projections,
quantization scales, tuned knobs), so a load is pure placement: host ->
device, no training, no tuning, bit-identical search results.

Format: one ``.npz`` holding the index's device arrays (bf16 stored as a
uint16 view — npy has no bfloat16 — with per-array dtype names recorded) plus
a ``__index_config__`` JSON string (kind, shapes, tuned knobs, and the shard
count the knobs were tuned at). Loading onto a DIFFERENT mesh width is
supported: flat/refine re-pad rows to the new shard multiple; IVF requires
``n_clusters % n_shards == 0`` (whole-cluster sharding) and rescales the
tuned per-shard ``nprobe`` to preserve the total probed-cluster count.

Multi-process: ``index_state`` gathers sharded arrays across hosts (every
process must call it — the gather is collective); write the file on rank 0.
Loading places arrays with the same collective-safe helpers the constructors
use (every process reads the same file).
"""

from __future__ import annotations

import json
import threading
from typing import Dict, Mapping, Optional

import numpy as np

CONFIG_KEY = "__index_config__"
FORMAT = "rankpo-index-v1"

_DTYPE_NAMES = ("float32", "bfloat16", "float16", "int8", "int32", "uint8")


def _bf16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def _fetch(arr) -> Optional[np.ndarray]:
    """Device array -> host numpy. Sharded arrays spanning other processes
    are gathered collectively (tiled over dim 0 — the row/cluster layout all
    index arrays use); fully-replicated arrays read locally."""
    if arr is None:
        return None
    import jax

    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        if not arr.is_fully_replicated:
            from jax.experimental import multihost_utils

            arr = multihost_utils.process_allgather(arr, tiled=True)
    return np.asarray(arr)


def _pack(out: Dict[str, np.ndarray], meta: Dict[str, str], name: str, arr,
          trim: Optional[int] = None):
    """Record one HOST-fetched array (fetch first — slicing a sharded
    device array spanning other processes is not supported; ``trim`` cuts
    padding rows after the fetch)."""
    arr = _fetch(arr)
    if arr is None:
        return
    if trim is not None:
        arr = arr[:trim]
    if arr.dtype == _bf16():
        out[name] = arr.view(np.uint16)
        meta[name] = "bfloat16"
    else:
        dname = arr.dtype.name
        if dname not in _DTYPE_NAMES:
            raise ValueError(f"unsupported index array dtype {arr.dtype}")
        out[name] = arr
        meta[name] = dname


def _unpack(data: Mapping, meta: Dict[str, str], name: str
            ) -> Optional[np.ndarray]:
    if name not in meta:
        return None
    arr = np.asarray(data[name])
    if meta[name] == "bfloat16":
        return arr.view(_bf16())
    return arr


def _jnp_dtype(name: str):
    import jax.numpy as jnp

    return jnp.dtype(name)


def _n_shards(mesh) -> int:
    from rankpo_tpu.core.mesh import DATA_AXIS

    return mesh.shape[DATA_AXIS] if mesh is not None else 1


def _put_rows(x: np.ndarray, mesh):
    import jax
    import jax.numpy as jnp

    from rankpo_tpu.core.mesh import shard_rows_to_mesh

    if mesh is None:
        return jax.device_put(jnp.asarray(x))
    return shard_rows_to_mesh(np.asarray(x), mesh)


def _put_replicated(x: np.ndarray, mesh):
    import jax
    import jax.numpy as jnp

    from rankpo_tpu.core.mesh import replicate_to_mesh

    if mesh is None:
        return jax.device_put(jnp.asarray(x))
    return replicate_to_mesh(np.asarray(x), mesh)


def _pad_rows(x: np.ndarray, n_padded: int, fill=0.0) -> np.ndarray:
    if x.shape[0] == n_padded:
        return x
    pad_shape = (n_padded - x.shape[0],) + x.shape[1:]
    return np.concatenate(
        [x, np.full(pad_shape, fill, dtype=x.dtype)], axis=0
    )


# ----------------------------------------------------------------------
# state capture


def index_state(index) -> Dict[str, np.ndarray]:
    """Flat dict of host arrays + a JSON config capturing everything needed
    to reconstruct ``index`` without re-training or re-tuning. Collective
    when the index is sharded across processes."""
    from rankpo_tpu.index.flat import FlatIPIndex
    from rankpo_tpu.index.ivf import IVFIPIndex
    from rankpo_tpu.index.refined import RefineIPIndex

    out: Dict[str, np.ndarray] = {}
    meta: Dict[str, str] = {}
    cfg: Dict = {
        "format": FORMAT,
        "n_total": index.n_total,
        "dim": index.dim,
        "tuned_shards": _n_shards(index.mesh),
    }
    if isinstance(index, FlatIPIndex):
        cfg["kind"] = "flat"
        cfg["dtype"] = (
            "int8" if index.quantized else np.dtype(index.dtype).name
        )
        cfg["recall_target"] = index.recall_target
        cfg["precision"] = index.precision
        _pack(out, meta, "corpus", index.corpus, trim=index.n_total)
        if index.quantized:
            _pack(out, meta, "row_scale", index.row_scale, trim=index.n_total)
    elif isinstance(index, RefineIPIndex):
        cfg["kind"] = "refine"
        cfg["store_dtype"] = np.dtype(index.store_dtype).name
        cfg["recall_target"] = index.recall_target
        cfg["reduced_dim"] = index.reduced_dim
        cfg["candidates"] = int(index.candidates)
        _pack(out, meta, "corpus", index.corpus, trim=index.n_total)
        _pack(out, meta, "corpus_low", index.corpus_low, trim=index.n_total)
        _pack(out, meta, "proj", index.proj)
    elif isinstance(index, IVFIPIndex):
        cfg["kind"] = "ivf"
        cfg["store_dtype"] = (
            "int8" if index.quantized else np.dtype(index.store_dtype).name
        )
        cfg["recall_target"] = index.recall_target
        cfg["n_clusters"] = index.n_clusters
        cfg["capacity"] = index.capacity
        # the EFFECTIVE per-shard probe count (search clamps to the local
        # cluster count; persisting the raw value would inflate the total
        # probed count reconstructed on a different mesh width)
        cfg["nprobe"] = int(min(index.nprobe, index.local_clusters))
        cfg["spherical"] = index.spherical
        cfg["reduced_dim"] = index.reduced_dim
        cfg["pq_m"] = index.pq_m
        cfg["pq_rotate"] = getattr(index, "pq_rotate", "none")
        cfg["pq_layout"] = getattr(index, "pq_layout", None)
        cfg["balance_eta"] = getattr(index, "balance_eta", 0.0)
        cfg["kmeans_split"] = getattr(index, "kmeans_split", 0)
        if getattr(index, "_assign_bias_host", None) is not None:
            # balanced-k-means assignment bias: appends to a loaded index
            # must place new rows by the same biased scores the build used
            _pack(out, meta, "assign_bias", index._assign_bias_host)
        cfg["candidates"] = (
            index.candidates if index.candidates == "auto"
            else int(index.candidates)
        )
        _pack(out, meta, "corpus", index.corpus)
        _pack(out, meta, "row_ids", index.row_ids)
        _pack(out, meta, "centroids", index.centroids)
        if index.quantized:
            _pack(out, meta, "slot_scale", index.slot_scale)
        if index.pq_m is not None:
            # fp32 host codebooks [m, 256, ds]; the device bf16 search copy
            # is re-derived at load (bit-identical cast)
            _pack(out, meta, "pq_codebooks", index._codebooks_host)
            if index._rotation_host is not None:
                # fp32 orthogonal [D, D] pre-rotation (pq_rotate)
                _pack(out, meta, "pq_rotation", index._rotation_host)
        if index.reduced_dim is not None:
            _pack(out, meta, "proj", index.proj)
            _pack(out, meta, "corpus_low", index.corpus_low)
    else:
        raise TypeError(f"unsupported index type {type(index).__name__}")
    cfg["arrays"] = meta
    out[CONFIG_KEY] = np.asarray(json.dumps(cfg))
    return out


def is_index_state(data: Mapping) -> bool:
    return CONFIG_KEY in getattr(data, "files", data)


# ----------------------------------------------------------------------
# reconstruction


def _load_flat(cfg, data, meta, mesh):
    import jax.numpy as jnp

    from rankpo_tpu.index.flat import FlatIPIndex

    self = FlatIPIndex.__new__(FlatIPIndex)
    self.mesh = mesh
    self.recall_target = cfg["recall_target"]
    self.precision = cfg["precision"]
    self.n_total = int(cfg["n_total"])
    self.dim = int(cfg["dim"])
    self.dtype = _jnp_dtype(cfg["dtype"])
    self.quantized = self.dtype == jnp.int8
    n_shards = _n_shards(mesh)
    pad = (-self.n_total) % n_shards
    self.n_padded = self.n_total + pad
    corpus = _pad_rows(_unpack(data, meta, "corpus"), self.n_padded)
    self.corpus = _put_rows(corpus, mesh)
    if self.quantized:
        # pad scales with the quantizer's zero-row floor (padding rows are
        # all-zero codes, so any positive scale yields score 0; masked by
        # n_valid anyway)
        scale = _pad_rows(
            _unpack(data, meta, "row_scale"), self.n_padded, fill=1e-12
        )
        self.row_scale = _put_rows(scale, mesh)
    else:
        self.row_scale = None
    self._n_valid_dev = self._put_n_valid()
    self._search_fns = {}
    self._search_lock = threading.Lock()
    return self


def _load_refine(cfg, data, meta, mesh):
    from rankpo_tpu.index.refined import RefineIPIndex

    self = RefineIPIndex.__new__(RefineIPIndex)
    self.mesh = mesh
    self.n_total = int(cfg["n_total"])
    self.dim = int(cfg["dim"])
    self.reduced_dim = int(cfg["reduced_dim"])
    self.recall_target = cfg["recall_target"]
    self.store_dtype = _jnp_dtype(cfg["store_dtype"])
    self.candidates = int(cfg["candidates"])
    n_shards = _n_shards(mesh)
    pad = (-self.n_total) % n_shards
    self.n_padded = self.n_total + pad
    self._shard_rows = self.n_padded // n_shards
    self.corpus = _put_rows(
        _pad_rows(_unpack(data, meta, "corpus"), self.n_padded), mesh
    )
    self.corpus_low = _put_rows(
        _pad_rows(_unpack(data, meta, "corpus_low"), self.n_padded), mesh
    )
    self.proj = _put_replicated(_unpack(data, meta, "proj"), mesh)
    self._n_valid_dev = self._put_n_valid()
    self._search_fns = {}
    self._search_lock = threading.Lock()
    return self


def _load_ivf(cfg, data, meta, mesh):
    from rankpo_tpu.index.ivf import IVFIPIndex

    self = IVFIPIndex.__new__(IVFIPIndex)
    self.mesh = mesh
    self.n_total = int(cfg["n_total"])
    self.dim = int(cfg["dim"])
    self._set_store(_jnp_dtype(cfg["store_dtype"]))
    self.recall_target = cfg["recall_target"]
    self.spherical = bool(cfg["spherical"])
    rd = cfg["reduced_dim"]
    self._set_hybrid(rd, cfg["candidates"])
    # layout is a PHYSICAL property of the saved codes — restore verbatim
    # (legacy files predate pq_layout: always rows). A 'cols' index is
    # single-device; _set_pq rejects it on a mesh with a clear message.
    self._set_pq(
        cfg.get("pq_m"), 1, cfg.get("pq_rotate", "none"),
        cfg.get("pq_layout") or "rows",
    )
    self.balance_eta = float(cfg.get("balance_eta", 0.0))
    self.kmeans_split = int(cfg.get("kmeans_split", 0))
    self._set_assign_bias(_unpack(data, meta, "assign_bias"))
    self.n_clusters = int(cfg["n_clusters"])
    self.capacity = int(cfg["capacity"])
    n_shards = _n_shards(mesh)
    if self.n_clusters % n_shards:
        raise ValueError(
            f"saved IVF index has {self.n_clusters} clusters, not divisible "
            f"by {n_shards} shards — rebuild for this mesh or load unsharded"
        )
    self.local_clusters = self.n_clusters // n_shards
    # preserve the TOTAL probed-cluster count across mesh widths: nprobe is
    # per-shard, and the saved value was tuned at tuned_shards
    total_probed = int(cfg["nprobe"]) * max(int(cfg["tuned_shards"]), 1)
    self.nprobe = max(
        1, min(-(-total_probed // n_shards), self.local_clusters)
    )

    row_ids = _unpack(data, meta, "row_ids")
    self._set_layout_maps(row_ids)
    centroids = _unpack(data, meta, "centroids")
    self._centroids_host = centroids.astype(np.float32, copy=False)
    self.corpus = _put_rows(_unpack(data, meta, "corpus"), mesh)
    self.row_ids = _put_rows(row_ids, mesh)
    self.centroids = _put_rows(centroids, mesh)
    self.slot_scale = (
        _put_rows(_unpack(data, meta, "slot_scale"), mesh)
        if self.quantized else None
    )
    if self.pq_m is not None:
        self._codebooks_host = _unpack(
            data, meta, "pq_codebooks"
        ).astype(np.float32, copy=False)
        if self.pq_rotate != "none":
            self._rotation_host = _unpack(
                data, meta, "pq_rotation"
            ).astype(np.float32, copy=False)
        self._place_codebooks()
    if self.reduced_dim is not None:
        self.proj = _put_replicated(_unpack(data, meta, "proj"), mesh)
        self.corpus_low = _put_rows(_unpack(data, meta, "corpus_low"), mesh)
    else:
        self.proj = None
        self.corpus_low = None
    self._search_fns = {}
    self._search_lock = threading.Lock()
    return self


_LOADERS = {"flat": _load_flat, "refine": _load_refine, "ivf": _load_ivf}


def index_from_state(data: Mapping, mesh=None):
    """Reconstruct an index from ``index_state`` output (or a loaded npz).
    Pure placement — no k-means, no PCA, no tuner; search results are
    bit-identical to the saved index on the same mesh width."""
    cfg = json.loads(str(np.asarray(data[CONFIG_KEY])))
    if cfg.get("format") != FORMAT:
        raise ValueError(f"unknown index file format {cfg.get('format')!r}")
    kind = cfg["kind"]
    if kind not in _LOADERS:
        raise ValueError(f"unknown index kind {kind!r}")
    return _LOADERS[kind](cfg, data, cfg["arrays"], mesh)


def state_kind(data: Mapping) -> str:
    return json.loads(str(np.asarray(data[CONFIG_KEY])))["kind"]


# ----------------------------------------------------------------------
# file surface (FAISS write_index / read_index analog)


def write_index(index, path: str) -> None:
    """Persist a built index structurally. Multi-process: every process must
    call (the state gather is collective) and every process writes — hosts
    with per-host disks each need a copy for restart; on a shared filesystem
    the writes are identical bytes and land via atomic rename."""
    save_state(index_state(index), path)


def save_state(state: Dict[str, np.ndarray], path: str) -> None:
    """npz write via temp file + atomic rename (identical concurrent writers
    — the multi-process case above — cannot interleave partial files). The
    temp name carries a uuid, not just the PID: on a shared filesystem two
    hosts' writers routinely collide on PID (containers all run as a low
    identical PID), and a shared temp file would let writer B keep writing
    into the inode writer A just published."""
    import os
    import uuid

    if not path.endswith(".npz"):
        path += ".npz"
    tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    try:
        with open(tmp, "wb") as f:
            np.savez_compressed(f, **state)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def read_index(path: str, mesh=None):
    """Load a structurally-saved index onto ``mesh`` (or unsharded)."""
    with np.load(path, allow_pickle=False) as data:
        return index_from_state(data, mesh)
