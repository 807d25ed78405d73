"""FAISS ``index_factory`` analog: one spec string -> (index_type, kwargs).

The reference only ever builds ``faiss.IndexFlatIP`` (src/utils.py:38-51),
but FAISS users configure indexes through factory strings like
``"OPQ64,IVF4096,PQ64"``; this module maps that grammar onto the repo's
index tiers so CLIs and the serving layer accept one familiar knob instead
of a JSON kwargs dict:

    Flat                  -> flat, fp32 rows (exact, FAISS-parity default)
    SQ8 / SQbf16          -> flat with int8 / bfloat16 storage
    PCA128,Flat           -> refine (PCA prefilter in d'=128 + exact rerank)
    IVF4096,Flat          -> ivf with 4096 clusters, bf16 storage
    IVF4096,SQ8           -> ivf with int8 storage
    IVF4096,PQ64          -> ivf + product-quantized residual codes (m=64)
    OPQ64,IVF4096,PQ64    -> same, with the OPQ learned rotation
    RR64,IVF4096,PQ64     -> same, with the seeded random rotation
    PCA128,IVF4096,Flat   -> ivf + PCA probe-scoring hybrid (reduced_dim)

Semantics notes vs FAISS (documented, intentional): our ``PCA`` prefilter
reranks candidates at FULL width (FAISS PCAMatrix transforms the stored
rows — strictly lossy), so recall here is *higher* at equal d'. ``IVF``
auto-tunes nprobe at build time against ``recall_target`` instead of
exposing a runtime nprobe handle (pass nprobe explicitly via kwargs to
pin it). Component spellings are case-insensitive.
"""

from __future__ import annotations

import re
from typing import Tuple


_IVF = re.compile(r"^ivf(\d+)?$")
_PCA = re.compile(r"^pca(?:r|w)?(\d+)$")  # PCAR/PCAW accepted as PCA
_PQ = re.compile(r"^pq(\d+)$")
_OPQ = re.compile(r"^opq(\d+)?$")
_RR = re.compile(r"^rr(\d+)?$")
_SQ = re.compile(r"^sq(8|bf16|fp16)$")


def parse_index_spec(spec: str) -> Tuple[str, dict]:
    """Parse a factory string into ``(index_type, index_kwargs)`` consumable
    by RetrievalService / evaluate / the mining tools.

    Raises ValueError with a pointed message on unknown or inconsistent
    components.
    """
    if not spec or not spec.strip():
        raise ValueError("empty index factory spec")
    parts = [p.strip().lower() for p in spec.split(",") if p.strip()]
    if not parts:
        raise ValueError(f"empty index factory spec: {spec!r}")

    pca_dim = None
    ivf = False
    n_clusters = None
    pq_m = None
    rotate = None  # 'opq' | 'random'
    rotate_m = None
    store = None  # 'int8' | 'bfloat16' | None (tier default)
    flat_seen = False

    for part in parts:
        m = _PCA.match(part)
        if m:
            if pca_dim is not None:
                raise ValueError(f"duplicate PCA component in {spec!r}")
            pca_dim = int(m.group(1))
            continue
        m = _IVF.match(part)
        if m:
            if ivf:
                raise ValueError(f"duplicate IVF component in {spec!r}")
            ivf = True
            if m.group(1):
                n_clusters = int(m.group(1))
            continue
        m = _PQ.match(part)
        if m:
            if pq_m is not None:
                raise ValueError(f"duplicate PQ component in {spec!r}")
            pq_m = int(m.group(1))
            continue
        m = _OPQ.match(part)
        if m:
            if rotate is not None:
                raise ValueError(f"duplicate rotation component in {spec!r}")
            rotate = "opq"
            rotate_m = int(m.group(1)) if m.group(1) else None
            continue
        m = _RR.match(part)
        if m:
            if rotate is not None:
                raise ValueError(f"duplicate rotation component in {spec!r}")
            rotate = "random"
            rotate_m = int(m.group(1)) if m.group(1) else None
            continue
        m = _SQ.match(part)
        if m:
            import jax.numpy as jnp

            if store is not None:
                raise ValueError(f"duplicate SQ component in {spec!r}")
            kind = m.group(1)
            if kind == "8":
                store = jnp.int8
            elif kind in ("bf16", "fp16"):
                # no fp16 on TPU storage; bf16 is the half-width tier
                store = jnp.bfloat16
            continue
        if part == "flat":
            flat_seen = True
            continue
        raise ValueError(
            f"unknown index_type / factory component {part!r} in {spec!r}; "
            "expected a tier name (flat|refine|ivf) or factory components: "
            "Flat, SQ8, SQbf16, PCA<d>, IVF<n>, PQ<m>, OPQ<m>, RR<m>"
        )

    if rotate is not None and pq_m is None:
        raise ValueError(
            f"{spec!r}: OPQ/RR rotations apply to PQ codes; add a PQ<m> "
            "component"
        )
    if rotate_m is not None and pq_m is not None and rotate_m != pq_m:
        raise ValueError(
            f"{spec!r}: rotation block count {rotate_m} != PQ m {pq_m} "
            "(FAISS requires these to match; so do we)"
        )
    if pq_m is not None and not ivf:
        raise ValueError(
            f"{spec!r}: flat PQ is not implemented — PQ codes ride the IVF "
            "tier (use IVF<n>,PQ<m>)"
        )

    kwargs: dict = {}
    if ivf:
        if n_clusters is not None:
            kwargs["n_clusters"] = n_clusters
        if pq_m is not None:
            kwargs["pq_m"] = pq_m
            if rotate is not None:
                kwargs["pq_rotate"] = rotate
        if pca_dim is not None:
            kwargs["reduced_dim"] = pca_dim
        if store is not None:
            if pq_m is not None:
                raise ValueError(
                    f"{spec!r}: PQ codes replace row storage; drop the SQ "
                    "component"
                )
            kwargs["store_dtype"] = store
        return "ivf", kwargs

    if pca_dim is not None:
        import jax.numpy as jnp

        kwargs["reduced_dim"] = pca_dim
        if store == jnp.int8:
            raise ValueError(
                f"{spec!r}: the PCA refine tier reranks on fp32/bf16 rows; "
                "int8 storage is a flat/IVF option"
            )
        if store is not None:
            kwargs["store_dtype"] = store
        return "refine", kwargs

    if store is not None:
        kwargs["dtype"] = store
        return "flat", kwargs
    if flat_seen or not parts:
        return "flat", {}
    # pure-storage specs like "SQ8" fall through above; anything else that
    # reaches here had only consumed components
    return "flat", kwargs


def resolve_index_spec(index_type: str, index_kwargs=None) -> Tuple[str, dict]:
    """CLI bridge: if ``index_type`` looks like a factory string (contains a
    comma or a digit — plain tier names never do), parse it and MERGE with
    any explicit ``index_kwargs`` (explicit kwargs win). Plain tier names
    pass through untouched."""
    index_kwargs = dict(index_kwargs or {})
    if index_type in ("flat", "refine", "ivf"):
        return index_type, index_kwargs
    kind, kwargs = parse_index_spec(index_type)
    kwargs.update(index_kwargs)
    return kind, kwargs
