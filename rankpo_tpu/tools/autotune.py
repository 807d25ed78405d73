"""Index auto-tuner: the FAISS ParameterSpace / autotune analog.

FAISS users pick index configurations by sweeping factory strings against
an AutoTuneCriterion (recall at a time budget); the reference sidesteps the
question by always building IndexFlatIP (src/utils.py:38-51). This tool
answers it for the TPU tiers: given corpus embeddings, it builds a ladder
of candidate factory specs (index/factory.py grammar), measures each one's
recall@k against the exact fp32 engine, its query throughput, and its
device-memory footprint, and recommends the fastest spec that meets the
recall target inside the memory budget.

Measurement notes:
  - Recall is hit-set overlap vs FlatIPIndex fp32 (FAISS-exact contract).
  - QPS times ``index.search`` wall-clock including D2H — the same path
    every consumer (eval, mining, serving fallback) uses, so candidates
    are compared on identical footing. Through the dev tunnel the ~27 ms
    dispatch floor inflates all candidates equally; relative order stands.
  - Memory sums the device bytes of every jax.Array the index holds
    (storage, scales, centroids, projections, codebooks).
  - Build cost is reported but never optimized for: indexes build once.
"""

from __future__ import annotations

import logging
import math
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def default_specs(n: int, dim: int) -> List[str]:
    """A candidate ladder spanning the memory/recall trade-off at this
    corpus size: exact fp32, half/quarter-width storage, PCA-prefiltered
    refine, IVF (auto cluster count) over fp32/bf16-free/int8 rows, and
    the PQ codec tiers when the width divides."""
    specs = ["Flat", "SQbf16", "SQ8"]
    if dim >= 64:
        specs.append(f"PCA{max(32, dim // 8)},Flat")
    if n >= 4096:  # IVF needs enough rows for meaningful clusters
        specs += ["IVF,Flat", "IVF,SQ8"]
        if dim % 16 == 0:
            m = dim // 16
            specs += [f"IVF,PQ{m}", f"OPQ{m},IVF,PQ{m}"]
    return specs


def _device_bytes(index) -> int:
    import jax

    total = 0
    for value in vars(index).values():
        if isinstance(value, jax.Array):
            total += value.nbytes
    return total


def autotune_index(
    embeddings: np.ndarray,
    *,
    queries: Optional[np.ndarray] = None,
    k: int = 100,
    recall_target: float = 0.95,
    memory_budget_gb: Optional[float] = None,
    mesh=None,
    specs: Optional[Sequence[str]] = None,
    n_queries: int = 256,
    repeats: int = 3,
    batch_size: int = 1024,
    seed: int = 0,
) -> Dict:
    """Benchmark candidate factory specs on ``embeddings`` and recommend one.

    Returns {"results": [per-spec dicts], "best": spec|None, "k": k,
    "recall_target": ...}. ``best`` is the highest-QPS spec with
    recall >= recall_target and memory within budget; None if nothing
    qualifies (the results table still ranks every candidate). Specs that
    fail to build (e.g. PQ block width not dividing dim) are reported with
    an ``error`` instead of crashing the sweep.
    """
    from rankpo_tpu.index import FlatIPIndex, IVFIPIndex, RefineIPIndex
    from rankpo_tpu.index.factory import resolve_index_spec

    embeddings = np.asarray(embeddings, np.float32)
    n, dim = embeddings.shape
    k = min(k, n)
    if queries is None:
        # self-queries with small noise: non-degenerate neighborhoods while
        # every query keeps a well-defined exact answer
        rng = np.random.default_rng(seed)
        picks = rng.choice(n, size=min(n_queries, n), replace=False)
        queries = embeddings[picks] + 0.01 * rng.standard_normal(
            (len(picks), dim)
        ).astype(np.float32)
    queries = np.asarray(queries, np.float32)

    oracle = FlatIPIndex(embeddings, mesh=mesh)
    _, exact_ids = oracle.search(queries, k=k, batch_size=batch_size)
    exact_sets = [set(map(int, row[row >= 0])) for row in exact_ids]
    budget_bytes = (
        memory_budget_gb * (1 << 30) if memory_budget_gb is not None else None
    )

    results: List[Dict] = []
    for spec in (specs if specs is not None else default_specs(n, dim)):
        kind, kwargs = resolve_index_spec(spec)
        row: Dict = {"spec": spec, "kind": kind}
        try:
            t0 = time.perf_counter()
            if kind == "refine":
                kwargs.setdefault("recall_target", recall_target)
                index = RefineIPIndex(embeddings, mesh=mesh, **kwargs)
            elif kind == "ivf":
                kwargs.setdefault("recall_target", recall_target)
                index = IVFIPIndex(embeddings, mesh=mesh, **kwargs)
            else:
                index = FlatIPIndex(embeddings, mesh=mesh, **kwargs)
            row["build_s"] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # report, don't kill the sweep
            row["error"] = str(e)
            results.append(row)
            logger.warning("autotune: %s failed to build: %s", spec, e)
            continue

        try:
            _, ids = index.search(queries, k=k, batch_size=batch_size)
            hits = sum(
                len(exact_sets[i] & set(map(int, ids[i][ids[i] >= 0])))
                for i in range(len(queries))
            )
            # keep the UNROUNDED recall for the feasibility comparison:
            # rounding first can lift a spec genuinely below target into
            # "feasible" (0.94996 -> 0.95); round only for the report
            recall = hits / max(1, sum(map(len, exact_sets)))
            row["recall"] = round(recall, 4)

            best_dt = math.inf
            for _ in range(repeats):
                t0 = time.perf_counter()
                index.search(queries, k=k, batch_size=batch_size)
                best_dt = min(best_dt, time.perf_counter() - t0)
        except Exception as e:  # e.g. a spec whose tuned nprobe OOMs on
            row["error"] = str(e)  # this chip: rank it out, keep the sweep
            results.append(row)
            logger.warning("autotune: %s failed to search: %s", spec, e)
            del index
            continue
        row["qps"] = round(len(queries) / best_dt, 1)
        mem_bytes = _device_bytes(index)
        row["memory_mb"] = round(mem_bytes / (1 << 20), 2)
        row["feasible"] = bool(
            recall >= recall_target
            and (budget_bytes is None or mem_bytes <= budget_bytes)
        )
        results.append(row)
        del index

    feasible = [r for r in results if r.get("feasible")]
    best = max(feasible, key=lambda r: r["qps"])["spec"] if feasible else None
    results.sort(key=lambda r: (-r.get("qps", -1.0)))
    return {
        "results": results,
        "best": best,
        "k": k,
        "recall_target": recall_target,
        "n": n,
        "dim": dim,
        "n_queries": int(len(queries)),
    }
