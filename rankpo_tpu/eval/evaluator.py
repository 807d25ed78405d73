"""Checkpoint-walking retrieval evaluator.

TPU-native rebuild of the reference evaluation harness (src/evaluate.py):
walk a model tree for checkpoints (config.json marker, :86-94), skip
already-evaluated ones unless overwrite (:169-184), then per checkpoint:
encode queries + corpus on the mesh, exact top-k search on the FlatIP engine
(replacing the encode→FAISS-CPU round-trip of :207-225 — embeddings never
leave HBM between encode and search), compute metrics at cutoffs, and write
metrics.json / -indices.npy / -scores.npy plus an aggregated
all_eval_results.json (:240-287).
"""

from __future__ import annotations

import json
import logging
import os
from datetime import datetime
from typing import Dict, List, Optional, Sequence

import numpy as np

from rankpo_tpu.data.datasets import load_eval_corpus, load_eval_queries
from rankpo_tpu.eval.metrics import compute_metrics
from rankpo_tpu.index import FlatIPIndex, InferenceEncoder

logger = logging.getLogger(__name__)


def get_save_path(
    model_path: str,
    output_dir: str,
    can_overwrite: bool = True,
    file_type: str = "json",
) -> str:
    """Result-path convention (reference evaluate.py:42-80):
    ``models/run-x/checkpoint-N`` → ``output_dir/run-x/checkpoint-N.json``;
    a bare model dir → ``output_dir/<name>/main.json``."""
    segs = os.path.normpath(model_path).split(os.sep)
    if len(segs) >= 2 and segs[-1].startswith("checkpoint-"):
        out = os.path.join(output_dir, segs[-2])
        filename = f"{segs[-1]}.{file_type}"
    else:
        out = os.path.join(output_dir, segs[-1])
        filename = f"main.{file_type}"
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, filename)
    if not can_overwrite and os.path.isfile(path):
        stem, ext = filename.rsplit(".", 1)
        stamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        path = os.path.join(out, f"{stem}_{stamp}.{ext}")
    return path


def find_checkpoints(model_path: str) -> List[str]:
    """Every directory under model_path containing a config.json
    (reference evaluate.py:86-94)."""
    found = []
    for dirpath, _dirnames, filenames in os.walk(model_path):
        if "config.json" in filenames:
            found.append(dirpath)
    return sorted(found)


def evaluate_checkpoint(
    model_path: str,
    query_texts: Sequence[str],
    labels: Sequence[Sequence[int]],
    corpus_texts: Sequence[str],
    *,
    tokenizer=None,
    mesh=None,
    batch_size: int = 256,
    max_query_length: int = 32,
    max_passage_length: int = 128,
    k: int = 100,
    cutoffs: Sequence[int] = (1, 5, 10, 20, 100),
    encoder: Optional[InferenceEncoder] = None,
    compute_dtype=None,
    index_type: str = "flat",
    index_recall_target: float = 0.95,
    index_kwargs: Optional[dict] = None,
):
    """Encode → index → search → metrics for one checkpoint.

    Returns ``(metrics, indices, scores)`` — the metric dict plus the raw
    [Q, k] search arrays the caller persists as ``-indices.npy`` /
    ``-scores.npy`` (reference evaluate.py:240-287).

    ``index_type='refine'`` swaps the exact FlatIP index for the two-stage
    RefineIPIndex (approximate, tuned to ``index_recall_target``): much
    faster on multi-million corpora, but metrics lose the bit-for-bit
    FAISS-parity guarantee — keep 'flat' when comparing against reference
    numbers."""
    if encoder is None:
        kwargs = {} if compute_dtype is None else {"compute_dtype": compute_dtype}
        encoder = InferenceEncoder.from_pretrained(
            model_path, tokenizer=tokenizer, mesh=mesh, **kwargs
        )
    # FAISS index_factory-style strings ("IVF4096,PQ64", "PCA128,Flat", ...)
    # resolve to a tier + constructor kwargs (rankpo_tpu/index/factory.py).
    # Resolve BEFORE the corpus encode: an invalid spec must fail in
    # milliseconds, not after minutes of embedding work.
    from rankpo_tpu.index.factory import resolve_index_spec

    index_type, index_kwargs = resolve_index_spec(index_type, index_kwargs)
    q_emb = encoder.encode(
        list(query_texts), batch_size=batch_size, max_length=max_query_length,
        description="Embedding queries",
    )
    # corpus embeddings feed ONLY the index: keep them on device end to end
    # (encode_sharded -> from_sharded; no full-matrix host round trip)
    c_emb_dev, n_corpus = encoder.encode_sharded(
        list(corpus_texts), batch_size=batch_size,
        max_length=max_passage_length, description="Embedding corpus",
    )
    if index_type == "refine":
        from rankpo_tpu.index import RefineIPIndex

        kwargs = dict(
            recall_target=index_recall_target,
            reduced_dim=min(256, int(c_emb_dev.shape[1])),
        )
        kwargs.update(index_kwargs)
        index = RefineIPIndex.from_sharded(
            c_emb_dev, n_corpus, mesh=mesh, **kwargs
        )
    elif index_type == "ivf":
        from rankpo_tpu.index import IVFIPIndex

        kwargs = dict(recall_target=index_recall_target)
        kwargs.update(index_kwargs)
        index = IVFIPIndex.from_sharded(
            c_emb_dev, n_corpus, mesh=mesh, **kwargs
        )
    else:
        index = FlatIPIndex.from_sharded(
            c_emb_dev, n_corpus, mesh=mesh, **index_kwargs
        )
    scores, indices = index.search(q_emb, k=k, batch_size=batch_size)
    invalid = indices < 0
    if invalid.any():
        # IVF pads unreachable tail slots with -1/-inf (FAISS IVF
        # semantics); sklearn's AUC/nDCG reject infinities, so clamp the
        # pad scores below every real score. The -1 ids never match a
        # label, so rank-based metrics already treat them as misses.
        finite_floor = float(scores[~invalid].min()) if (~invalid).any() else 0.0
        scores = np.where(invalid, finite_floor - 1.0, scores)
    metrics = compute_metrics(indices, scores, labels, cutoffs=list(cutoffs))
    return metrics, indices, scores


def evaluate_path(
    model_path: str,
    query_data: str,
    corpus_data: str,
    output_dir: str,
    *,
    evaluate_all_checkpoints: bool = False,
    overwrite_output_dir: bool = False,
    tokenizer=None,
    mesh=None,
    batch_size: int = 256,
    max_query_length: int = 32,
    max_passage_length: int = 128,
    k: int = 100,
    cutoffs: Sequence[int] = (1, 5, 10, 20, 100),
    save_arrays: bool = True,
    compute_dtype=None,
    index_type: str = "flat",
    index_recall_target: float = 0.95,
    index_kwargs: Optional[dict] = None,
) -> Dict[str, Dict[str, float]]:
    """Full harness over one model dir or all its checkpoints."""
    queries, labels = load_eval_queries(query_data)
    corpus = load_eval_corpus(corpus_data)
    logger.info("eval: %d queries over %d corpus items", len(queries), len(corpus))

    if evaluate_all_checkpoints:
        models = find_checkpoints(model_path)
    else:
        models = (
            [model_path]
            if os.path.isfile(os.path.join(model_path, "config.json"))
            else []
        )
    if not models:
        logger.error("no checkpoint found under %s", model_path)
        return {}

    import jax

    multiproc = jax.process_count() > 1
    results: Dict[str, Dict[str, float]] = {}
    save_path = None
    for model in models:
        save_path = get_save_path(model, output_dir, can_overwrite=True)
        skip = os.path.isfile(save_path) and not overwrite_output_dir
        if multiproc:
            # rank 0's filesystem decides for everyone: only rank 0 writes
            # metrics files, so with host-local disks the ranks would disagree
            # and deadlock the collective encode (some skipping, some not)
            from jax.experimental import multihost_utils

            skip = bool(multihost_utils.broadcast_one_to_all(np.int32(skip)))
        if skip:
            logger.warning("skip %s: results exist at %s", model, save_path)
            continue
        logger.info("evaluating %s", model)
        metrics, indices, scores = evaluate_checkpoint(
            model,
            queries,
            labels,
            corpus,
            tokenizer=tokenizer,
            mesh=mesh,
            batch_size=batch_size,
            max_query_length=max_query_length,
            max_passage_length=max_passage_length,
            k=k,
            cutoffs=cutoffs,
            compute_dtype=compute_dtype,
            index_type=index_type,
            index_recall_target=index_recall_target,
            index_kwargs=index_kwargs,
        )
        if jax.process_index() != 0:  # multi-host: rank 0 owns the artifacts
            results[os.path.basename(save_path).split(".")[0]] = metrics
            continue
        with open(save_path, "w") as f:
            json.dump(metrics, f, indent=4)
        if save_arrays:
            stem = save_path.rsplit(".", 1)[0]
            # int64 to match the dtype FAISS search returns (npy drop-in compat)
            np.save(stem + "-indices.npy", indices.astype(np.int64))
            np.save(stem + "-scores.npy", scores.astype(np.float32))
        results[os.path.basename(save_path).split(".")[0]] = metrics
        logger.info("results: %s", metrics)

    # aggregate (reference evaluate.py:281-287): rank 0 only (concurrent 'w'
    # opens from N processes interleave/truncate), rebuilt from the on-disk
    # per-checkpoint metrics so previously-skipped checkpoints are included
    # and the file never goes stale after an incremental re-run
    if save_path is not None and jax.process_index() == 0:
        agg_results: Dict[str, Dict[str, float]] = {}
        for model in models:
            sp = get_save_path(model, output_dir, can_overwrite=True)
            if os.path.isfile(sp):
                with open(sp) as f:
                    agg_results[os.path.basename(sp).split(".")[0]] = json.load(f)
        if agg_results:
            agg = os.path.join(
                os.path.dirname(save_path), "all_eval_results.json"
            )
            with open(agg, "w") as f:
                json.dump(agg_results, f, indent=4)
    return results
