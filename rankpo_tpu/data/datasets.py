"""Tokenized in-memory datasets for the three jsonl schemas.

The reference tokenizes with ``datasets.map`` on the rank-0 process
(src/run_contrastive.py:155-180, src/rankpo_trainer.py:326-372). The corpora
here are small enough (research-scale jsonl) that an eager in-process
tokenize-on-load with a multiprocessing pool is simpler and equally fast; the
result is plain python lists of variable-length id sequences consumed by the
static-shape collators.
"""

from __future__ import annotations

import logging
from typing import List, Tuple

from rankpo_tpu.utils.jsonl import iter_jsonl

logger = logging.getLogger(__name__)


def _batch_tokenize(tokenizer, texts: List[str], max_length: int) -> List[list]:
    """One batched tokenizer call (lets Rust tokenizers parallelize) instead of
    per-row calls — the throughput analog of the reference's num_proc map."""
    if not texts:
        return []
    return tokenizer(texts, max_length=max_length, truncation=True)["input_ids"]


class ContrastiveDataset:
    """Rows of {query, positives[], negatives[]} (reference
    run_contrastive.py:161-166 tokenize_row)."""

    def __init__(
        self,
        path_or_rows,
        tokenizer,
        max_query_length: int = 32,
        max_passage_length: int = 128,
    ):
        rows = (
            list(iter_jsonl(path_or_rows))
            if isinstance(path_or_rows, str)
            else list(path_or_rows)
        )
        queries = _batch_tokenize(
            tokenizer, [r["query"] for r in rows], max_query_length
        )
        flat_pos, flat_neg = [], []
        pos_span, neg_span = [], []
        for r in rows:
            pos_span.append((len(flat_pos), len(r["positives"])))
            flat_pos.extend(r["positives"])
            neg_span.append((len(flat_neg), len(r["negatives"])))
            flat_neg.extend(r["negatives"])
        pos_ids = _batch_tokenize(tokenizer, flat_pos, max_passage_length)
        neg_ids = _batch_tokenize(tokenizer, flat_neg, max_passage_length)

        self.rows: List[dict] = []
        for i in range(len(rows)):
            p_off, p_n = pos_span[i]
            n_off, n_n = neg_span[i]
            self.rows.append(
                {
                    "query": queries[i],
                    "positives": pos_ids[p_off : p_off + p_n],
                    "negatives": neg_ids[n_off : n_off + n_n],
                }
            )

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, i: int) -> dict:
        return self.rows[i]


class PairPreferenceDataset:
    """Annotated pairs → (query, chosen, rejected) via the ``preferred`` A/B
    rule (reference rankpo_trainer.py:354-372 tokenize_row). Extra AI-judge
    fields in the jsonl (response, usage, confidence_score, ...) are ignored,
    matching the reference which consumes only query/passage1/passage2/preferred.
    """

    def __init__(
        self,
        path_or_rows,
        tokenizer,
        max_query_length: int = 32,
        max_passage_length: int = 128,
    ):
        rows = (
            list(iter_jsonl(path_or_rows))
            if isinstance(path_or_rows, str)
            else list(path_or_rows)
        )
        chosen_texts, rejected_texts = [], []
        for row in rows:
            preferred = row["preferred"]
            if preferred == "A":
                chosen, rejected = row["passage1"], row["passage2"]
            elif preferred == "B":
                chosen, rejected = row["passage2"], row["passage1"]
            else:
                raise ValueError(
                    f"Unsupported 'preferred' value {preferred!r}; expected 'A' or 'B'"
                )
            chosen_texts.append(chosen)
            rejected_texts.append(rejected)
        queries = _batch_tokenize(
            tokenizer, [r["query"] for r in rows], max_query_length
        )
        chosen_ids = _batch_tokenize(tokenizer, chosen_texts, max_passage_length)
        rejected_ids = _batch_tokenize(tokenizer, rejected_texts, max_passage_length)
        self.rows: List[dict] = [
            {"query": q, "chosen": c, "rejected": r}
            for q, c, r in zip(queries, chosen_ids, rejected_ids)
        ]

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, i: int) -> dict:
        return self.rows[i]


class StreamingContrastiveDataset:
    """Lazy variant for corpora larger than host RAM: rows stay on disk (line
    offsets via the C++ mmap scanner when built, else a python scan) and are
    parsed + tokenized per access. The DataLoader's prefetch thread overlaps
    this host work with device compute, so the train loop sees the same
    interface as the eager dataset at O(1) resident memory."""

    def __init__(
        self,
        path: str,
        tokenizer,
        max_query_length: int = 32,
        max_passage_length: int = 128,
    ):
        self.path = path
        self.tokenizer = tokenizer
        self.max_query_length = max_query_length
        self.max_passage_length = max_passage_length
        try:
            from rankpo_tpu.native import native_scan_jsonl

            self.offsets = native_scan_jsonl(path)
        except Exception:
            offsets = [0]
            with open(path, "rb") as f:
                for line in f:
                    offsets.append(offsets[-1] + len(line))
            import numpy as _np

            self.offsets = _np.asarray(offsets, dtype=_np.int64)
        self._file = open(path, "rb")
        import threading

        self._lock = threading.Lock()  # seek+read must be atomic across threads

    def __len__(self) -> int:
        return len(self.offsets) - 1

    def __getitem__(self, i: int) -> dict:
        lo, hi = int(self.offsets[i]), int(self.offsets[i + 1])
        with self._lock:
            self._file.seek(lo)
            raw = self._file.read(hi - lo)
        import json

        row = json.loads(raw)
        tok = self.tokenizer
        return {
            "query": tok(row["query"], max_length=self.max_query_length,
                         truncation=True)["input_ids"],
            "positives": tok(row["positives"], max_length=self.max_passage_length,
                             truncation=True)["input_ids"],
            "negatives": tok(row["negatives"], max_length=self.max_passage_length,
                             truncation=True)["input_ids"],
        }

    def __getstate__(self):
        # only the file handle and lock are process-local (the json module
        # once lived here too, making the dataset unpicklable)
        state = self.__dict__.copy()
        state["_file"] = None
        state["_lock"] = None
        return state

    def __setstate__(self, state):
        import threading

        self.__dict__.update(state)
        self._file = open(self.path, "rb")
        self._lock = threading.Lock()


def load_eval_queries(path: str) -> Tuple[List[str], List[List[int]]]:
    """Eval query file: {"query": {"text"}, "positives": {"index"}}
    (reference evaluate.py:144-151). Returns (query texts, label index lists)."""
    queries, labels = [], []
    for d in iter_jsonl(path):
        queries.append(d["query"]["text"])
        labels.append(d["positives"]["index"])
    return queries, labels


def load_eval_corpus(path: str) -> List[str]:
    """Eval corpus file: {"text": ...} per line (reference evaluate.py:153-158)."""
    return [d["text"] for d in iter_jsonl(path)]


def load_mining_rows(path: str) -> Tuple[List[dict], List[str], List[str]]:
    """Mining input: rows with {"query": {"text"}, "positives": {"text": []},
    optional "negatives": {"text": []}} (reference get_hard_negatives.py:186-218).
    Returns (train rows with raw text, query texts, deduped corpus)."""
    train_rows, queries, corpus = [], [], []
    for d in iter_jsonl(path):
        positives = d["positives"]["text"]
        assert isinstance(positives, list)
        corpus.extend(positives)
        if "negatives" in d:
            corpus.extend(d["negatives"]["text"])
        train_rows.append({"query": d["query"]["text"], "positives": positives})
        queries.append(d["query"]["text"])
    # dedup preserving deterministic order (the reference's list(set(...)) is
    # hash-order dependent; sorted insertion order is reproducible)
    seen = set()
    deduped = []
    for t in corpus:
        if t not in seen:
            seen.add(t)
            deduped.append(t)
    return train_rows, queries, deduped
