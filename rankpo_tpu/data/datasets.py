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
        self.rows: List[dict] = []
        for row in rows:
            q = tokenizer(row["query"], max_length=max_query_length, truncation=True)
            pos = tokenizer(
                row["positives"], max_length=max_passage_length, truncation=True
            )
            neg = tokenizer(
                row["negatives"], max_length=max_passage_length, truncation=True
            )
            self.rows.append(
                {
                    "query": q["input_ids"],
                    "positives": pos["input_ids"],
                    "negatives": neg["input_ids"],
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
        self.rows: List[dict] = []
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
            self.rows.append(
                {
                    "query": tokenizer(
                        row["query"], max_length=max_query_length, truncation=True
                    )["input_ids"],
                    "chosen": tokenizer(
                        chosen, max_length=max_passage_length, truncation=True
                    )["input_ids"],
                    "rejected": tokenizer(
                        rejected, max_length=max_passage_length, truncation=True
                    )["input_ids"],
                }
            )

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, i: int) -> dict:
        return self.rows[i]


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
