"""JSONL I/O for the three data schemas used throughout the pipeline.

Schemas (reference formats preserved for drop-in compatibility):
  - train rows:       {"query": str, "positives": [str], "negatives": [str]}
                      (reference: data/train_data-sample.jsonl, src/run_contrastive.py:155)
  - annotated pairs:  {"query": str, "passage1": str, "passage2": str, "preferred": "A"|"B", ...}
                      (reference: data/annotated_pair_data-sample.jsonl, src/rankpo_trainer.py:354-372)
  - eval query rows:  {"query": {"text": str}, "positives": {"index": [int], ...}}
    eval corpus rows: {"text": str}
                      (reference: src/evaluate.py:144-158)
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Iterator, List


def iter_jsonl(path: str) -> Iterator[dict]:
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def read_jsonl(path: str) -> List[dict]:
    return list(iter_jsonl(path))


def write_jsonl(path: str, rows: Iterable[Any]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
