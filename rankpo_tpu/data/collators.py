"""Static-shape batch collators.

Reference behavior being matched (src/data_utils.py):
  - Contrastive (:25-77): per example pick ONE random positive and sample
    ``num_negatives`` random negatives; flatten passages to [B·(1+n)]; pad query
    and passage blocks independently.
  - RankPO (:181-214): interleave chosen/rejected into a [2B] passage block.

TPU-first difference (SURVEY.md hard-part #4): the reference pads to the batch
max (dynamic shapes — one CUDA kernel per shape is fine, one XLA compilation
per shape is not). Here sequences are padded to a FIXED length per field
(``max_*_length``), or optionally to a small set of bucket lengths
(``pad_multiple``), so each bucket compiles exactly once. Right padding only —
the last-token pooling argmin trick depends on it.

Randomness is a seedable ``numpy.random.Generator`` owned by the collator
(replaces the reference's global ``random`` module state) so epochs are
reproducible and resume is deterministic.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def _pad_block(
    seqs: Sequence[Sequence[int]],
    pad_token_id: int,
    fixed_length: Optional[int],
    pad_multiple: Optional[int],
) -> Dict[str, np.ndarray]:
    longest = max(len(s) for s in seqs)
    if fixed_length is not None and pad_multiple is None:
        target = fixed_length
    else:
        m = pad_multiple or 1
        target = -(-longest // m) * m
        if fixed_length is not None:
            target = min(target, fixed_length)
    target = max(target, 1)
    ids = np.full((len(seqs), target), pad_token_id, dtype=np.int32)
    mask = np.zeros((len(seqs), target), dtype=np.int32)
    for i, s in enumerate(seqs):
        s = list(s)[:target]
        ids[i, : len(s)] = s
        mask[i, : len(s)] = 1
    return {"input_ids": ids, "attention_mask": mask}


class ContrastiveCollator:
    def __init__(
        self,
        pad_token_id: int = 0,
        num_negatives: int = 5,
        max_query_length: Optional[int] = None,
        max_passage_length: Optional[int] = None,
        pad_multiple: Optional[int] = None,
        seed: int = 0,
    ):
        self.pad_token_id = pad_token_id
        self.num_negatives = num_negatives
        self.max_query_length = max_query_length
        self.max_passage_length = max_passage_length
        self.pad_multiple = pad_multiple
        self.rng = np.random.default_rng(seed)

    def sample(self, rows: List[dict]):
        """Reference-faithful example sampling (src/data_utils.py:44,50):
        per row, ONE random positive + ``num_negatives`` sampled negatives.
        Returns (queries, passages) with passages flattened to [B*(1+n)]."""
        queries, passages = [], []
        for row in rows:
            queries.append(row["query"])
            positives = row["positives"]
            negatives = row["negatives"]
            pick = self.rng.integers(len(positives))
            passages.append(positives[pick])
            if len(negatives) < self.num_negatives:
                raise ValueError(
                    f"row has {len(negatives)} negatives < num_negatives="
                    f"{self.num_negatives}"
                )
            neg_ids = self.rng.choice(
                len(negatives), size=self.num_negatives, replace=False
            )
            passages.extend(negatives[j] for j in neg_ids)
        return queries, passages

    def __call__(self, rows: List[dict]) -> Dict[str, Dict[str, np.ndarray]]:
        queries, passages = self.sample(rows)
        return {
            "query": _pad_block(
                queries, self.pad_token_id, self.max_query_length, self.pad_multiple
            ),
            "passage": _pad_block(
                passages, self.pad_token_id, self.max_passage_length, self.pad_multiple
            ),
        }


class RankPOCollator:
    def __init__(
        self,
        pad_token_id: int = 0,
        max_query_length: Optional[int] = None,
        max_passage_length: Optional[int] = None,
        pad_multiple: Optional[int] = None,
    ):
        self.pad_token_id = pad_token_id
        self.max_query_length = max_query_length
        self.max_passage_length = max_passage_length
        self.pad_multiple = pad_multiple

    def __call__(self, rows: List[dict]) -> Dict[str, Dict[str, np.ndarray]]:
        for key in ("query", "chosen", "rejected"):
            if key not in rows[0]:
                raise KeyError(f"key '{key}' is missing from batch rows")
        queries = [row["query"] for row in rows]
        passages = []
        for row in rows:
            passages.append(row["chosen"])
            passages.append(row["rejected"])
        return {
            "query": _pad_block(
                queries, self.pad_token_id, self.max_query_length, self.pad_multiple
            ),
            "passage": _pad_block(
                passages, self.pad_token_id, self.max_passage_length, self.pad_multiple
            ),
        }
