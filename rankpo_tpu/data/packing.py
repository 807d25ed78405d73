"""Host-side sequence packing: bin-pack tokenized texts into fixed rows.

The reference pads every text to its batch max (src/data_utils.py:62-71,
src/modeling.py:509-518), so a mixed-length corpus spends most of its
FLOPs on pad tokens. Packing is the TPU answer: several texts per row as
contiguous segments (ids 1..n, 0-id pad tail), block-diagonal attention in
the flash kernel (rankpo_tpu.ops.flash_attention ``segment_ids``), per-
segment positions and pooling (rankpo_tpu.models.packing). Static shapes
throughout — rows are [capacity] wide, slot tables [max_segments] — so
each (rows, capacity, max_segments) signature compiles once.

Packing here is best-fit-decreasing (sort by length descending, place each
text into the fullest bin it fits; open a new bin otherwise) — within ~1%
of optimal occupancy in practice and deterministic (stable sort, bisect),
so multi-host processes derive identical layouts from identical inputs.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass
from typing import List, Sequence

import numpy as np


@dataclass
class PackedRows:
    """One packed chunk. ``input_ids``/``segment_ids`` are [R, capacity];
    ``text_index`` is [R, max_segments] mapping slot j of row r to the index
    of the packed text in the input list (-1 for empty slots)."""

    input_ids: np.ndarray
    segment_ids: np.ndarray
    text_index: np.ndarray

    @property
    def n_rows(self) -> int:
        return self.input_ids.shape[0]

    @property
    def max_segments(self) -> int:
        return self.text_index.shape[1]


def pack_lengths(
    lengths: Sequence[int], capacity: int, max_segments: int
) -> List[List[int]]:
    """Best-fit-decreasing: item indices grouped into bins of ``capacity``
    with at most ``max_segments`` items per bin. Every length must be
    1..capacity (truncate upstream)."""
    lengths = np.asarray(lengths)
    if lengths.size == 0:
        return []
    if int(lengths.max(initial=0)) > capacity:
        raise ValueError(
            f"text of {int(lengths.max())} tokens exceeds pack capacity "
            f"{capacity}; truncate before packing"
        )
    if int(lengths.min(initial=1)) < 1:
        raise ValueError("cannot pack empty token lists")
    # stable argsort then reverse = deterministic descending order with
    # original-order tie-breaks reversed — deterministic is what matters
    order = np.argsort(lengths, kind="stable")[::-1]
    caps: List[int] = []  # sorted remaining capacities of OPEN bins
    cap_bin: List[int] = []  # parallel: bin id for each caps entry
    bins: List[List[int]] = []
    for idx in order:
        need = int(lengths[idx])
        j = bisect.bisect_left(caps, need)  # tightest bin that still fits
        if j < len(caps):
            b = cap_bin.pop(j)
            rem = caps.pop(j) - need
            bins[b].append(int(idx))
            if rem > 0 and len(bins[b]) < max_segments:
                at = bisect.bisect_left(caps, rem)
                caps.insert(at, rem)
                cap_bin.insert(at, b)
        else:
            bins.append([int(idx)])
            rem = capacity - need
            if rem > 0 and max_segments > 1:
                at = bisect.bisect_left(caps, rem)
                caps.insert(at, rem)
                cap_bin.insert(at, len(bins) - 1)
    return bins


def pack_token_lists(
    ids_list: Sequence[Sequence[int]],
    capacity: int,
    max_segments: int,
    pad_id: int,
) -> PackedRows:
    """Pack tokenized texts into PackedRows. Segment ids are assigned 1..n
    in each row's placement order; ``text_index`` recovers input order."""
    bins = pack_lengths([len(x) for x in ids_list], capacity, max_segments)
    n_rows = len(bins)
    m = max((len(b) for b in bins), default=1)
    input_ids = np.full((n_rows, capacity), pad_id, np.int32)
    segment_ids = np.zeros((n_rows, capacity), np.int32)
    text_index = np.full((n_rows, m), -1, np.int32)
    for r, items in enumerate(bins):
        off = 0
        for s_i, idx in enumerate(items):
            ids = ids_list[idx]
            L = len(ids)
            input_ids[r, off : off + L] = ids
            segment_ids[r, off : off + L] = s_i + 1
            text_index[r, s_i] = idx
            off += L
    return PackedRows(input_ids, segment_ids, text_index)


def occupancy(packed: PackedRows) -> float:
    """Fraction of non-pad tokens — the FLOP-efficiency the packing bought."""
    if packed.n_rows == 0:
        return 1.0
    return float((packed.segment_ids != 0).mean())
