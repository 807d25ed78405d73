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


# ---------------------------------------------------------------------------
# training collation
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class _BlockPacker:
    """Packs one field (queries or passages) into static-shape batches.

    Static-shape discipline for the jitted train step: capacity and the
    segment-table width are fixed; the ROW count uses a sticky budget — the
    first batch sets it (rows needed + ~12% slack, rounded to
    ``rows_multiple`` for mesh divisibility), later batches reuse it, and a
    rare overflow rounds up to a multiple of the budget (one extra compile,
    then cached). Steady-state training therefore compiles exactly one step
    program, same as the unpacked path.

    Multi-process mode: :meth:`set_budget` FIXES the budget (all hosts agree
    on one value via :func:`sync_packed_budgets`'s startup allgather). The
    row count then never varies — a rare overflow batch is truncated-to-fit
    deterministically (the longest texts are clipped until the pack fits)
    instead of changing shape, because hosts cannot renegotiate shapes
    mid-training without a collective on the hot path. ``slot_offset``
    shifts slot-table entries to GLOBAL batch positions (host k's queries
    occupy global slots [k*B_local, (k+1)*B_local)) so the jitted scatter
    assembles the global rep matrix correctly.
    """

    def __init__(self, capacity: int, max_segments: int, pad_id: int,
                 rows_multiple: int = 1):
        self.capacity = capacity
        self.max_segments = max_segments
        self.pad_id = pad_id
        self.rows_multiple = rows_multiple
        self._budget: int | None = None
        self._fixed = False
        self.slot_offset = 0
        self.n_truncated = 0  # overflow batches clipped to fit (fixed mode)

    def set_budget(self, rows: int) -> int:
        """Fix the row budget (rounded up to ``rows_multiple``). Later
        batches ALWAYS come out at exactly this many rows."""
        self._budget = _round_up(int(rows), self.rows_multiple)
        self._fixed = True
        return self._budget

    def probe_rows(self, seqs) -> int:
        """Rows a batch would need, without touching the sticky budget."""
        seqs = [list(s)[: self.capacity] or [self.pad_id] for s in seqs]
        return max(
            len(pack_lengths([len(s) for s in seqs], self.capacity,
                             self.max_segments)),
            1,
        )

    def _truncate_to_fit(self, seqs, rows: int):
        """Deterministic overflow repair for the fixed-budget mode: clip all
        texts to the largest length L whose packing fits ``rows`` rows
        (binary search; each probe packs exactly). Purely local — shapes
        stay fixed so hosts never disagree."""
        n = len(seqs)
        per_row = min(self.capacity, self.max_segments)
        if rows * per_row < n:
            raise ValueError(
                f"packed row budget {rows} cannot hold {n} texts even at "
                f"1 token each (max {per_row} segments/row); raise the "
                "budget or max_segments"
            )

        def fits(cap_len: int) -> bool:
            lengths = [min(len(s), cap_len) for s in seqs]
            return (
                len(pack_lengths(lengths, self.capacity, self.max_segments))
                <= rows
            )

        lo, hi = 1, self.capacity  # fits(1) holds by the check above
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if fits(mid):
                lo = mid
            else:
                hi = mid - 1
        clipped = [s[:lo] for s in seqs]
        self.n_truncated += 1
        if self.n_truncated <= 3:
            import warnings

            warnings.warn(
                f"packed batch overflowed its fixed row budget ({rows} "
                f"rows); texts clipped to {lo} tokens to fit. Frequent "
                "overflow means the calibrated budget is too tight — raise "
                "the slack or the explicit budget."
            )
        return pack_token_lists(
            clipped, self.capacity, self.max_segments, self.pad_id
        )

    def __call__(self, seqs) -> dict:
        # an empty tokenization becomes a single pad token (finite garbage
        # embedding, like the unpacked path's all-pad row) instead of a
        # packer error
        seqs = [list(s)[: self.capacity] or [self.pad_id] for s in seqs]
        packed = pack_token_lists(
            seqs, self.capacity, self.max_segments, self.pad_id
        )
        need = max(packed.n_rows, 1)
        if self._budget is None:
            # ~12% slack absorbs batch-to-batch packing jitter at scale; NO
            # forced slack row for small needs — at flagship batch sizes one
            # extra 4096-token row is a 1.5-2x FLOP/memory tax paid every
            # step (measured: it tips 1.24B group-4 packed over the HBM
            # budget), while the alternative is one extra compiled shape
            # when a batch overflows (cached; bounded by the worst-case
            # need, which is tiny exactly when overflow is possible)
            self._budget = _round_up(need + need // 8, self.rows_multiple)
        if self._fixed:
            rows = self._budget
            if need > rows:
                packed = self._truncate_to_fit(seqs, rows)
        else:
            rows = (
                self._budget
                if need <= self._budget
                else _round_up(need, self._budget)
            )
        m = self.max_segments
        ids = np.pad(
            packed.input_ids, ((0, rows - packed.n_rows), (0, 0)),
            constant_values=self.pad_id,
        )
        seg = np.pad(packed.segment_ids, ((0, rows - packed.n_rows), (0, 0)))
        slot = np.pad(
            packed.text_index,
            ((0, rows - packed.n_rows), (0, m - packed.max_segments)),
            constant_values=-1,
        )
        if self.slot_offset:
            slot = np.where(slot >= 0, slot + self.slot_offset, slot)
        return {
            "input_ids": ids,
            "segment_ids": seg,
            "slot_index": slot,
            # shape-only carrier of the text count for the jitted scatter
            "slots": np.arange(len(seqs), dtype=np.int32),
        }


class PackedContrastiveCollator:
    """Sequence-packing drop-in for ContrastiveCollator: identical example
    sampling (random 1-positive + ``num_negatives`` sampled negatives,
    src/data_utils.py:44,50) but query/passage blocks come out PACKED —
    several texts per fixed-width row plus a slot table mapping each packed
    segment back to its batch position. The loss consumes them via
    ``embed_packed`` + ``scatter_packed_reps`` and is bit-equal to the
    unpacked step on the same sampled examples (tests/test_packing.py).
    """

    def __init__(
        self,
        pad_token_id: int = 0,
        num_negatives: int = 5,
        max_query_length: int = 512,
        max_passage_length: int = 512,
        query_max_segments: int = 16,
        passage_max_segments: int = 16,
        rows_multiple: int = 1,
        seed: int = 0,
    ):
        from rankpo_tpu.data.collators import ContrastiveCollator

        # reuse the reference-faithful sampling (and its seeded RNG contract)
        self._sampler = ContrastiveCollator(
            pad_token_id=pad_token_id,
            num_negatives=num_negatives,
            max_query_length=max_query_length,
            max_passage_length=max_passage_length,
            seed=seed,
        )
        self.num_negatives = num_negatives
        self._q = _BlockPacker(
            max_query_length, query_max_segments, pad_token_id, rows_multiple
        )
        self._p = _BlockPacker(
            max_passage_length, passage_max_segments, pad_token_id,
            rows_multiple,
        )

    def __call__(self, rows) -> dict:
        queries, passages = self._sampler.sample(rows)
        return {"query": self._q(queries), "passage": self._p(passages)}

    def probe_needs(self, rows) -> tuple:
        """(query_rows, passage_rows) a batch like ``rows`` would need.
        Samples on a COPY of the collator RNG, so the training stream is
        untouched."""
        import copy

        queries, passages = copy.deepcopy(self._sampler).sample(rows)
        return self._q.probe_rows(queries), self._p.probe_rows(passages)

    def set_budgets(self, query_rows: int, passage_rows: int) -> tuple:
        """Fix both row budgets (multi-process mode; see _BlockPacker)."""
        return self._q.set_budget(query_rows), self._p.set_budget(passage_rows)

    def set_process_shard(self, process_index: int, batch_rows_local: int):
        """Point slot tables at GLOBAL batch positions: host k's B_local
        queries are global slots [k·B, (k+1)·B), its passages
        [k·B·(1+n), ...) — matching make_array_from_process_local_data's
        process-order concatenation in Trainer._globalize."""
        self._q.slot_offset = process_index * batch_rows_local
        self._p.slot_offset = (
            process_index * batch_rows_local * (1 + self.num_negatives)
        )


class PackedRankPOCollator:
    """Sequence-packing drop-in for RankPOCollator: the passage block keeps
    the reference's chosen/rejected interleave (src/data_utils.py:190-200 —
    slot 2i = chosen, 2i+1 = rejected) through the slot table, so the
    RankPO loss's [B, 2] grouped scores are unchanged."""

    def __init__(
        self,
        pad_token_id: int = 0,
        max_query_length: int = 512,
        max_passage_length: int = 512,
        query_max_segments: int = 16,
        passage_max_segments: int = 16,
        rows_multiple: int = 1,
    ):
        self._q = _BlockPacker(
            max_query_length, query_max_segments, pad_token_id, rows_multiple
        )
        self._p = _BlockPacker(
            max_passage_length, passage_max_segments, pad_token_id,
            rows_multiple,
        )

    def __call__(self, rows) -> dict:
        for key in ("query", "chosen", "rejected"):
            if key not in rows[0]:
                raise KeyError(f"key '{key}' is missing from batch rows")
        queries = [row["query"] for row in rows]
        passages = []
        for row in rows:
            passages.append(row["chosen"])
            passages.append(row["rejected"])
        return {"query": self._q(queries), "passage": self._p(passages)}

    def probe_needs(self, rows) -> tuple:
        queries = [row["query"] for row in rows]
        passages = []
        for row in rows:
            passages.append(row["chosen"])
            passages.append(row["rejected"])
        return self._q.probe_rows(queries), self._p.probe_rows(passages)

    def set_budgets(self, query_rows: int, passage_rows: int) -> tuple:
        return self._q.set_budget(query_rows), self._p.set_budget(passage_rows)

    def set_process_shard(self, process_index: int, batch_rows_local: int):
        # chosen/rejected interleave: 2 passages per example
        self._q.slot_offset = process_index * batch_rows_local
        self._p.slot_offset = process_index * batch_rows_local * 2


def sync_packed_budgets(collator, sample_rows, *, slack: float = 0.25):
    """Multi-process packing bring-up: agree on FIXED packed row budgets.

    Each host probes its packing need on ``sample_rows`` (a local-batch-sized
    sample), the needs are allgathered (ONE collective, main thread, before
    the train loop — never on the loader thread, where interleaved
    collectives can deadlock ranks), and every host fixes its budget to the
    global max plus ``slack``. From then on every packed batch has the same
    static shape on every host; rare overflow truncates-to-fit locally
    (see _BlockPacker). Returns (query_rows, passage_rows) as fixed.
    """
    needs = np.asarray(collator.probe_needs(sample_rows), np.int32)
    from jax.experimental import multihost_utils

    all_needs = np.asarray(multihost_utils.process_allgather(needs))
    all_needs = all_needs.reshape(-1, 2)
    q_need, p_need = (int(x) for x in all_needs.max(axis=0))
    return collator.set_budgets(
        q_need + max(1, int(q_need * slack)),
        p_need + max(1, int(p_need * slack)),
    )


def configure_multiprocess_packing(
    collator, dataset, local_batch_rows: int, *, slack: float = 0.25
):
    """The whole multi-process packed-training bring-up the CLIs share:
    probe a local-batch-sized sample from the dataset, fix row budgets via
    the startup allgather (:func:`sync_packed_budgets`), and point this
    host's slot tables at its global shard. Call from the MAIN thread
    before training. Returns the fixed (query_rows, passage_rows)."""
    import jax

    probe = [dataset[i] for i in range(min(local_batch_rows, len(dataset)))]
    budgets = sync_packed_budgets(collator, probe, slack=slack)
    collator.set_process_shard(jax.process_index(), local_batch_rows)
    return budgets
