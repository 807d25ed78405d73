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

import os
import json
from typing import Any, Iterable, Iterator, List


def iter_jsonl(path: str) -> Iterator[dict]:
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def _parse_range(args) -> List[dict]:
    path, start, end = args
    out = []
    with open(path, "rb") as f:
        f.seek(start)
        for raw in f.read(end - start).splitlines():
            raw = raw.strip()
            if raw:
                out.append(json.loads(raw))
    return out


def read_jsonl(path: str, num_workers: int = 0) -> List[dict]:
    """Read a jsonl file; ``num_workers > 1`` parses byte ranges in parallel
    (line offsets from the C++ mmap scanner in rankpo_tpu/native when built,
    else a python scan) — for multi-GB corpora where json parsing dominates."""
    if num_workers <= 1:
        return list(iter_jsonl(path))

    import os
    from concurrent.futures import ProcessPoolExecutor

    size = os.path.getsize(path)
    if size == 0:
        return []
    try:
        from rankpo_tpu.native import native_scan_jsonl

        offsets = native_scan_jsonl(path)
    except Exception:
        offsets = None

    if offsets is not None and len(offsets) > 1:
        line_starts = offsets[:-1]
        n = len(line_starts)
        per = -(-n // num_workers)
        ranges = []
        for w in range(num_workers):
            lo = w * per
            if lo >= n:
                break
            hi = min((w + 1) * per, n)
            end = int(offsets[hi]) if hi < len(offsets) else size
            ranges.append((path, int(line_starts[lo]), end))
    else:
        # byte-range split snapped forward to newline boundaries
        bounds = [0]
        with open(path, "rb") as f:
            for w in range(1, num_workers):
                pos = size * w // num_workers
                f.seek(pos)
                f.readline()
                bounds.append(min(f.tell(), size))
        bounds.append(size)
        ranges = [
            (path, lo, hi)
            for lo, hi in zip(bounds[:-1], bounds[1:])
            if hi > lo
        ]

    # worker processes must NOT re-run the remote-TPU sitecustomize (it
    # hangs minutes on the tunnel handshake under spawn — CLAUDE.md); env is
    # inherited at worker start, so scrub it around pool creation
    saved = {k: os.environ.get(k) for k in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")}
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        with ProcessPoolExecutor(max_workers=num_workers) as pool:
            parts = list(pool.map(_parse_range, ranges))
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return [row for part in parts for row in part]


def write_jsonl(path: str, rows: Iterable[Any]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
