"""Parallel jsonl reader: identical output to the serial path."""

import json

import pytest

from rankpo_tpu.utils.jsonl import read_jsonl, write_jsonl


def test_parallel_matches_serial(tmp_path):
    rows = [{"i": i, "text": f"row {i} " + "x" * (i % 7)} for i in range(1003)]
    path = tmp_path / "big.jsonl"
    write_jsonl(str(path), rows)
    serial = read_jsonl(str(path))
    parallel = read_jsonl(str(path), num_workers=4)
    assert parallel == serial == rows


def test_parallel_empty_file(tmp_path):
    path = tmp_path / "empty.jsonl"
    path.write_text("")
    assert read_jsonl(str(path), num_workers=4) == []


def test_parallel_more_workers_than_lines(tmp_path):
    rows = [{"a": 1}, {"a": 2}]
    path = tmp_path / "two.jsonl"
    write_jsonl(str(path), rows)
    assert read_jsonl(str(path), num_workers=8) == rows
