"""Driver-contract tests for bench.py: the end-of-round benchmark must always
produce its one JSON line. Runs the real functions on shrunken shapes."""

import json
import subprocess
import sys

import numpy as np
import pytest


def test_bench_functions_tiny(monkeypatch):
    import bench

    monkeypatch.setattr(bench, "N_CORPUS", 512)
    monkeypatch.setattr(bench, "DIM", 64)
    monkeypatch.setattr(bench, "N_QUERIES", 64)
    monkeypatch.setattr(bench, "K", 10)
    monkeypatch.setattr(bench, "BATCH", 32)
    monkeypatch.setattr(bench, "CPU_QUERY_SAMPLE", 8)

    corpus, queries = bench._make_data()
    assert corpus.shape == (512, 64)
    cpu_qps = bench._cpu_qps(corpus, queries)
    assert cpu_qps > 0
    index, qps_dev = bench._device_100k(corpus, queries, on_tpu=False)
    assert qps_dev > 0
    dt = bench._tunnel_e2e_sample(index, queries, reps=1)
    assert dt > 0


def test_bench_1m_ivfpq_tiny(monkeypatch):
    # the approximate-tier function must run end to end on shrunken shapes
    # (CPU): build + oracle recall + amortized QPS loop
    import bench

    monkeypatch.setattr(bench, "N_CORPUS_1M", 2048)
    monkeypatch.setattr(bench, "BATCH_1M", 32)
    monkeypatch.setattr(bench, "ORACLE_PROBE_1M", 4)
    monkeypatch.setattr(bench, "DIM", 64)
    monkeypatch.setattr(bench, "K", 10)
    monkeypatch.setattr(bench, "PQ_1M_CLUSTERS", 8)
    monkeypatch.setattr(bench, "PQ_1M_NPROBE", 8)
    monkeypatch.setattr(bench, "PQ_1M_M", 8)
    monkeypatch.setattr(bench, "PQ_1M_BLOBS", 32)
    qps, recall = bench._device_1m_ivfpq()
    assert qps > 0
    # full probe + tight blobs: the rotated codec must rank well
    assert recall >= 0.5


def test_bench_main_prints_one_json_line(monkeypatch, capsys):
    import bench

    monkeypatch.setattr(bench, "N_CORPUS", 256)
    monkeypatch.setattr(bench, "DIM", 32)
    monkeypatch.setattr(bench, "N_QUERIES", 32)
    monkeypatch.setattr(bench, "K", 5)
    monkeypatch.setattr(bench, "BATCH", 32)
    monkeypatch.setattr(bench, "CPU_QUERY_SAMPLE", 8)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(payload)
    assert payload["value"] > 0
