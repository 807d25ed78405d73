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
    # regression-gate block always present; skipped (pass=None) off-TPU
    assert "floors" in payload
    assert payload["floors"]["pass"] is None  # cpu backend in tests


def test_floors_gate_checks():
    """The floors comparator: min/max bounds, not_measured, pass logic."""
    import bench

    out = {
        "on_device_qps": 75000.0,
        "qps_1m_exact": 18000.0,
        "qps_1m_int8": 27000.0,
        "flash_fwd_ms": 6.3,
    }
    bench._check_floors(out, on_tpu=True)
    fl = out["floors"]
    assert fl["pass"] is True
    assert fl["checks"]["on_device_qps"]["pass"]
    assert fl["checks"]["flash_fwd_ms"]["max"] == 7.0
    assert any(
        nm["key"] == "train_samples_per_sec_133m" for nm in fl["not_measured"]
    )

    bad = dict(out, on_device_qps=60000.0)
    bench._check_floors(bad, on_tpu=True)
    assert bad["floors"]["pass"] is False
    assert not bad["floors"]["checks"]["on_device_qps"]["pass"]

    slow_kernel = dict(out, flash_fwd_ms=9.0)
    bench._check_floors(slow_kernel, on_tpu=True)
    assert slow_kernel["floors"]["pass"] is False
