"""Index auto-tuner (tools/autotune.py): the FAISS ParameterSpace analog.
Candidate specs build, measure recall vs the exact engine, and the
recommendation respects the recall target and memory budget."""

import json

import numpy as np
import pytest

from rankpo_tpu.tools import autotune_index, default_specs


def _unit_rows(n, d, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestAutotune:
    def test_flat_is_exact_and_feasible(self):
        emb = _unit_rows(512, 64)
        report = autotune_index(
            emb, k=10, recall_target=0.95, n_queries=32, repeats=1,
            specs=["Flat", "SQ8"],
        )
        by_spec = {r["spec"]: r for r in report["results"]}
        assert by_spec["Flat"]["recall"] == 1.0
        assert by_spec["Flat"]["feasible"]
        assert by_spec["SQ8"]["memory_mb"] < by_spec["Flat"]["memory_mb"]
        assert report["best"] in ("Flat", "SQ8")
        # results ranked by QPS descending
        qps = [r["qps"] for r in report["results"] if "qps" in r]
        assert qps == sorted(qps, reverse=True)

    def test_memory_budget_filters(self):
        emb = _unit_rows(512, 64)
        report = autotune_index(
            emb, k=10, recall_target=0.0, n_queries=16, repeats=1,
            specs=["Flat", "SQ8"],
            memory_budget_gb=0.3 * 512 * 64 * 4 / (1 << 30),  # < fp32 rows
        )
        by_spec = {r["spec"]: r for r in report["results"]}
        assert not by_spec["Flat"]["feasible"]  # fp32 over budget
        assert by_spec["SQ8"]["feasible"]
        assert report["best"] == "SQ8"

    def test_bad_spec_reported_not_raised(self):
        emb = _unit_rows(256, 48)
        report = autotune_index(
            emb, k=5, n_queries=8, repeats=1,
            # 48 % 7 != 0: PQ block width cannot divide — must not crash
            specs=["Flat", "IVF4,PQ7"],
        )
        by_spec = {r["spec"]: r for r in report["results"]}
        assert "error" in by_spec["IVF4,PQ7"]
        assert by_spec["Flat"]["recall"] == 1.0
        assert report["best"] == "Flat"

    def test_default_ladder_scales_with_corpus(self):
        small = default_specs(1000, 64)
        assert "Flat" in small and not any("IVF" in s for s in small)
        big = default_specs(100_000, 1024)
        assert any(s.startswith("IVF") for s in big)
        assert any(s.startswith("OPQ") for s in big)
        # every generated spec parses
        from rankpo_tpu.index import parse_index_spec

        for s in small + big:
            parse_index_spec(s)

    def test_report_is_json_serializable(self):
        emb = _unit_rows(256, 32)
        report = autotune_index(
            emb, k=5, n_queries=8, repeats=1, specs=["Flat"],
        )
        json.dumps(report)  # the CLI prints this as one JSON line

    def test_cli_synthetic_smoke(self, capsys):
        from rankpo_tpu.cli.autotune import main

        report = main([
            "--synthetic_rows", "512", "--synthetic_dim", "64",
            "--k", "10", "--n_queries", "16",
            "--specs", "Flat;SQ8",
        ])
        assert report["best"] is not None
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert json.loads(out)["best"] == report["best"]
