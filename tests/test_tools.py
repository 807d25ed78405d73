"""Mining + prediction tool tests: golden-file jsonl formats, filtering
invariants, selection policies, λ-decay cluster sampling."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankpo_tpu.data import HashTokenizer
from rankpo_tpu.index import InferenceEncoder
from rankpo_tpu.models import init_params, tiny_llama_config
from rankpo_tpu.tools import (
    find_hard_negatives,
    find_random_negatives,
    generate_predictions,
    select_negative_ids,
)
from rankpo_tpu.utils.jsonl import read_jsonl


def _mining_file(tmp_path, n=8, n_pos=2):
    rows = []
    for i in range(n):
        rows.append({
            "query": {"text": f"query text {i}"},
            "positives": {"text": [f"positive {i} {j}" for j in range(n_pos)]},
            "negatives": {"text": [f"old negative {i}"]},
        })
    path = tmp_path / "mine.jsonl"
    path.write_text("\n".join(json.dumps(r) for r in rows))
    return str(path)


class TestRandomNegatives:
    def test_format_and_filters(self, tmp_path):
        inp = _mining_file(tmp_path)
        out = str(tmp_path / "rand.jsonl")
        rows = find_random_negatives(inp, out, num_negatives=5, seed=0)
        saved = read_jsonl(out)
        assert len(saved) == 8
        for row in saved:
            assert set(row) == {"query", "positives", "negatives"}
            assert len(row["negatives"]) == 5
            assert len(set(row["negatives"])) == 5  # no duplicates
            for neg in row["negatives"]:
                assert neg not in row["positives"]
                assert neg != row["query"]

    def test_seeded_determinism(self, tmp_path):
        inp = _mining_file(tmp_path)
        a = find_random_negatives(inp, str(tmp_path / "a.jsonl"), 3, seed=1)
        b = find_random_negatives(inp, str(tmp_path / "b.jsonl"), 3, seed=1)
        assert a == b


class TestSelectNegativeIds:
    def _fixture(self):
        corpus = [f"doc {i}" for i in range(20)]
        train_rows = [{"query": "doc 0", "positives": ["doc 1", "doc 2"]}]
        candidates = [list(range(12))]  # includes query (0) and positives (1,2)
        return corpus, train_rows, candidates

    def test_topk_filters_positives_and_self(self):
        corpus, rows, cands = self._fixture()
        ids = select_negative_ids(
            cands, num_negatives=4, method="topk", train_rows=rows, corpus=corpus
        )
        assert ids[0].tolist() == [3, 4, 5, 6]  # 0,1,2 filtered, then rank order

    def test_sample_within_range(self):
        corpus, rows, cands = self._fixture()
        ids = select_negative_ids(
            cands, num_negatives=4, method="sample", train_rows=rows,
            corpus=corpus, seed=0,
        )
        assert len(set(ids[0].tolist())) == 4
        assert all(3 <= j <= 11 for j in ids[0])

    def test_cluster_lambda_decay(self):
        corpus, rows, cands = self._fixture()
        emb = np.random.RandomState(0).randn(20, 8).astype(np.float32)
        ids = select_negative_ids(
            cands, num_negatives=4, method="cluster", train_rows=rows,
            corpus=corpus, corpus_embedding=emb, num_clusters=3, lambda_=0.5,
            seed=0,
        )
        assert len(set(ids[0].tolist())) == 4

    def test_insufficient_candidates_raises(self):
        corpus, rows, _ = self._fixture()
        with pytest.raises(RuntimeError):
            select_negative_ids(
                [[0, 1, 2]], num_negatives=4, method="topk", train_rows=rows,
                corpus=corpus,
            )

    def test_lambda_zero_spreads_clusters(self):
        """λ→0 forbids re-drawing from a visited cluster (weight 0^k)."""
        corpus = [f"d{i}" for i in range(8)]
        rows = [{"query": "other", "positives": []}]
        # two tight clusters in embedding space
        emb = np.zeros((8, 2), np.float32)
        emb[:4] = [0.0, 0.0]
        emb[4:] = [10.0, 10.0]
        emb += np.random.RandomState(1).randn(8, 2) * 0.01
        ids = select_negative_ids(
            [list(range(8))], num_negatives=2, method="cluster",
            train_rows=rows, corpus=corpus, corpus_embedding=emb,
            num_clusters=2, lambda_=1e-9, seed=0,
        )
        picked = ids[0]
        sides = {int(j) // 4 for j in picked}
        assert sides == {0, 1}, f"expected one from each cluster, got {picked}"


@pytest.fixture(scope="module")
def encoder(data_mesh):
    cfg = tiny_llama_config(vocab_size=256)
    params = init_params(jax.random.key(0), cfg)
    tok = HashTokenizer(vocab_size=256)
    return InferenceEncoder(cfg, params, tok, mesh=data_mesh,
                            compute_dtype=jnp.float32, length_multiple=8)


class TestFindHardNegatives:
    def test_end_to_end_outputs(self, tmp_path, encoder, data_mesh):
        inp = _mining_file(tmp_path, n=6, n_pos=2)
        out_dir = str(tmp_path / "mined")
        outputs = find_hard_negatives(
            encoder, inp, out_dir,
            max_query_length=16, max_passage_length=16,
            num_negatives=3, search_range=(0, 10), method="topk,cluster",
            batch_size=8, num_clusters=2, lambda_=0.5, seed=0, mesh=data_mesh,
        )
        assert "topk.jsonl" in outputs and "cluster5.jsonl" in outputs
        rows = read_jsonl(outputs["topk.jsonl"])
        assert len(rows) == 6
        for row in rows:
            assert len(row["positives"]) == 1  # one sampled positive
            assert len(row["negatives"]) == 3
            for neg in row["negatives"]:
                assert neg != row["query"]

    def test_refine_index_mining(self, tmp_path, encoder, data_mesh):
        # index_type="refine": approximate two-stage candidate search —
        # output schema identical, self/positive filtering still holds
        inp = _mining_file(tmp_path, n=6, n_pos=2)
        outputs = find_hard_negatives(
            encoder, inp, str(tmp_path / "mined_refine"),
            max_query_length=16, max_passage_length=16,
            num_negatives=3, search_range=(0, 10), method="topk",
            batch_size=8, num_clusters=2, lambda_=0.5, seed=0,
            mesh=data_mesh, index_type="refine", index_recall_target=0.9,
        )
        rows = read_jsonl(outputs["topk.jsonl"])
        assert len(rows) == 6
        for row in rows:
            assert len(row["negatives"]) == 3
            for neg in row["negatives"]:
                assert neg != row["query"]
                assert neg not in row["positives"]

    def test_index_kwargs_reach_constructor(self, tmp_path, encoder,
                                            data_mesh, monkeypatch):
        # the CLI's --index_kwargs JSON dict must override the tool's
        # defaults on the index constructor (e.g. a pinned n_clusters)
        from rankpo_tpu.index import IVFIPIndex

        seen = {}
        orig = IVFIPIndex.__init__

        def spy(self, *a, **k):
            seen.update(k)
            return orig(self, *a, **k)

        monkeypatch.setattr(IVFIPIndex, "__init__", spy)
        inp = _mining_file(tmp_path, n=6, n_pos=2)
        find_hard_negatives(
            encoder, inp, str(tmp_path / "mined_kw"),
            max_query_length=16, max_passage_length=16,
            num_negatives=3, search_range=(0, 10), method="topk",
            batch_size=8, num_clusters=2, lambda_=0.5, seed=0,
            mesh=data_mesh, index_type="ivf",
            index_kwargs={"n_clusters": 4, "nprobe": 4},
        )
        assert seen.get("n_clusters") == 4 and seen.get("nprobe") == 4

    def test_lambda_sweep_when_unset(self, tmp_path, encoder, data_mesh):
        inp = _mining_file(tmp_path, n=6)
        outputs = find_hard_negatives(
            encoder, inp, str(tmp_path / "sweep"),
            max_query_length=16, max_passage_length=16,
            num_negatives=2, search_range=(0, 8), method="cluster",
            batch_size=8, num_clusters=2, lambda_=None, seed=0, mesh=data_mesh,
        )
        assert sorted(outputs) == [f"cluster{i}.jsonl" for i in range(1, 10)]


class TestPredictions:
    def _qc_files(self, tmp_path, n_q=3, n_c=12):
        corpus = [f"candidate doc {i}" for i in range(n_c)]
        qf, cf = tmp_path / "q.jsonl", tmp_path / "c.jsonl"
        qf.write_text("\n".join(
            json.dumps({"query": {"text": f"query {i}"},
                        "positives": {"index": [i]}})
            for i in range(n_q)
        ))
        cf.write_text("\n".join(json.dumps({"text": t}) for t in corpus))
        return str(qf), str(cf)

    def test_pairs_schema(self, tmp_path, encoder, data_mesh):
        qf, cf = self._qc_files(tmp_path)
        out = str(tmp_path / "preds.jsonl")
        rows = generate_predictions(
            encoder, qf, cf, out,
            max_query_length=16, max_passage_length=16,
            search_range=(0, 8), method="topk", num_predictions=3,
            batch_size=8, mesh=data_mesh,
        )
        # 3 queries x C(3,2) pairs
        assert len(rows) == 9
        row = rows[0]
        assert {"query", "passage1", "passage2", "passage_id1", "passage_id2",
                "passage_rank1", "passage_rank2"} <= set(row)
        assert row["passage_rank1"] < row["passage_rank2"]
        # adding 'preferred' makes it valid RankPO training data
        from rankpo_tpu.data import PairPreferenceDataset, HashTokenizer
        annotated = [dict(r, preferred="A") for r in rows]
        ds = PairPreferenceDataset(annotated, HashTokenizer(256), 16, 16)
        assert len(ds) == 9

    def test_candidate_list_mode(self, tmp_path, encoder, data_mesh):
        qf, cf = self._qc_files(tmp_path)
        out = str(tmp_path / "cands.jsonl")
        rows = generate_predictions(
            encoder, qf, cf, out,
            max_query_length=16, max_passage_length=16,
            search_range=(0, 8), method="sample", num_predictions=4,
            batch_size=8, mesh=data_mesh, emit_pairs=False,
        )
        assert len(rows) == 3
        assert len(rows[0]["predictions"]) == 4
