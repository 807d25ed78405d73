"""Eval-layer tests: metric math vs hand values and sklearn, the reference's
Recall-denominator quirk, save-path conventions, skip/overwrite, end-to-end."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankpo_tpu.eval import compute_metrics, evaluate_path, get_save_path
from rankpo_tpu.eval.metrics import _auc_numpy, _ndcg_numpy
from rankpo_tpu.data import HashTokenizer
from rankpo_tpu.models import init_params, save_pretrained, tiny_llama_config


class TestMetricsMath:
    def test_mrr_first_hit_only(self):
        preds = [[9, 1, 2], [3, 9, 9]]
        scores = np.array([[0.9, 0.8, 0.7], [0.9, 0.8, 0.7]])
        labels = [[1, 2], [3]]
        m = compute_metrics(preds, scores, labels, cutoffs=[1, 3])
        # q0: first hit at rank 2 -> 1/2 (only cutoff>=2); q1: rank 1 -> 1
        np.testing.assert_allclose(m["MRR@1"], (0 + 1) / 2)
        np.testing.assert_allclose(m["MRR@3"], (0.5 + 1) / 2)

    def test_recall_capped_denominator(self):
        """The reference quirk (utils.py:127): denominator is
        min(cutoff, len(pred), len(labels)) — not len(labels)."""
        preds = [[1, 9, 2, 8, 3]]
        scores = np.ones((1, 5))
        labels = [[1, 2, 3, 4, 5, 6]]  # 6 relevant, 3 retrieved in top-5
        m = compute_metrics(preds, scores, labels, cutoffs=[1, 5])
        np.testing.assert_allclose(m["Recall@1"], 1.0)     # 1 hit / min(1,5,6)=1
        np.testing.assert_allclose(m["Recall@5"], 3 / 5)   # 3 hits / min(5,5,6)=5

    def test_auc_fallback_matches_sklearn(self):
        sklearn = pytest.importorskip("sklearn")
        from sklearn.metrics import roc_auc_score

        rng = np.random.RandomState(0)
        labels = rng.randint(0, 2, 200)
        labels[0] = 1
        labels[1] = 0
        scores = rng.randn(200)
        scores[::7] = scores[0]  # inject ties
        np.testing.assert_allclose(
            _auc_numpy(labels, scores), roc_auc_score(labels, scores), rtol=1e-10
        )

    def test_ndcg_fallback_matches_sklearn(self):
        sklearn = pytest.importorskip("sklearn")
        from sklearn.metrics import ndcg_score

        rng = np.random.RandomState(1)
        rel = rng.randint(0, 2, (8, 10))
        rel[0] = 1  # ensure some non-degenerate rows
        scores = rng.randn(8, 10)
        for k in (1, 3, 10):
            np.testing.assert_allclose(
                _ndcg_numpy(rel, scores, k), ndcg_score(rel, scores, k=k),
                rtol=1e-10,
            )

    def test_perfect_ranking(self):
        preds = [[0, 7, 8], [1, 7, 8]]
        scores = np.array([[0.9, 0.5, 0.1], [0.9, 0.5, 0.1]])
        labels = [[0], [1]]
        m = compute_metrics(preds, scores, labels, cutoffs=[1, 3])
        assert m["MRR@1"] == 1.0
        assert m["Recall@1"] == 1.0
        assert m["nDCG@1"] == 1.0

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            compute_metrics([[1]], np.ones((1, 1)), [[1], [2]], cutoffs=[1])

    def test_degenerate_auc_all_hits(self):
        """A WELL-TRAINED model at cutoff 1: every top-1 is relevant, so
        the flattened hit-encodings are single-class. sklearn would raise
        (and the reference with it); our defined semantics are AUC=1.0 —
        the natural limit as the last negative leaves the top-k — and the
        call must never raise or emit NaN (it crashed the in-training
        retrieval hook mid-run before this was defined)."""
        import warnings

        preds = [[0, 7], [1, 8]]
        scores = np.array([[0.9, 0.5], [0.9, 0.5]])
        labels = [[0], [1]]
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # UndefinedMetricWarning → fail
            m = compute_metrics(preds, scores, labels, cutoffs=[1, 2])
        assert m["AUC@1"] == 1.0  # all slots are hits at cutoff 1
        assert 0.0 <= m["AUC@2"] <= 1.0 and np.isfinite(m["AUC@2"])
        for v in m.values():
            assert np.isfinite(v)

    def test_degenerate_auc_no_hits(self):
        import warnings

        preds = [[7, 8], [7, 8]]
        scores = np.ones((2, 2))
        labels = [[0], [1]]
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            m = compute_metrics(preds, scores, labels, cutoffs=[1, 2])
        assert m["AUC@1"] == 0.0 and m["AUC@2"] == 0.0
        for v in m.values():
            assert np.isfinite(v)

    def test_degenerate_auc_numpy_path_matches(self):
        from rankpo_tpu.eval.metrics import _auc_numpy

        assert _auc_numpy(np.ones(4, int), np.ones(4)) == 1.0
        assert _auc_numpy(np.zeros(4, int), np.ones(4)) == 0.0


class TestSavePath:
    def test_checkpoint_dir_convention(self, tmp_path):
        p = get_save_path("models/run-x/checkpoint-42", str(tmp_path))
        assert p == str(tmp_path / "run-x" / "checkpoint-42.json")

    def test_main_convention(self, tmp_path):
        p = get_save_path("models/final-model", str(tmp_path))
        assert p == str(tmp_path / "final-model" / "main.json")

    def test_no_overwrite_appends_timestamp(self, tmp_path):
        p1 = get_save_path("models/m", str(tmp_path))
        open(p1, "w").write("{}")
        p2 = get_save_path("models/m", str(tmp_path), can_overwrite=False)
        assert p1 != p2 and p2.startswith(str(tmp_path / "m" / "main_"))


class TestEvaluatePath:
    def _setup(self, tmp_path, data_mesh):
        cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(0), cfg)
        model_dir = tmp_path / "models" / "tiny" / "checkpoint-1"
        save_pretrained(str(model_dir), cfg, params)

        corpus = [f"unique doc {i} topic {i}" for i in range(20)]
        queries = [corpus[3], corpus[11]]
        qf, cf = tmp_path / "q.jsonl", tmp_path / "c.jsonl"
        qf.write_text(
            "\n".join(
                json.dumps({"query": {"text": q}, "positives": {"index": [i]}})
                for q, i in zip(queries, (3, 11))
            )
        )
        cf.write_text("\n".join(json.dumps({"text": t}) for t in corpus))
        return model_dir, qf, cf

    def test_end_to_end_and_skip(self, tmp_path, data_mesh):
        model_dir, qf, cf = self._setup(tmp_path, data_mesh)
        out = tmp_path / "results"
        tok = HashTokenizer(vocab_size=256)
        res = evaluate_path(
            str(tmp_path / "models" / "tiny"), str(qf), str(cf), str(out),
            evaluate_all_checkpoints=True, tokenizer=tok, mesh=data_mesh,
            batch_size=8, max_query_length=16, max_passage_length=16, k=10,
            cutoffs=[1, 5], compute_dtype=jnp.float32,
        )
        assert "checkpoint-1" in res
        assert res["checkpoint-1"]["MRR@1"] == 1.0  # query == its positive doc
        rdir = out / "tiny"
        assert (rdir / "checkpoint-1.json").is_file()
        assert (rdir / "checkpoint-1-indices.npy").is_file()
        assert (rdir / "all_eval_results.json").is_file()

        # second run skips (reference evaluate.py:169-184 semantics)
        res2 = evaluate_path(
            str(tmp_path / "models" / "tiny"), str(qf), str(cf), str(out),
            evaluate_all_checkpoints=True, tokenizer=tok, mesh=data_mesh,
            batch_size=8, max_query_length=16, max_passage_length=16, k=10,
            cutoffs=[1, 5], compute_dtype=jnp.float32,
        )
        assert res2 == {}

    def test_ivf_index_opt_in_with_inf_padding(self, tmp_path, data_mesh):
        # index_type="ivf" with nprobe=1 on a tiny corpus: the probed
        # clusters hold fewer than k rows, so search returns -1/-inf tail
        # padding — the evaluator must clamp it before sklearn's AUC/nDCG
        # (which reject infinities) instead of crashing mid-checkpoint
        from rankpo_tpu.eval.evaluator import evaluate_checkpoint

        model_dir, qf, cf = self._setup(tmp_path, data_mesh)
        corpus = [f"unique doc {i} topic {i}" for i in range(20)]
        metrics, indices, scores = evaluate_checkpoint(
            str(model_dir), [corpus[3]], [[3]], corpus,
            tokenizer=HashTokenizer(vocab_size=256), mesh=data_mesh,
            batch_size=8, max_query_length=16, max_passage_length=16,
            k=18, cutoffs=(1, 5), compute_dtype=jnp.float32,
            index_type="ivf",
            # 16 clusters over the 8-shard mesh = 2 per shard; nprobe=1
            # probes half of each shard, so k=18 of 20 rows must pad
            index_kwargs={"n_clusters": 16, "nprobe": 1, "kmeans_iters": 2},
        )
        assert (indices < 0).any(), "test premise: padding must appear"
        assert np.isfinite(scores).all(), "pad scores must be clamped finite"
        # AUC can be legitimately NaN here (single-class y_true with one
        # query); the regression under test is the sklearn infinity crash
        # plus finite rank metrics
        for key in ("MRR@1", "MRR@5", "Recall@1", "Recall@5"):
            assert np.isfinite(metrics[key]), key

    def test_refine_index_opt_in(self, tmp_path, data_mesh):
        # index_type="refine": approximate search behind the same harness;
        # on this tiny corpus the self-retrieval hit is trivially recovered
        model_dir, qf, cf = self._setup(tmp_path, data_mesh)
        out = tmp_path / "results_refine"
        res = evaluate_path(
            str(tmp_path / "models" / "tiny"), str(qf), str(cf), str(out),
            evaluate_all_checkpoints=True,
            tokenizer=HashTokenizer(vocab_size=256), mesh=data_mesh,
            batch_size=8, max_query_length=16, max_passage_length=16, k=10,
            cutoffs=[1, 5], compute_dtype=jnp.float32,
            index_type="refine", index_recall_target=0.9,
        )
        assert res["checkpoint-1"]["MRR@1"] == 1.0
