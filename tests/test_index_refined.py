"""RefineIPIndex tests: two-stage PCA-prefilter + exact-rerank index.

The index is approximate by contract (recall target, not FAISS-bit-exact
ties), so tests assert (a) EXACTNESS in the degenerate full-coverage
configurations where the candidate stage cannot lose anything, and (b)
recall >= target via the build-time auto-tuner on an anisotropic corpus
(PCA's intended regime; isotropic worst-case behavior is characterized in
benchmarks/lowd_rerank_probe.py, not asserted here).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rankpo_tpu.index import FlatIPIndex, RefineIPIndex, numpy_search


def _anisotropic_corpus(n, d, seed=0):
    """Power-law spectrum ~ i^-0.5 — mild compared to real text-embedding
    matrices, enough for PCA to have signal."""
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    x *= (np.arange(1, d + 1, dtype=np.float32) ** -0.5)[None, :]
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    return x


def _storage_exact_sets(corpus, queries, k, store_dtype=jnp.bfloat16):
    """Exact top-k id sets at storage precision — the best any candidate
    stage could recover from the stored rows."""
    stored = np.asarray(corpus).astype(np.dtype(store_dtype)).astype(np.float32)
    _, idx = numpy_search(stored, queries, k)
    return [set(row.tolist()) for row in idx]


def _recall(idx, ref_sets, k):
    return float(
        np.mean([
            len(set(idx[r].tolist()) & ref_sets[r]) / k
            for r in range(len(ref_sets))
        ])
    )


class TestRefineIPIndexSingle:
    def test_full_coverage_is_storage_exact(self):
        # candidates >= n and reduced_dim == d: stage 1 passes everything
        # through, rerank IS the exact (storage-precision) search
        corpus = _anisotropic_corpus(500, 32, 0)
        queries = _anisotropic_corpus(9, 32, 1)
        index = RefineIPIndex(
            corpus, reduced_dim=32, candidates=500, store_dtype=jnp.float32
        )
        s, i = index.search(queries, k=10, batch_size=4)
        es, ei = numpy_search(corpus, queries, 10)
        np.testing.assert_allclose(s, es, atol=1e-5)
        # hit SETS match exactly (tie order is not part of the contract)
        for r in range(len(queries)):
            assert set(i[r].tolist()) == set(ei[r].tolist())

    def test_autotune_meets_recall_target(self):
        corpus = _anisotropic_corpus(3000, 64, 2)
        queries = _anisotropic_corpus(64, 64, 3)
        index = RefineIPIndex(
            corpus, reduced_dim=16, recall_target=0.9,
            tune_sample=64, tune_k=10,
        )
        assert index.candidates >= 20  # ladder floor is max(2k, 128)
        _, i = index.search(queries, k=10)
        ref = _storage_exact_sets(corpus, queries, 10)
        assert _recall(i, ref, 10) >= 0.85  # target on held-out queries

    def test_explicit_candidates_skips_tuning(self):
        corpus = _anisotropic_corpus(200, 16, 4)
        index = RefineIPIndex(corpus, reduced_dim=8, candidates=64)
        assert index.candidates == 64
        s, i = index.search(_anisotropic_corpus(5, 16, 5), k=7)
        assert s.shape == (5, 7) and i.shape == (5, 7)
        assert i.dtype == np.int32 and s.dtype == np.float32

    def test_k_larger_than_corpus_clamped(self):
        corpus = _anisotropic_corpus(7, 8, 1)
        index = RefineIPIndex(corpus, reduced_dim=8, candidates=7)
        s, i = index.search(_anisotropic_corpus(3, 8, 2), k=100)
        assert s.shape == (3, 7)

    def test_zero_queries_returns_empty(self):
        index = RefineIPIndex(
            _anisotropic_corpus(7, 8, 1), reduced_dim=4, candidates=4
        )
        s, i = index.search(np.zeros((0, 8), np.float32), k=3)
        assert s.shape == (0, 3) and s.dtype == np.float32
        assert i.shape == (0, 3) and i.dtype == np.int32

    def test_rejects_bad_reduced_dim(self):
        corpus = _anisotropic_corpus(10, 8, 0)
        with pytest.raises(ValueError):
            RefineIPIndex(corpus, reduced_dim=0, candidates=4)
        with pytest.raises(ValueError):
            RefineIPIndex(corpus, reduced_dim=9, candidates=4)

    def test_returned_scores_are_true_inner_products(self):
        # rerank scores must be the real q.x at storage precision, not the
        # stage-1 projected scores
        corpus = _anisotropic_corpus(300, 32, 6)
        queries = _anisotropic_corpus(8, 32, 7)
        index = RefineIPIndex(
            corpus, reduced_dim=8, candidates=64, store_dtype=jnp.float32
        )
        s, i = index.search(queries, k=5)
        expected = np.take_along_axis(
            queries @ corpus.T, i.astype(np.int64), axis=1
        )
        np.testing.assert_allclose(s, expected, atol=1e-5)


class TestRefineIPIndexSharded:
    def test_sharded_full_coverage_exact(self, data_mesh):
        # 803 rows over 8 shards: padding rows exercised; per-shard full
        # coverage (candidates >= rows-per-shard) makes the result the exact
        # storage-precision search
        corpus = _anisotropic_corpus(803, 16, 42)
        queries = _anisotropic_corpus(29, 16, 43)
        index = RefineIPIndex(
            corpus, mesh=data_mesh, reduced_dim=16, candidates=803,
            store_dtype=jnp.float32,
        )
        s, i = index.search(queries, k=50, batch_size=8)
        es, ei = numpy_search(corpus, queries, 50)
        np.testing.assert_allclose(s, es, atol=1e-5)
        for r in range(len(queries)):
            assert set(i[r].tolist()) == set(ei[r].tolist())
        assert int(i.max()) < 803  # padding never surfaces

    def test_sharded_autotune_recall(self, data_mesh):
        corpus = _anisotropic_corpus(2000, 32, 8)
        queries = _anisotropic_corpus(32, 32, 9)
        index = RefineIPIndex(
            corpus, mesh=data_mesh, reduced_dim=8, recall_target=0.9,
            tune_sample=32, tune_k=10,
        )
        _, i = index.search(queries, k=10)
        ref = _storage_exact_sets(corpus, queries, 10)
        assert _recall(i, ref, 10) >= 0.85
        assert index.ntotal == 2000
