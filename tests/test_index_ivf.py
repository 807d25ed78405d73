"""IVFIPIndex tests: clustered (inverted-file) approximate IP index.

Approximate by contract (recall target, -1 padding when probing exhausts
reachable rows), so tests assert (a) EXACTNESS in full-probe configurations
where probing every cluster covers the whole corpus, (b) recall >= target
via the build-time nprobe auto-tuner on a blobby corpus (IVF's intended
regime), and (c) the storage-layout invariants (every row placed exactly
once, capacity respected, spill path).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rankpo_tpu.index import FlatIPIndex, IVFIPIndex, numpy_search
from rankpo_tpu.index.ivf import _greedy_fill


def _blob_corpus(n, d, n_blobs=20, seed=0, spread=0.15):
    """Unit-norm rows around ``n_blobs`` random unit centers — clusterable
    structure, the regime IVF is built for."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_blobs, d).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, n_blobs, size=n)
    x = centers[assign] + spread * rng.randn(n, d).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def _blobs_with_queries(n, n_q, d, n_blobs=20, seed=0, spread=0.15):
    """Corpus + held-out queries drawn from the SAME blob centers (separate
    seeds would draw different centers — queries from an unrelated
    distribution are unclusterable by construction and meaningless for
    recall assertions)."""
    x = _blob_corpus(n + n_q, d, n_blobs=n_blobs, seed=seed, spread=spread)
    return x[:n], x[n:]


def _storage_exact_sets(corpus, queries, k, store_dtype=jnp.bfloat16):
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


class TestGreedyFill:
    def test_places_every_row_once_within_capacity(self):
        rng = np.random.RandomState(0)
        n, k, cap = 1000, 16, 80  # k*cap = 1280 > n
        cand = rng.randint(0, k, size=(n, 2)).astype(np.int32)
        row_ids = _greedy_fill(cand, n, k, cap)
        placed = row_ids[row_ids >= 0]
        assert len(placed) == n
        assert sorted(placed.tolist()) == list(range(n))

    def test_spill_when_first_choices_overflow(self):
        # every row prefers cluster 0 then 1; capacity forces spill into
        # the remaining clusters — all rows must still land exactly once
        n, k, cap = 100, 8, 16
        cand = np.zeros((n, 2), np.int32)
        cand[:, 1] = 1
        row_ids = _greedy_fill(cand, n, k, cap)
        placed = row_ids[row_ids >= 0]
        assert sorted(placed.tolist()) == list(range(n))
        blocks = row_ids.reshape(k, cap)
        assert (blocks[0] >= 0).sum() == cap  # first choice filled
        assert (blocks[1] >= 0).sum() == cap  # second choice filled


class TestIVFIPIndexSingle:
    def test_full_probe_is_storage_exact(self):
        # probing every cluster covers the whole corpus: the result is the
        # exact storage-precision search regardless of the k-means layout
        corpus = _blob_corpus(500, 32, seed=0)
        queries = _blob_corpus(9, 32, seed=1)
        index = IVFIPIndex(
            corpus, n_clusters=8, nprobe=8, store_dtype=jnp.float32,
        )
        s, i = index.search(queries, k=10, batch_size=4)
        es, ei = numpy_search(corpus, queries, 10)
        np.testing.assert_allclose(s, es, atol=1e-5)
        for r in range(len(queries)):
            assert set(i[r].tolist()) == set(ei[r].tolist())
        assert (i >= 0).all()

    def test_autotune_meets_recall_target(self):
        corpus, queries = _blobs_with_queries(3000, 64, 64, n_blobs=30, seed=2)
        index = IVFIPIndex(
            corpus, recall_target=0.9, tune_sample=64, tune_k=10,
        )
        assert 1 <= index.nprobe <= index.n_clusters
        _, i = index.search(queries, k=10)
        ref = _storage_exact_sets(corpus, queries, 10)
        assert _recall(i, ref, 10) >= 0.85  # target on held-out queries

    def test_explicit_nprobe_skips_tuning(self):
        corpus = _blob_corpus(200, 16, seed=4)
        index = IVFIPIndex(corpus, n_clusters=4, nprobe=2)
        assert index.nprobe == 2
        s, i = index.search(_blob_corpus(5, 16, seed=5), k=7)
        assert s.shape == (5, 7) and i.shape == (5, 7)
        assert i.dtype == np.int32 and s.dtype == np.float32

    def test_k_larger_than_corpus_clamped(self):
        corpus = _blob_corpus(7, 8, seed=1)
        index = IVFIPIndex(corpus, n_clusters=4, nprobe=4)
        s, i = index.search(_blob_corpus(3, 8, seed=2), k=100)
        assert s.shape == (3, 7)
        assert (i >= 0).all()  # full probe reaches every row

    def test_more_clusters_than_rows(self):
        # empty clusters (frozen centroids, -1 slots) must stay invisible
        corpus = _blob_corpus(7, 8, seed=3)
        index = IVFIPIndex(
            corpus, n_clusters=16, nprobe=16, store_dtype=jnp.float32
        )
        s, i = index.search(_blob_corpus(3, 8, seed=4), k=7)
        es, ei = numpy_search(corpus, _blob_corpus(3, 8, seed=4), 7)
        np.testing.assert_allclose(s, es, atol=1e-5)

    def test_zero_queries_returns_empty(self):
        index = IVFIPIndex(_blob_corpus(7, 8, seed=1), n_clusters=2, nprobe=1)
        s, i = index.search(np.zeros((0, 8), np.float32), k=3)
        assert s.shape == (0, 3) and s.dtype == np.float32
        assert i.shape == (0, 3) and i.dtype == np.int32

    def test_spill_layout_still_exact_under_full_probe(self):
        # one tight blob + slack 1.0: most rows overflow their top-2
        # clusters and spill — full probing must still be exact
        corpus = _blob_corpus(300, 16, n_blobs=1, seed=6, spread=0.01)
        queries = _blob_corpus(8, 16, n_blobs=1, seed=7, spread=0.01)
        index = IVFIPIndex(
            corpus, n_clusters=4, nprobe=4, capacity_slack=1.0,
            store_dtype=jnp.float32,
        )
        s, i = index.search(queries, k=5)
        es, _ = numpy_search(corpus, queries, 5)
        np.testing.assert_allclose(s, es, atol=1e-5)

    def test_rejects_bad_params(self):
        corpus = _blob_corpus(10, 8, seed=0)
        with pytest.raises(ValueError):
            IVFIPIndex(corpus, n_clusters=0, nprobe=1)
        with pytest.raises(ValueError):
            IVFIPIndex(corpus, n_clusters=2, nprobe=0)
        with pytest.raises(ValueError):
            IVFIPIndex(corpus, n_clusters=2, nprobe=1, capacity_slack=0.5)
        with pytest.raises(ValueError):
            IVFIPIndex(corpus, n_clusters=2, nprobe=1, store_dtype=jnp.int32)
        with pytest.raises(ValueError):
            IVFIPIndex(np.zeros((0, 8), np.float32), n_clusters=2, nprobe=1)

    def test_returned_scores_are_true_inner_products(self):
        corpus = _blob_corpus(300, 32, seed=8)
        queries = _blob_corpus(8, 32, seed=9)
        index = IVFIPIndex(
            corpus, n_clusters=8, nprobe=3, store_dtype=jnp.float32
        )
        s, i = index.search(queries, k=5)
        assert (i >= 0).all()
        expected = np.take_along_axis(
            queries @ corpus.T, i.astype(np.int64), axis=1
        )
        np.testing.assert_allclose(s, expected, atol=1e-5)


class TestFromChunkFn:
    """Streamed build: the fp32 corpus never exists whole (chunk_rows
    forces several chunks incl. a padded final one)."""

    def test_full_probe_exact_fp32(self):
        corpus = _blob_corpus(530, 16, seed=50)
        queries = _blob_corpus(9, 16, seed=51)
        index = IVFIPIndex.from_chunk_fn(
            lambda lo, hi: corpus[lo:hi], 530, 16, chunk_rows=128,
            n_clusters=8, nprobe=8, store_dtype=jnp.float32,
        )
        s, i = index.search(queries, k=10, batch_size=4)
        es, ei = numpy_search(corpus, queries, 10)
        np.testing.assert_allclose(s, es, atol=1e-5)
        for r in range(len(queries)):
            assert set(i[r].tolist()) == set(ei[r].tolist())

    def test_streamed_int8_autotune(self):
        corpus, queries = _blobs_with_queries(2000, 32, 32, n_blobs=25, seed=52)
        index = IVFIPIndex.from_chunk_fn(
            lambda lo, hi: corpus[lo:hi], 2000, 32, chunk_rows=512,
            recall_target=0.9, tune_sample=32, tune_k=10,
            store_dtype=jnp.int8,
        )
        _, i = index.search(queries, k=10)
        scale = np.maximum(np.abs(corpus).max(axis=1) / 127.0, 1e-12)
        codes = np.clip(np.round(corpus / scale[:, None]), -127, 127)
        stored = (codes * scale[:, None]).astype(np.float32)
        _, ei = numpy_search(stored, queries, 10)
        ref = [set(row.tolist()) for row in ei]
        assert _recall(i, ref, 10) >= 0.8

    def test_streamed_hybrid(self):
        corpus = _blob_corpus(400, 16, seed=53)
        queries = _blob_corpus(7, 16, seed=54)
        index = IVFIPIndex.from_chunk_fn(
            lambda lo, hi: corpus[lo:hi], 400, 16, chunk_rows=100,
            n_clusters=4, nprobe=4, store_dtype=jnp.float32,
            reduced_dim=16, candidates=512,
        )
        s, i = index.search(queries, k=8)
        es, _ = numpy_search(corpus, queries, 8)
        np.testing.assert_allclose(s, es, atol=1e-5)

    def test_train_subsample(self):
        # train_rows < n_total: k-means fits on the strided sample but the
        # index still places and retrieves every row
        corpus = _blob_corpus(900, 16, seed=55)
        queries = corpus[:6]
        index = IVFIPIndex.from_chunk_fn(
            lambda lo, hi: corpus[lo:hi], 900, 16, chunk_rows=256,
            train_rows=200, n_clusters=8, nprobe=8,
            store_dtype=jnp.float32,
        )
        _, i = index.search(queries, k=1)
        assert i[:, 0].tolist() == list(range(6))  # self-retrieval


class TestExactSearch:
    def test_matches_numpy_oracle_fp32(self):
        corpus = _blob_corpus(500, 32, seed=40)
        queries = _blob_corpus(9, 32, seed=41)
        index = IVFIPIndex(
            corpus, n_clusters=8, nprobe=1, store_dtype=jnp.float32
        )
        s, i = index.exact_search(queries, k=10, batch_size=4)
        es, ei = numpy_search(corpus, queries, 10)
        np.testing.assert_allclose(s, es, atol=1e-5)
        for r in range(len(queries)):
            assert set(i[r].tolist()) == set(ei[r].tolist())

    def test_sharded_matches_oracle(self, data_mesh):
        corpus = _blob_corpus(803, 16, seed=42)
        queries = _blob_corpus(13, 16, seed=43)
        index = IVFIPIndex(
            corpus, mesh=data_mesh, n_clusters=16, nprobe=1,
            store_dtype=jnp.float32,
        )
        s, i = index.exact_search(queries, k=25, batch_size=8)
        es, _ = numpy_search(corpus, queries, 25)
        np.testing.assert_allclose(s, es, atol=1e-5)
        assert int(i.max()) < 803

    def test_int8_matches_dequant_oracle_sets(self):
        corpus = _blob_corpus(300, 16, seed=44)
        queries = _blob_corpus(7, 16, seed=45)
        index = IVFIPIndex(
            corpus, n_clusters=4, nprobe=1, store_dtype=jnp.int8
        )
        _, i = index.exact_search(queries, k=10)
        scale = np.maximum(np.abs(corpus).max(axis=1) / 127.0, 1e-12)
        codes = np.clip(np.round(corpus / scale[:, None]), -127, 127)
        stored = (codes * scale[:, None]).astype(np.float32)
        _, ei = numpy_search(stored, queries, 10)
        ref = [set(row.tolist()) for row in ei]
        assert _recall(i, ref, 10) >= 0.95


class TestIVFInt8:
    def _dequant_oracle_sets(self, corpus, queries, k):
        """Exact top-k id sets against the per-row quantize-dequantized
        matrix — what a perfect probe could recover from int8 storage."""
        scale = np.maximum(np.abs(corpus).max(axis=1) / 127.0, 1e-12)
        codes = np.clip(np.round(corpus / scale[:, None]), -127, 127)
        stored = (codes * scale[:, None]).astype(np.float32)
        s, idx = numpy_search(stored, queries, k)
        return stored, [set(row.tolist()) for row in idx]

    def test_full_probe_matches_dequant_oracle(self):
        corpus = _blob_corpus(400, 32, seed=30)
        queries = _blob_corpus(9, 32, seed=31)
        index = IVFIPIndex(
            corpus, n_clusters=8, nprobe=8, store_dtype=jnp.int8,
        )
        s, i = index.search(queries, k=10, batch_size=4)
        stored, ref_sets = self._dequant_oracle_sets(corpus, queries, 10)
        # bf16-pass compute perturbs near-tie boundaries vs the fp32
        # oracle (int8 mode is approximate by contract, like FlatIPIndex
        # int8): assert high overlap, not set equality
        assert _recall(i, ref_sets, 10) >= 0.95
        # returned scores are IPs against the QUANTIZED rows (bf16-pass
        # compute: the codes are exact in bf16, the products round)
        expected = np.take_along_axis(
            queries @ stored.T, i.astype(np.int64), axis=1
        )
        np.testing.assert_allclose(s, expected, rtol=2e-2, atol=2e-2)

    def test_int8_autotune(self):
        corpus, queries = _blobs_with_queries(2000, 32, 32, n_blobs=25, seed=32)
        index = IVFIPIndex(
            corpus, recall_target=0.9, tune_sample=32, tune_k=10,
            store_dtype=jnp.int8,
        )
        _, i = index.search(queries, k=10)
        _, ref = self._dequant_oracle_sets(corpus, queries, 10)
        assert _recall(i, ref, 10) >= 0.8

    def test_int8_hybrid_full_probe(self):
        corpus = _blob_corpus(300, 16, seed=33)
        queries = _blob_corpus(7, 16, seed=34)
        index = IVFIPIndex(
            corpus, n_clusters=4, nprobe=4, store_dtype=jnp.int8,
            reduced_dim=16, candidates=512,
        )
        _, i = index.search(queries, k=8)
        _, ref_sets = self._dequant_oracle_sets(corpus, queries, 8)
        assert _recall(i, ref_sets, 8) >= 0.95

    def test_int8_sharded(self, data_mesh):
        corpus = _blob_corpus(803, 16, seed=35)
        queries = _blob_corpus(11, 16, seed=36)
        index = IVFIPIndex(
            corpus, mesh=data_mesh, n_clusters=16, nprobe=16,
            store_dtype=jnp.int8,
        )
        _, i = index.search(queries, k=20, batch_size=8)
        _, ref_sets = self._dequant_oracle_sets(corpus, queries, 20)
        assert _recall(i, ref_sets, 20) >= 0.95
        assert int(i.max()) < 803

    def test_int8_from_sharded(self, data_mesh):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        corpus = _blob_corpus(600, 16, seed=37)
        queries = _blob_corpus(7, 16, seed=38)
        n_buf = 600 + (-600) % 8
        buf = np.concatenate(
            [corpus, np.zeros((n_buf - 600, 16), np.float32)]
        )
        emb_dev = jax.device_put(
            buf, NamedSharding(data_mesh, P("data", None))
        )
        index = IVFIPIndex.from_sharded(
            emb_dev, 600, mesh=data_mesh, n_clusters=16, nprobe=16,
            store_dtype=jnp.int8,
        )
        _, i = index.search(queries, k=15, batch_size=8)
        _, ref_sets = self._dequant_oracle_sets(corpus, queries, 15)
        assert _recall(i, ref_sets, 15) >= 0.95


class TestIVFPCAHybrid:
    def test_full_coverage_is_storage_exact(self):
        # reduced_dim == D (lossless projection), full probe, candidates
        # covering every probed slot: the hybrid path degenerates to the
        # exact storage-precision search
        corpus = _blob_corpus(400, 32, seed=20)
        queries = _blob_corpus(9, 32, seed=21)
        index = IVFIPIndex(
            corpus, n_clusters=8, nprobe=8, store_dtype=jnp.float32,
            reduced_dim=32, candidates=1024,
        )
        s, i = index.search(queries, k=10, batch_size=4)
        es, ei = numpy_search(corpus, queries, 10)
        np.testing.assert_allclose(s, es, atol=1e-5)
        for r in range(len(queries)):
            assert set(i[r].tolist()) == set(ei[r].tolist())

    def test_hybrid_autotune_meets_recall_target(self):
        corpus, queries = _blobs_with_queries(3000, 64, 64, n_blobs=30, seed=22)
        index = IVFIPIndex(
            corpus, recall_target=0.9, tune_sample=64, tune_k=10,
            reduced_dim=16,
        )
        _, i = index.search(queries, k=10)
        ref = _storage_exact_sets(corpus, queries, 10)
        assert _recall(i, ref, 10) >= 0.85

    def test_hybrid_returned_scores_are_true_inner_products(self):
        corpus = _blob_corpus(300, 32, seed=23)
        queries = _blob_corpus(8, 32, seed=24)
        index = IVFIPIndex(
            corpus, n_clusters=8, nprobe=4, store_dtype=jnp.float32,
            reduced_dim=8, candidates=64,
        )
        s, i = index.search(queries, k=5)
        assert (i >= 0).all()
        expected = np.take_along_axis(
            queries @ corpus.T, i.astype(np.int64), axis=1
        )
        np.testing.assert_allclose(s, expected, atol=1e-5)

    def test_hybrid_rejects_bad_reduced_dim(self):
        corpus = _blob_corpus(20, 8, seed=25)
        with pytest.raises(ValueError):
            IVFIPIndex(corpus, n_clusters=2, nprobe=1, reduced_dim=0)
        with pytest.raises(ValueError):
            IVFIPIndex(corpus, n_clusters=2, nprobe=1, reduced_dim=9)
        with pytest.raises(ValueError):
            IVFIPIndex(corpus, n_clusters=2, nprobe=1, candidates=0)

    def test_tuner_grows_candidates_when_probe_bump_regresses(
            self, monkeypatch):
        # measured on v5e at 1M/d'=128/C=512: probe growth past 32 DROPPED
        # recall 0.896 -> 0.650 — more probed rows crowd the fixed top-C
        # projected selection. The verify loop must respond by growing the
        # candidate pool, not by laddering nprobe to its cap
        corpus = _blob_corpus(400, 16, seed=74)
        index = IVFIPIndex(
            corpus, n_clusters=8, nprobe=2, reduced_dim=8, candidates=64,
            kmeans_iters=2,
        )
        real_exact = index.exact_search

        def fake_search(queries, k=100, batch_size=64, nprobe=None,
                        candidates=None):
            s, i = real_exact(queries, k=k)
            if index.candidates != "auto" and int(index.candidates) >= 128:
                return s, i  # crowding resolved once the pool grew
            return s, np.full_like(i, -1)  # recall 0 at ANY nprobe

        monkeypatch.setattr(index, "search", fake_search)
        index.recall_target = 0.9
        index._tune_nprobe(corpus[:16], 5, 8)
        assert int(index.candidates) >= 128  # grew from 64 (capped by
        # p*capacity — the pool can never exceed the probed rows)

    def test_hybrid_sharded_full_coverage_exact(self, data_mesh):
        corpus = _blob_corpus(803, 16, seed=26)
        queries = _blob_corpus(17, 16, seed=27)
        index = IVFIPIndex(
            corpus, mesh=data_mesh, n_clusters=16, nprobe=16,
            store_dtype=jnp.float32, reduced_dim=16, candidates=1024,
        )
        s, i = index.search(queries, k=20, batch_size=8)
        es, ei = numpy_search(corpus, queries, 20)
        np.testing.assert_allclose(s, es, atol=1e-5)
        for r in range(len(queries)):
            assert set(i[r].tolist()) == set(ei[r].tolist())
        assert int(i.max()) < 803

    def test_hybrid_from_sharded(self, data_mesh):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        corpus = _blob_corpus(600, 16, seed=28)
        queries = _blob_corpus(7, 16, seed=29)
        n_buf = 600 + (-600) % 8
        buf = np.concatenate(
            [corpus, np.zeros((n_buf - 600, 16), np.float32)]
        )
        emb_dev = jax.device_put(
            buf, NamedSharding(data_mesh, P("data", None))
        )
        index = IVFIPIndex.from_sharded(
            emb_dev, 600, mesh=data_mesh, n_clusters=16, nprobe=16,
            store_dtype=jnp.float32, reduced_dim=16, candidates=1024,
        )
        s, i = index.search(queries, k=15, batch_size=8)
        es, _ = numpy_search(corpus, queries, 15)
        np.testing.assert_allclose(s, es, atol=1e-5)


class TestIVFPQ:
    """Residual product quantization (FAISS IndexIVFPQ analog). Scores are
    ADC-style approximations by contract, so tests assert (a) consistency
    between the two on-device decode paths (probe rerank vs exact_search)
    under full probing, (b) bounded reconstruction error of returned scores
    vs true inner products on clustered data, (c) recall against the fp32
    oracle in the tuned regime, and (d) the validation surface."""

    def test_full_probe_matches_decode_oracle(self):
        corpus = _blob_corpus(400, 32, seed=60)
        queries = _blob_corpus(9, 32, seed=61)
        index = IVFIPIndex(
            corpus, n_clusters=8, nprobe=8, pq_m=8, kmeans_iters=5,
            pq_iters=10,
        )
        s, i = index.search(queries, k=10, batch_size=4)
        # exact_search decodes the same codes via one (centroid + residual)
        # einsum; the probe path splits the centroid term out — bf16-level
        # differences only
        es, ei = index.exact_search(queries, k=10, batch_size=4)
        ref = [set(row.tolist()) for row in ei]
        assert _recall(i, ref, 10) >= 0.95
        both = i == ei
        np.testing.assert_allclose(s[both], es[both], rtol=2e-2, atol=2e-2)

    def test_adc_scores_near_true_inner_products(self):
        # tight blobs -> small residuals -> accurate codes: returned scores
        # must track the true fp32 inner products within a loose ADC bound
        corpus = _blob_corpus(500, 64, n_blobs=10, seed=62, spread=0.1)
        queries = _blob_corpus(8, 64, n_blobs=10, seed=63, spread=0.1)
        index = IVFIPIndex(
            corpus, n_clusters=8, nprobe=8, pq_m=16, kmeans_iters=5,
            pq_iters=15,
        )
        s, i = index.search(queries, k=5)
        assert (i >= 0).all()
        true = np.take_along_axis(
            queries @ corpus.T, i.astype(np.int64), axis=1
        )
        assert np.abs(s - true).max() < 0.25

    def test_autotune_and_oracle_recall(self):
        corpus, queries = _blobs_with_queries(
            3000, 64, 64, n_blobs=30, seed=64
        )
        index = IVFIPIndex(
            corpus, recall_target=0.9, tune_sample=64, tune_k=10,
            pq_m=16, kmeans_iters=5, pq_iters=10,
        )
        assert 1 <= index.nprobe <= index.n_clusters
        _, i = index.search(queries, k=10)
        # vs the index's own decode oracle: probing loss only (the tuner's
        # contract — quantization loss is the storage trade, cf. int8)
        _, ei = index.exact_search(queries, k=10)
        ref = [set(row.tolist()) for row in ei]
        assert _recall(i, ref, 10) >= 0.8
        # vs the fp32 oracle: compound loss, bounded but meaningful
        _, fi = numpy_search(corpus, queries, 10)
        fref = [set(row.tolist()) for row in fi]
        assert _recall(i, fref, 10) >= 0.5

    def test_sharded_build_and_search(self, data_mesh):
        corpus = _blob_corpus(803, 32, seed=65)
        queries = _blob_corpus(11, 32, seed=66)
        index = IVFIPIndex(
            corpus, mesh=data_mesh, n_clusters=16, nprobe=16, pq_m=8,
            kmeans_iters=5, pq_iters=10,
        )
        s, i = index.search(queries, k=20, batch_size=8)
        assert int(i.max()) < 803  # padding never surfaces
        _, ei = index.exact_search(queries, k=20, batch_size=8)
        ref = [set(row.tolist()) for row in ei]
        assert _recall(i, ref, 20) >= 0.95

    def test_streamed_build(self):
        corpus = _blob_corpus(900, 32, seed=67)
        queries = _blob_corpus(9, 32, seed=68)
        index = IVFIPIndex.from_chunk_fn(
            lambda lo, hi: corpus[lo:hi], 900, 32, chunk_rows=256,
            n_clusters=8, nprobe=8, pq_m=8, kmeans_iters=5, pq_iters=10,
        )
        assert index.corpus.dtype == jnp.uint8
        assert index.corpus.shape[1] == 8
        _, i = index.search(queries, k=10, batch_size=4)
        _, ei = index.exact_search(queries, k=10, batch_size=4)
        ref = [set(row.tolist()) for row in ei]
        assert _recall(i, ref, 10) >= 0.95
        # self-retrieval through the codes: the quantized self row should
        # still be a strong neighbor of its own query
        _, si = index.search(corpus[:8], k=5)
        hits = np.mean([r in si[r] for r in range(8)])
        assert hits >= 0.75

    def test_pq_from_sharded(self, data_mesh):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        corpus = _blob_corpus(1600, 32, seed=70)
        queries = _blob_corpus(11, 32, seed=71)
        emb_dev = jax.device_put(
            corpus, NamedSharding(data_mesh, P("data", None))
        )
        index = IVFIPIndex.from_sharded(
            emb_dev, 1600, mesh=data_mesh, n_clusters=16, nprobe=16,
            pq_m=8, kmeans_iters=5, pq_iters=10,
        )
        assert np.asarray(index.corpus).dtype == np.uint8
        _, i = index.search(queries, k=15, batch_size=8)
        assert int(i.max()) < 1600
        _, ei = index.exact_search(queries, k=15, batch_size=8)
        ref = [set(row.tolist()) for row in ei]
        assert _recall(i, ref, 15) >= 0.95

    def test_decode_paths_agree_across_batch_sizes(self):
        # the search kernel picks take-reconstruct below 65536 probed rows
        # and the chunked one-hot matmul decode above (measured crossover,
        # benchmarks/pq_decode_probe.py); both decode the same codes, so
        # hit sets must agree across the threshold up to ADC near-ties
        # (fp32 accumulation order differs between the two einsum layouts)
        corpus = _blob_corpus(3000, 32, n_blobs=30, seed=72)
        queries = _blob_corpus(32, 32, n_blobs=30, seed=73)
        index = IVFIPIndex(
            corpus, n_clusters=16, nprobe=16, pq_m=8, kmeans_iters=5,
            pq_iters=10,
        )
        cap = index.capacity
        assert 8 * 16 * cap < (1 << 16) <= 32 * 16 * cap, (
            "test shapes must straddle the decode-path threshold"
        )
        _, i_small = index.search(queries, k=10, batch_size=8)
        _, i_big = index.search(queries, k=10, batch_size=32)
        overlap = np.mean([
            len(set(i_small[r].tolist()) & set(i_big[r].tolist())) / 10
            for r in range(32)
        ])
        assert overlap >= 0.9

    def test_pallas_adc_search_path_matches_xla(self, monkeypatch):
        # FORCE_INTERPRET routes the large-probe branch through the fused
        # ADC kernel (interpret mode on CPU); its hit sets must agree with
        # the XLA one-hot decode up to ADC near-ties (the kernel sums fp32
        # LUT entries; XLA rounds the reconstruction to bf16 first)
        from rankpo_tpu.ops import pq_adc_pallas

        corpus = _blob_corpus(3000, 32, n_blobs=30, seed=74)
        queries = _blob_corpus(32, 32, n_blobs=30, seed=75)
        index = IVFIPIndex(
            corpus, n_clusters=16, nprobe=16, pq_m=8, kmeans_iters=5,
            pq_iters=10,
        )
        assert 32 * 16 * index.capacity >= (1 << 16), (
            "batch must exceed the large-probe threshold"
        )
        _, i_xla = index.search(queries, k=10, batch_size=32)
        monkeypatch.setattr(pq_adc_pallas, "FORCE_INTERPRET", True)
        index._search_fns = {}  # drop programs built with the XLA branch
        _, i_adc = index.search(queries, k=10, batch_size=32)
        overlap = np.mean([
            len(set(i_adc[r].tolist()) & set(i_xla[r].tolist())) / 10
            for r in range(32)
        ])
        assert overlap >= 0.9

    def test_pallas_adc_under_mesh_traces(self, data_mesh, monkeypatch):
        # regression: pallas_call outputs carry no vma metadata, so the
        # probed-search shard_map must trace with check_vma disabled when
        # a Pallas branch is active — with check_vma=True (the default)
        # every Pallas-tier IVF search failed on a TPU mesh ("vma on
        # jax.ShapeDtypeStruct must not be None", autotune 100k run)
        from rankpo_tpu.ops import pq_adc_pallas

        corpus = _blob_corpus(3000, 32, n_blobs=30, seed=76)
        queries = _blob_corpus(128, 32, n_blobs=30, seed=77)
        monkeypatch.setattr(pq_adc_pallas, "FORCE_INTERPRET", True)
        index = IVFIPIndex(
            corpus, mesh=data_mesh, n_clusters=16, nprobe=16, pq_m=8,
            kmeans_iters=5, pq_iters=10,
        )
        local_probes = min(index.nprobe, index.n_clusters // 8)
        assert 128 * local_probes * index.capacity >= (1 << 16), (
            "batch must exceed the large-probe threshold or the kernel "
            "branch is never traced"
        )
        _, i = index.search(queries, k=10, batch_size=128)
        _, ei = index.exact_search(queries, k=10, batch_size=128)
        ref = [set(row.tolist()) for row in ei]
        assert _recall(i, ref, 10) >= 0.7  # ADC approximation at full probe

    def test_rejects_bad_pq_params(self):
        corpus = _blob_corpus(50, 16, seed=69)
        with pytest.raises(ValueError):
            IVFIPIndex(corpus, n_clusters=2, nprobe=1, pq_m=3)  # 16 % 3
        with pytest.raises(ValueError):
            IVFIPIndex(corpus, n_clusters=2, nprobe=1, pq_m=0)
        with pytest.raises(ValueError):
            IVFIPIndex(
                corpus, n_clusters=2, nprobe=1, pq_m=4,
                store_dtype=jnp.int8,
            )
        with pytest.raises(ValueError):
            IVFIPIndex(
                corpus, n_clusters=2, nprobe=1, pq_m=4, reduced_dim=8,
            )


class TestIVFIPIndexSharded:
    def test_sharded_full_probe_exact(self, data_mesh):
        # 803 rows over 8 shards (row padding exercised); probing all local
        # clusters on every shard covers the corpus -> exact
        corpus = _blob_corpus(803, 16, seed=42)
        queries = _blob_corpus(29, 16, seed=43)
        index = IVFIPIndex(
            corpus, mesh=data_mesh, n_clusters=16, nprobe=16,
            store_dtype=jnp.float32,
        )
        assert index.n_clusters % 8 == 0  # whole clusters per shard
        s, i = index.search(queries, k=50, batch_size=8)
        es, ei = numpy_search(corpus, queries, 50)
        np.testing.assert_allclose(s, es, atol=1e-5)
        for r in range(len(queries)):
            assert set(i[r].tolist()) == set(ei[r].tolist())
        assert int(i.max()) < 803  # padding never surfaces

    def test_sharded_autotune_recall(self, data_mesh):
        corpus, queries = _blobs_with_queries(2000, 32, 32, n_blobs=25, seed=8)
        index = IVFIPIndex(
            corpus, mesh=data_mesh, recall_target=0.9,
            tune_sample=32, tune_k=10,
        )
        _, i = index.search(queries, k=10)
        ref = _storage_exact_sets(corpus, queries, 10)
        assert _recall(i, ref, 10) >= 0.85
        assert index.ntotal == 2000

    def test_from_sharded_matches_host_build_exactness(self, data_mesh):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        corpus = _blob_corpus(600, 16, seed=10)
        queries = _blob_corpus(11, 16, seed=11)
        n_buf = 600 + (-600) % 8
        buf = np.concatenate(
            [corpus, np.zeros((n_buf - 600, 16), np.float32)]
        )
        emb_dev = jax.device_put(
            buf, NamedSharding(data_mesh, P("data", None))
        )
        index = IVFIPIndex.from_sharded(
            emb_dev, 600, mesh=data_mesh, n_clusters=16, nprobe=16,
            store_dtype=jnp.float32,
        )
        s, i = index.search(queries, k=20, batch_size=8)
        es, _ = numpy_search(corpus, queries, 20)
        np.testing.assert_allclose(s, es, atol=1e-5)
        assert int(i.max()) < 600

    def test_from_sharded_autotune(self, data_mesh):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        corpus, queries = _blobs_with_queries(1600, 32, 32, n_blobs=25, seed=12)
        emb_dev = jax.device_put(
            corpus, NamedSharding(data_mesh, P("data", None))
        )
        index = IVFIPIndex.from_sharded(
            emb_dev, 1600, mesh=data_mesh, recall_target=0.9,
            tune_sample=32, tune_k=10,
        )
        _, i = index.search(queries, k=10)
        ref = _storage_exact_sets(corpus, queries, 10)
        assert _recall(i, ref, 10) >= 0.85


def _aniso_corpus(n, d, seed=0):
    """Unit-norm rows with a power-law per-dim spectrum — variance piles
    into the leading dims, so a plain subvector split starves most PQ
    codebooks. The regime pre-rotation (pq_rotate) exists for."""
    rng = np.random.RandomState(seed)
    scale = (1.0 / np.sqrt(1.0 + np.arange(d))).astype(np.float32)
    x = rng.randn(n, d).astype(np.float32) * scale
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


@pytest.mark.slow
class TestIVFPQRotate:
    """pq_rotate: orthogonal pre-rotation of PQ residuals ('random' QR /
    'opq' alternating-Procrustes). Codes store the ROTATED residual and
    searches rotate the query instead, so both decode paths (probe rerank
    and exact_search) must stay mutually consistent, the rotation must be
    orthogonal, and on anisotropic data the rotated codec must beat the
    axis-aligned one at its own job (ADC score error)."""

    def test_random_full_probe_consistency(self):
        corpus = _blob_corpus(400, 32, seed=80)
        queries = _blob_corpus(9, 32, seed=81)
        index = IVFIPIndex(
            corpus, n_clusters=8, nprobe=8, pq_m=8, kmeans_iters=5,
            pq_iters=10, pq_rotate="random",
        )
        assert index._rotation_host is not None
        s, i = index.search(queries, k=10, batch_size=4)
        es, ei = index.exact_search(queries, k=10, batch_size=4)
        ref = [set(row.tolist()) for row in ei]
        assert _recall(i, ref, 10) >= 0.95
        both = i == ei
        np.testing.assert_allclose(s[both], es[both], rtol=2e-2, atol=2e-2)

    def test_opq_rotation_is_orthogonal(self):
        corpus = _aniso_corpus(600, 32, seed=82)
        index = IVFIPIndex(
            corpus, n_clusters=4, nprobe=4, pq_m=8, kmeans_iters=5,
            pq_iters=10, pq_rotate="opq",
        )
        rot = index._rotation_host
        np.testing.assert_allclose(
            rot.T @ rot, np.eye(32, dtype=np.float32), atol=1e-5
        )

    def test_rotation_cuts_adc_error_on_anisotropic_data(self):
        # same data, same knobs, three codecs: the rotated ones must beat
        # the axis-aligned codec's mean |returned - true| score error on a
        # power-law spectrum, and OPQ must not lose to the random rotation
        # it is initialized from
        corpus = _aniso_corpus(1500, 64, seed=83)
        queries = _aniso_corpus(16, 64, seed=84)
        errs = {}
        for mode in ("none", "random", "opq"):
            index = IVFIPIndex(
                corpus, n_clusters=4, nprobe=4, pq_m=16, kmeans_iters=5,
                pq_iters=15, pq_rotate=mode,
            )
            s, i = index.search(queries, k=10)
            true = np.take_along_axis(
                queries @ corpus.T, i.astype(np.int64), axis=1
            )
            errs[mode] = float(np.abs(s - true).mean())
        assert errs["random"] < errs["none"]
        assert errs["opq"] <= errs["random"] * 1.05

    def test_streamed_build_with_rotation(self):
        # the streamed placement pass encodes per-chunk through the same
        # rotated codec the search decodes: under full probing the probe
        # rerank and exact_search hit sets must agree on the SAME index
        corpus = _blob_corpus(700, 32, seed=85)
        queries = _blob_corpus(8, 32, seed=86)
        streamed = IVFIPIndex.from_chunk_fn(
            lambda lo, hi: corpus[lo:hi], 700, 32, chunk_rows=256,
            n_clusters=8, nprobe=8, pq_m=8, kmeans_iters=5, pq_iters=10,
            pq_rotate="random", seed=3,
        )
        assert streamed._rotation_host is not None
        _, i = streamed.search(queries, k=10, batch_size=8)
        _, ei = streamed.exact_search(queries, k=10, batch_size=8)
        ref = [set(row.tolist()) for row in ei]
        assert _recall(i, ref, 10) >= 0.95

    def test_sharded_rotated_build(self, data_mesh):
        corpus = _blob_corpus(803, 32, seed=87)
        queries = _blob_corpus(11, 32, seed=88)
        index = IVFIPIndex(
            corpus, mesh=data_mesh, n_clusters=16, nprobe=16, pq_m=8,
            kmeans_iters=5, pq_iters=10, pq_rotate="random",
        )
        _, i = index.search(queries, k=20, batch_size=8)
        assert int(i.max()) < 803
        _, ei = index.exact_search(queries, k=20, batch_size=8)
        ref = [set(row.tolist()) for row in ei]
        assert _recall(i, ref, 20) >= 0.95

    def test_rejects_bad_rotate_params(self):
        corpus = _blob_corpus(50, 16, seed=89)
        with pytest.raises(ValueError):
            IVFIPIndex(corpus, n_clusters=2, nprobe=1, pq_rotate="random")
        with pytest.raises(ValueError):
            IVFIPIndex(
                corpus, n_clusters=2, nprobe=1, pq_m=4, pq_rotate="qr"
            )


class TestGatherBudgetGuard:
    def test_oversized_batch_auto_shrinks(self, monkeypatch):
        # a tiny budget forces search() to split the query batch; results
        # must be identical to the unconstrained run (per-(k,nprobe)
        # programs are batch-agnostic — only the chunking changes)
        import rankpo_tpu.index.ivf as ivf_mod

        corpus = _blob_corpus(600, 32, seed=91)
        queries = _blob_corpus(17, 32, seed=92)
        index = IVFIPIndex(corpus, n_clusters=8, nprobe=8,
                           store_dtype=jnp.float32)
        s_full, i_full = index.search(queries, k=10, batch_size=32)
        per_q = 8 * index.capacity * index.dim * 8  # > one query's gather
        monkeypatch.setattr(ivf_mod, "_GATHER_BUDGET", 2 * per_q)
        s_shrunk, i_shrunk = index.search(queries, k=10, batch_size=32)
        np.testing.assert_allclose(s_shrunk, s_full, atol=1e-5)
        np.testing.assert_array_equal(i_shrunk, i_full)

    def test_hybrid_pricing_uses_reduced_dim(self):
        # the PCA hybrid's stage-1 gather touches bf16 REDUCED-dim rows and
        # its stage-2 rerank only c_used full-dim rows; pricing it at
        # full-dim fp32 over-shrank the query batch ~30x on exactly the
        # large-corpus configs the tier targets (round-3 review finding)
        corpus = _blob_corpus(600, 64, seed=93)
        index = IVFIPIndex(corpus, n_clusters=8, nprobe=4, reduced_dim=8,
                           candidates=32)
        p, _ = index._effective_probe(10, None)
        c = index._effective_candidates(10, None)
        priced = index._gather_bytes_per_query(p, c)
        store = np.dtype(index.corpus.dtype).itemsize
        expected = (p * index.capacity * (2 * 8 + 4)
                    + c * 64 * (store + 4))
        assert priced == expected
        # far below the old full-dim fp32 pricing
        assert priced < p * index.capacity * 64 * 8 / 4


class TestTransposedPQLayout:
    """pq_layout='cols' — transposed [m, slots] code storage (the
    100M-on-one-chip layout; rows pads m<128 to 128 lanes and carries a
    whole-array relayout copy per search, docs/BENCHMARKS.md round 4)."""

    def _pair(self, n=3000, d=64, m=32, k_c=16, seed=80):
        corpus = _blob_corpus(n, d, n_blobs=30, seed=seed)
        queries = _blob_corpus(32, d, n_blobs=30, seed=seed + 1)
        rows = IVFIPIndex(
            corpus, n_clusters=k_c, nprobe=k_c, pq_m=m, kmeans_iters=5,
            pq_iters=10, pq_layout="rows",
        )
        cols = IVFIPIndex(
            corpus, n_clusters=k_c, nprobe=k_c, pq_m=m, kmeans_iters=5,
            pq_iters=10, pq_layout="cols",
        )
        return corpus, queries, rows, cols

    def test_auto_resolution_and_shapes(self):
        from rankpo_tpu.index import ivf as ivf_mod

        corpus = _blob_corpus(600, 64, seed=90)
        # below the padded-bytes threshold auto keeps the (faster) rows
        # kernel; explicit 'cols' always honored
        small = IVFIPIndex(corpus, n_clusters=4, nprobe=4, pq_m=32,
                           kmeans_iters=3, pq_iters=5)
        assert small.pq_layout == "rows"
        cols = IVFIPIndex(corpus, n_clusters=4, nprobe=4, pq_m=32,
                          kmeans_iters=3, pq_iters=5, pq_layout="cols")
        assert cols.pq_layout == "cols"
        assert cols.capacity % 128 == 0
        assert cols.corpus.shape == (32, cols.n_clusters * cols.capacity)
        # past the threshold (shrunk for the test) auto flips to cols
        import unittest.mock as mock

        with mock.patch.object(ivf_mod, "_COLS_AUTO_BYTES", 1024):
            big = IVFIPIndex(corpus, n_clusters=4, nprobe=4, pq_m=32,
                             kmeans_iters=3, pq_iters=5)
            assert big.pq_layout == "cols"
            # m a multiple of 128 tiles rows padding-free: stays rows
            corpus128 = _blob_corpus(600, 128, seed=91)
            m128 = IVFIPIndex(corpus128, n_clusters=4, nprobe=4, pq_m=128,
                              kmeans_iters=3, pq_iters=5)
            assert m128.pq_layout == "rows"
        small_m = IVFIPIndex(corpus, n_clusters=4, nprobe=4, pq_m=16,
                             kmeans_iters=3, pq_iters=5)
        assert small_m.pq_layout == "rows"  # m < 32: sublane pad loses

    def test_cols_matches_rows_everywhere(self):
        corpus, queries, rows, cols = self._pair()
        # same inputs, same capacity rounding (256 at these shapes) ->
        # identical codes, only the physical layout differs
        assert rows.capacity == cols.capacity
        np.testing.assert_array_equal(
            np.asarray(rows.corpus), np.asarray(cols.corpus).T
        )
        rs, ri = rows.search(queries, k=10, batch_size=8)
        cs, ci = cols.search(queries, k=10, batch_size=8)
        np.testing.assert_array_equal(ri, ci)
        np.testing.assert_allclose(rs, cs, atol=1e-5)
        es_r, ei_r = rows.exact_search(queries, k=10)
        es_c, ei_c = cols.exact_search(queries, k=10)
        np.testing.assert_array_equal(ei_r, ei_c)
        np.testing.assert_allclose(es_r, es_c, atol=1e-5)
        ids = np.arange(0, 100, 7)
        np.testing.assert_allclose(
            rows.reconstruct(ids), cols.reconstruct(ids), atol=1e-6
        )

    def test_cols_kernel_interpret_path(self, monkeypatch):
        """FORCE_INTERPRET routes cols searches through pq_probe_scores_t
        at EVERY batch size (no small-probe take-reconstruct preference:
        the lane-gather fallback is the slow path)."""
        from rankpo_tpu.ops import pq_adc_pallas

        corpus, queries, rows, cols = self._pair(seed=82)
        _, i_xla = cols.search(queries, k=10, batch_size=8)
        monkeypatch.setattr(pq_adc_pallas, "FORCE_INTERPRET", True)
        cols._search_fns = {}
        _, i_adc = cols.search(queries, k=10, batch_size=8)
        overlap = np.mean([
            len(set(i_adc[r].tolist()) & set(i_xla[r].tolist())) / 10
            for r in range(len(i_adc))
        ])
        assert overlap >= 0.9  # fp32 LUT sums vs bf16 decode near-ties

    def test_cols_io_roundtrip(self, tmp_path):
        from rankpo_tpu.index.io import read_index, write_index

        _, queries, _, cols = self._pair(seed=84)
        s0, i0 = cols.search(queries, k=10, batch_size=8)
        path = tmp_path / "cols_index.npz"
        write_index(cols, str(path))
        loaded = read_index(str(path))
        assert loaded.pq_layout == "cols"
        assert loaded.corpus.shape == cols.corpus.shape
        s1, i1 = loaded.search(queries, k=10, batch_size=8)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(s0, s1, atol=1e-6)

    def test_cols_mutation_append_remove(self):
        corpus, queries, _, cols = self._pair(seed=86)
        d = corpus.shape[1]
        new_rows = _blob_corpus(256, d, n_blobs=30, seed=87)
        import jax as _jax

        grown = cols.append_sharded(
            _jax.device_put(jnp.asarray(new_rows)), 256
        )
        assert grown.pq_layout == "cols"
        assert grown.n_total == cols.n_total + 256
        assert grown.capacity % 128 == 0
        # appended rows must be findable via their own reconstruction
        rec = grown.reconstruct(np.arange(cols.n_total, cols.n_total + 8))
        s, i = grown.search(rec, k=5, batch_size=8)
        hits = np.mean([
            cols.n_total + r in i[r].tolist() for r in range(8)
        ])
        assert hits >= 0.8  # codec error can shuffle a near-tie
        shrunk = grown.remove_rows(np.arange(64))
        assert shrunk.n_total == grown.n_total - 64
        s2, i2 = shrunk.search(queries, k=10, batch_size=8)
        assert np.all(i2 < shrunk.n_total)

    def test_cols_rejected_on_mesh(self, data_mesh):
        corpus = _blob_corpus(600, 64, seed=88)
        with pytest.raises(ValueError, match="single-device"):
            IVFIPIndex(corpus, mesh=data_mesh, n_clusters=8, nprobe=4,
                       pq_m=32, pq_layout="cols")
        # auto on a mesh resolves to rows
        idx = IVFIPIndex(corpus, mesh=data_mesh, n_clusters=8, nprobe=4,
                         pq_m=32, kmeans_iters=3, pq_iters=5)
        assert idx.pq_layout == "rows"


class TestBalancedKMeans:
    """balance_eta: capacity-aware assignment bias (_lloyd_body) — closes
    the Zipf cluster-size-skew recall gap (VERDICT r04 weak #2)."""

    @staticmethod
    def _zipf_corpus(n, d, n_blobs, seed, spread=0.25):
        rng = np.random.default_rng(seed)
        p = (1.0 / np.arange(1, n_blobs + 1)) ** 1.2
        p /= p.sum()
        assign = rng.choice(n_blobs, size=n, p=p)
        centers = rng.standard_normal((n_blobs, d)).astype(np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        rows = centers[assign] + spread * rng.standard_normal(
            (n, d)
        ).astype(np.float32)
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        return rows

    def test_balance_evens_fills_and_holds_recall(self):
        corpus = self._zipf_corpus(8000, 32, 32, seed=0)
        queries = self._zipf_corpus(64, 32, 32, seed=1)

        def build(eta):
            return IVFIPIndex(
                corpus, n_clusters=32, nprobe=4, capacity_slack=1.05,
                kmeans_iters=12, balance_eta=eta,
            )

        plain, balanced = build(0.0), build(0.05)
        assert plain._assign_bias_host is None
        assert balanced._assign_bias_host is not None

        def fill_std(idx):
            fills = (
                idx._row_ids_host.reshape(idx.n_clusters, idx.capacity) >= 0
            ).sum(1)
            return float(fills.std())

        assert fill_std(balanced) < 0.7 * fill_std(plain)

        def recall(idx):
            _, i = idx.search(queries, k=20, batch_size=64, nprobe=4)
            _, ei = idx.exact_search(queries, k=20, batch_size=64)
            return float(np.mean([
                len(set(i[r].tolist()) & set(ei[r].tolist())) / 20
                for r in range(64)
            ]))

        assert recall(balanced) >= recall(plain) - 0.02

    def test_balance_chunked_build_and_io(self, tmp_path):
        from rankpo_tpu.index.io import read_index, write_index

        corpus = self._zipf_corpus(6000, 32, 32, seed=2)
        idx = IVFIPIndex.from_chunk_fn(
            lambda lo, hi: corpus[lo:hi], len(corpus), 32,
            chunk_rows=2048, n_clusters=32, nprobe=4,
            capacity_slack=1.05, kmeans_iters=10, balance_eta=0.05,
        )
        assert idx._assign_bias_host is not None
        queries = self._zipf_corpus(16, 32, 32, seed=3)
        s0, i0 = idx.search(queries, k=10, batch_size=16)
        path = str(tmp_path / "bal.npz")
        write_index(idx, path)
        loaded = read_index(path)
        assert loaded.balance_eta == idx.balance_eta
        np.testing.assert_allclose(
            loaded._assign_bias_host, idx._assign_bias_host
        )
        s1, i1 = loaded.search(queries, k=10, batch_size=16)
        np.testing.assert_array_equal(i0, i1)
        # append places through the SAME biased assignment
        new_rows = self._zipf_corpus(128, 32, 32, seed=4)
        grown = loaded.append_sharded(jnp.asarray(new_rows), 128)
        assert grown.n_total == loaded.n_total + 128
        assert grown._assign_bias_host is not None

    def test_balance_sharded_build(self, data_mesh):
        corpus = self._zipf_corpus(4096, 32, 32, seed=5)
        idx = IVFIPIndex(
            corpus, mesh=data_mesh, n_clusters=32, nprobe=8,
            capacity_slack=1.1, kmeans_iters=8, balance_eta=0.05,
        )
        assert idx._assign_bias_host is not None
        queries = self._zipf_corpus(16, 32, 32, seed=6)
        _, i = idx.search(queries, k=10, batch_size=16)
        _, ei = idx.exact_search(queries, k=10, batch_size=16)
        overlap = np.mean([
            len(set(i[r].tolist()) & set(ei[r].tolist())) / 10
            for r in range(16)
        ])
        assert overlap >= 0.3  # smoke: balanced sharded build searches sanely


class TestKMeansSplit:
    """kmeans_split: centroid redistribution (the FAISS split-the-largest
    policy generalized to overfull clusters) — evens Zipf fills by
    geometry, no probe bias."""

    def test_split_evens_fills_and_helps_recall(self):
        corpus = TestBalancedKMeans._zipf_corpus(8000, 32, 32, seed=10)
        queries = TestBalancedKMeans._zipf_corpus(64, 32, 32, seed=11)

        def build(split):
            return IVFIPIndex(
                corpus, n_clusters=32, nprobe=4, capacity_slack=1.05,
                kmeans_iters=12, kmeans_split=split,
            )

        plain, split = build(0), build(4)
        assert split.kmeans_split == 4
        assert split.assign_bias is None  # geometry-only: no probe bias

        def fill_std(idx):
            fills = (
                idx._row_ids_host.reshape(idx.n_clusters, idx.capacity) >= 0
            ).sum(1)
            return float(fills.std())

        assert fill_std(split) < fill_std(plain)

        def recall(idx):
            _, i = idx.search(queries, k=20, batch_size=64, nprobe=4)
            _, ei = idx.exact_search(queries, k=20, batch_size=64)
            return float(np.mean([
                len(set(i[r].tolist()) & set(ei[r].tolist())) / 20
                for r in range(64)
            ]))

        assert recall(split) >= recall(plain) - 0.02

    def test_split_io_roundtrip(self, tmp_path):
        from rankpo_tpu.index.io import read_index, write_index

        corpus = TestBalancedKMeans._zipf_corpus(2000, 32, 16, seed=12)
        idx = IVFIPIndex(corpus, n_clusters=16, nprobe=16, kmeans_iters=6,
                         kmeans_split=2)
        queries = TestBalancedKMeans._zipf_corpus(8, 32, 16, seed=13)
        s0, i0 = idx.search(queries, k=10, batch_size=8)
        path = str(tmp_path / "split.npz")
        write_index(idx, path)
        loaded = read_index(path)
        assert loaded.kmeans_split == 2
        s1, i1 = loaded.search(queries, k=10, batch_size=8)
        np.testing.assert_array_equal(i0, i1)
