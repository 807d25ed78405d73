"""Structural index persistence (rankpo_tpu.index.io): FAISS
write_index/read_index analog. Round trips must be pure placement — no
k-means, no PCA, no recall tuner — and search must be bit-identical on the
same mesh width. Loading across mesh widths re-pads (flat/refine) or
rescales the per-shard nprobe (ivf)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rankpo_tpu.index import (
    FlatIPIndex,
    IVFIPIndex,
    RefineIPIndex,
    numpy_search,
    read_index,
    write_index,
)
from rankpo_tpu.index import io as index_io


def _corpus(n, d, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    return x


def _roundtrip(index, tmp_path, mesh=None, name="idx"):
    path = str(tmp_path / f"{name}.npz")
    write_index(index, path)
    return read_index(path, mesh=mesh)


class TestFlatRoundTrip:
    def test_fp32_search_identical(self, tmp_path):
        corpus = _corpus(100, 16)
        queries = _corpus(7, 16, seed=1)
        index = FlatIPIndex(corpus)
        loaded = _roundtrip(index, tmp_path)
        s0, i0 = index.search(queries, k=10)
        s1, i1 = loaded.search(queries, k=10)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(s0, s1)
        assert loaded.recall_target == index.recall_target

    def test_int8_storage_bit_identical(self, tmp_path, data_mesh):
        # int8 codes + scales must round-trip EXACTLY (the legacy embedding
        # format went through a lossy dequantize/requantize)
        corpus = _corpus(40, 16, seed=2)
        index = FlatIPIndex(corpus, data_mesh, dtype=jnp.int8)
        loaded = _roundtrip(index, tmp_path, mesh=data_mesh)
        np.testing.assert_array_equal(
            np.asarray(index.corpus), np.asarray(loaded.corpus)
        )
        np.testing.assert_array_equal(
            np.asarray(index.row_scale), np.asarray(loaded.row_scale)
        )
        queries = _corpus(5, 16, seed=3)
        s0, i0 = index.search(queries, k=5)
        s1, i1 = loaded.search(queries, k=5)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(s0, s1)

    def test_bf16_resharded_to_mesh(self, tmp_path, data_mesh):
        # save unsharded with a row count not divisible by 8: the load
        # re-pads for the new shard count
        corpus = _corpus(33, 16, seed=4)
        index = FlatIPIndex(corpus, dtype=jnp.bfloat16)
        loaded = _roundtrip(index, tmp_path, mesh=data_mesh)
        assert loaded.n_padded % 8 == 0
        queries = _corpus(4, 16, seed=5)
        s0, i0 = index.search(queries, k=7)
        s1, i1 = loaded.search(queries, k=7)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(s0, s1, atol=1e-6)


class TestRefineRoundTrip:
    def test_no_retune_and_identical_search(self, tmp_path, data_mesh,
                                            monkeypatch):
        corpus = _corpus(64, 32, seed=6)
        index = RefineIPIndex(
            corpus, data_mesh, reduced_dim=8, candidates=16
        )
        monkeypatch.setattr(
            RefineIPIndex, "_tune_candidates",
            lambda *a, **k: pytest.fail("load re-ran the candidate tuner"),
        )
        loaded = _roundtrip(index, tmp_path, mesh=data_mesh)
        assert loaded.candidates == index.candidates
        assert loaded.reduced_dim == index.reduced_dim
        np.testing.assert_array_equal(
            np.asarray(index.proj), np.asarray(loaded.proj)
        )
        queries = _corpus(6, 32, seed=7)
        s0, i0 = index.search(queries, k=5)
        s1, i1 = loaded.search(queries, k=5)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(s0, s1)


class TestIVFRoundTrip:
    def test_no_rebuild_and_identical_search(self, tmp_path, data_mesh,
                                             monkeypatch):
        corpus = _corpus(200, 16, seed=8)
        index = IVFIPIndex(
            corpus, data_mesh, n_clusters=16, nprobe=2, capacity_slack=1.5
        )
        monkeypatch.setattr(
            IVFIPIndex, "_train_and_assign",
            lambda *a, **k: pytest.fail("load re-ran k-means"),
        )
        monkeypatch.setattr(
            IVFIPIndex, "_tune_nprobe",
            lambda *a, **k: pytest.fail("load re-ran the nprobe tuner"),
        )
        loaded = _roundtrip(index, tmp_path, mesh=data_mesh)
        assert loaded.nprobe == index.nprobe
        assert loaded.n_clusters == index.n_clusters
        assert loaded.capacity == index.capacity
        np.testing.assert_array_equal(
            np.asarray(index.corpus), np.asarray(loaded.corpus)
        )
        np.testing.assert_array_equal(
            np.asarray(index.row_ids), np.asarray(loaded.row_ids)
        )
        queries = _corpus(9, 16, seed=9)
        s0, i0 = index.search(queries, k=6)
        s1, i1 = loaded.search(queries, k=6)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(s0, s1)

    def test_int8_hybrid_round_trip(self, tmp_path):
        corpus = _corpus(160, 32, seed=10)
        index = IVFIPIndex(
            corpus, n_clusters=4, nprobe=4, store_dtype=jnp.int8,
            reduced_dim=8, candidates=32,
        )
        loaded = _roundtrip(index, tmp_path)
        assert loaded.quantized and loaded.reduced_dim == 8
        np.testing.assert_array_equal(
            np.asarray(index.slot_scale), np.asarray(loaded.slot_scale)
        )
        np.testing.assert_array_equal(
            np.asarray(index.corpus_low).view(np.uint16),
            np.asarray(loaded.corpus_low).view(np.uint16),
        )
        queries = _corpus(5, 32, seed=11)
        s0, i0 = index.search(queries, k=4)
        s1, i1 = loaded.search(queries, k=4)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(s0, s1)

    def test_pq_round_trip(self, tmp_path, monkeypatch):
        corpus = _corpus(240, 32, seed=15)
        index = IVFIPIndex(
            corpus, n_clusters=4, nprobe=4, pq_m=8, kmeans_iters=3,
            pq_iters=5,
        )
        monkeypatch.setattr(
            IVFIPIndex, "_fit_pq_codebooks",
            lambda *a, **k: pytest.fail("load re-trained PQ codebooks"),
        )
        loaded = _roundtrip(index, tmp_path)
        assert loaded.pq_m == 8
        assert np.asarray(loaded.corpus).dtype == np.uint8
        np.testing.assert_array_equal(
            np.asarray(index.corpus), np.asarray(loaded.corpus)
        )
        np.testing.assert_array_equal(
            index._codebooks_host, loaded._codebooks_host
        )
        queries = _corpus(5, 32, seed=16)
        s0, i0 = index.search(queries, k=4)
        s1, i1 = loaded.search(queries, k=4)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(s0, s1)

    def test_pq_rotated_round_trip(self, tmp_path, monkeypatch):
        # pq_rotate: the orthogonal pre-rotation must persist byte-exact
        # (codes store ROTATED residuals — losing or refitting the
        # rotation silently breaks every stored code)
        corpus = _corpus(240, 32, seed=17)
        index = IVFIPIndex(
            corpus, n_clusters=4, nprobe=4, pq_m=8, kmeans_iters=3,
            pq_iters=5, pq_rotate="random",
        )
        monkeypatch.setattr(
            IVFIPIndex, "_fit_pq_codebooks",
            lambda *a, **k: pytest.fail("load re-trained PQ codebooks"),
        )
        loaded = _roundtrip(index, tmp_path)
        assert loaded.pq_rotate == "random"
        np.testing.assert_array_equal(
            index._rotation_host, loaded._rotation_host
        )
        queries = _corpus(5, 32, seed=18)
        s0, i0 = index.search(queries, k=4)
        s1, i1 = loaded.search(queries, k=4)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(s0, s1)

    def test_mesh_width_change_rescales_nprobe(self, tmp_path, data_mesh):
        # unsharded nprobe=4 of 8 clusters -> on 8 shards each shard owns 1
        # cluster; preserving the TOTAL probed count (4) needs ceil(4/8)=1
        # per shard
        corpus = _corpus(200, 16, seed=12)
        index = IVFIPIndex(
            corpus, n_clusters=8, nprobe=4, store_dtype=jnp.float32
        )
        loaded = _roundtrip(index, tmp_path, mesh=data_mesh)
        assert loaded.local_clusters == 1
        assert loaded.nprobe == 1
        # on the wider mesh every cluster is probed -> exact coverage
        queries = _corpus(6, 16, seed=13)
        _, ref = numpy_search(corpus, queries, 5)
        _, got = loaded.search(queries, k=5)
        recall = np.mean([
            len(set(got[r]) & set(ref[r])) / 5 for r in range(len(queries))
        ])
        assert recall == 1.0  # 8 shards x nprobe 1 = all 8 clusters probed

    def test_indivisible_clusters_error(self, tmp_path, data_mesh):
        corpus = _corpus(80, 16, seed=14)
        index = IVFIPIndex(corpus, n_clusters=4, nprobe=2)
        path = str(tmp_path / "ivf4.npz")
        write_index(index, path)
        with pytest.raises(ValueError, match="not divisible"):
            read_index(path, mesh=data_mesh)


class TestFileFormat:
    def test_state_detection(self, tmp_path):
        index = FlatIPIndex(_corpus(16, 8))
        state = index_io.index_state(index)
        assert index_io.is_index_state(state)
        assert index_io.state_kind(state) == "flat"
        assert not index_io.is_index_state({"embeddings": np.zeros(3)})

    def test_unknown_format_rejected(self):
        bad = {index_io.CONFIG_KEY: np.asarray('{"format": "v999"}')}
        with pytest.raises(ValueError, match="format"):
            index_io.index_from_state(bad)

    def test_atomic_write_appends_npz(self, tmp_path):
        index = FlatIPIndex(_corpus(16, 8))
        path = str(tmp_path / "noext")
        write_index(index, path)
        loaded = read_index(path + ".npz")
        assert loaded.n_total == 16
