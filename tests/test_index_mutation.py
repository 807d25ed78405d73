"""Device-resident index mutation: append_sharded / remove_rows.

FAISS ``add`` / ``remove_ids`` analogs WITHOUT the O(N*D) fp32 host round
trip the serving layer used to pay (fetch stored rows -> concat on host ->
rebuild). The device path slices/gathers existing storage on device —
existing codes ride over bit-exactly — and only the new rows are
cast/quantized/encoded, against FIXED trained artifacts (centroids, PQ
codebooks, PCA basis), which is exactly FAISS's add-time contract
(reference index usage: /root/reference/src/utils.py:38-80).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rankpo_tpu.core.mesh import DATA_AXIS
from rankpo_tpu.index import FlatIPIndex, IVFIPIndex, RefineIPIndex
from rankpo_tpu.index.flat import numpy_search


def _corpus(n, d=16, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _device_rows(rows, mesh):
    """Host rows -> the encode_sharded layout (row-sharded, zero pad)."""
    n = rows.shape[0]
    if mesh is None:
        return jax.device_put(jnp.asarray(rows))
    n_shards = mesh.shape[DATA_AXIS]
    n_buf = -(-n // n_shards) * n_shards
    emb = np.concatenate(
        [rows, np.zeros((n_buf - n, rows.shape[1]), np.float32)]
    )
    return jax.device_put(emb, NamedSharding(mesh, P(DATA_AXIS, None)))


class TestFlatMutation:
    def test_append_matches_oracle(self, data_mesh):
        old, new = _corpus(101), _corpus(23, seed=1)
        index = FlatIPIndex(old, data_mesh)
        out = index.append_sharded(_device_rows(new, data_mesh), 23)
        assert out.ntotal == 124 and index.ntotal == 101  # old untouched
        full = np.concatenate([old, new])
        q = _corpus(9, seed=2)
        ref_s, ref_i = numpy_search(full, q, 10)
        got_s, got_i = out.search(q, k=10, batch_size=4)
        np.testing.assert_array_equal(got_i, ref_i)
        np.testing.assert_allclose(got_s, ref_s, rtol=1e-5, atol=1e-5)

    def test_remove_matches_oracle(self, data_mesh):
        corpus = _corpus(97)
        index = FlatIPIndex(corpus, data_mesh)
        removed = [0, 5, 6, 7, 50, 96]
        out = index.remove_rows(removed)
        assert out.ntotal == 91
        keep = np.setdiff1d(np.arange(97), removed)
        q = _corpus(7, seed=3)
        ref_s, ref_i = numpy_search(corpus[keep], q, 10)
        got_s, got_i = out.search(q, k=10, batch_size=4)
        np.testing.assert_array_equal(got_i, ref_i)
        np.testing.assert_allclose(got_s, ref_s, rtol=1e-5, atol=1e-5)
        # old index unaffected (in-flight search contract)
        s0, i0 = index.search(q, k=5, batch_size=4)
        r0s, r0i = numpy_search(corpus, q, 5)
        np.testing.assert_array_equal(i0, r0i)

    def test_append_then_remove_chain(self, data_mesh):
        old, new = _corpus(40), _corpus(17, seed=4)
        index = FlatIPIndex(old, data_mesh)
        grown = index.append_sharded(_device_rows(new, data_mesh), 17)
        out = grown.remove_rows(np.arange(0, 40, 2))  # drop 20 old rows
        full = np.concatenate([old, new])
        keep = np.setdiff1d(np.arange(57), np.arange(0, 40, 2))
        q = _corpus(5, seed=5)
        ref_s, ref_i = numpy_search(full[keep], q, 8)
        got_s, got_i = out.search(q, k=8, batch_size=8)
        np.testing.assert_array_equal(got_i, ref_i)

    def test_int8_old_codes_bit_exact(self, data_mesh):
        old, new = _corpus(64), _corpus(8, seed=6)
        index = FlatIPIndex(old, data_mesh, dtype=jnp.int8)
        out = index.append_sharded(_device_rows(new, data_mesh), 8)
        np.testing.assert_array_equal(
            np.asarray(out.corpus)[:64], np.asarray(index.corpus)[:64]
        )
        np.testing.assert_array_equal(
            np.asarray(out.row_scale)[:64], np.asarray(index.row_scale)[:64]
        )
        kept = out.remove_rows([1, 65])
        # surviving codes are GATHERED, never requantized
        surviving = np.concatenate([[0], np.arange(2, 64), [64], [66, 67],
                                    np.arange(68, 72)])
        np.testing.assert_array_equal(
            np.asarray(kept.corpus)[: len(surviving)],
            np.asarray(out.corpus)[surviving],
        )

    def test_no_mesh_paths(self):
        old, new = _corpus(33), _corpus(9, seed=7)
        index = FlatIPIndex(old, None)
        out = index.append_sharded(_device_rows(new, None), 9)
        full = np.concatenate([old, new])
        q = _corpus(4, seed=8)
        ref_s, ref_i = numpy_search(full, q, 6)
        got_s, got_i = out.search(q, k=6, batch_size=4)
        np.testing.assert_array_equal(got_i, ref_i)
        out2 = out.remove_rows([2, 3, 40])
        keep = np.setdiff1d(np.arange(42), [2, 3, 40])
        ref_s, ref_i = numpy_search(full[keep], q, 6)
        got_s, got_i = out2.search(q, k=6, batch_size=4)
        np.testing.assert_array_equal(got_i, ref_i)

    def test_validation(self, data_mesh):
        index = FlatIPIndex(_corpus(16), data_mesh)
        with pytest.raises(ValueError):
            index.append_sharded(_device_rows(_corpus(4), data_mesh), 0)
        with pytest.raises(ValueError):
            index.append_sharded(
                _device_rows(_corpus(4, d=8), data_mesh), 4
            )
        with pytest.raises(IndexError):
            index.remove_rows([16])
        with pytest.raises(ValueError):
            index.remove_rows(np.arange(16))
        assert index.remove_rows([]) is index


class TestProgramCarryOver:
    """Shape-preserving mutations must carry compiled programs across:
    search programs read all corpus state (storage, scales, valid-row
    count, row ids) as ARGUMENTS, so appends into pad headroom and
    removals (which keep the padded shape) reuse them — no recompile."""

    def test_flat_append_into_pad_rows(self, data_mesh):
        old = _corpus(101)  # 8 shards -> n_padded 104: 3 free pad rows
        index = FlatIPIndex(old, data_mesh)
        q = _corpus(4, seed=1)
        index.search(q, k=5, batch_size=4)  # populate the program cache
        new = _corpus(3, seed=2)
        out = index.append_sharded(_device_rows(new, data_mesh), 3)
        assert out.corpus.shape == index.corpus.shape
        assert out._search_fns is index._search_fns  # adopted, not rebuilt
        full = np.concatenate([old, new])
        ref_s, ref_i = numpy_search(full, q, 5)
        got_s, got_i = out.search(q, k=5, batch_size=4)
        np.testing.assert_array_equal(got_i, ref_i)
        np.testing.assert_allclose(got_s, ref_s, rtol=1e-5, atol=1e-5)
        # the OLD index still answers for its own corpus (shared programs,
        # separate n_valid argument)
        s0, i0 = index.search(q, k=5, batch_size=4)
        r0s, r0i = numpy_search(old, q, 5)
        np.testing.assert_array_equal(i0, r0i)

    def test_flat_int8_append_into_pad_rows(self, data_mesh):
        old = _corpus(100)  # n_padded 104: 4 free
        index = FlatIPIndex(old, data_mesh, dtype=jnp.int8)
        new = _corpus(4, seed=3)
        out = index.append_sharded(_device_rows(new, data_mesh), 4)
        assert out.corpus.shape == index.corpus.shape
        assert out._search_fns is index._search_fns
        np.testing.assert_array_equal(
            np.asarray(out.corpus)[:100], np.asarray(index.corpus)[:100]
        )
        got_s, got_i = out.search(new, k=1, batch_size=4)
        np.testing.assert_array_equal(got_i[:, 0], np.arange(100, 104))

    def test_flat_growth_headroom_prepays_next_append(self, data_mesh):
        old = _corpus(64)  # zero free pad rows
        index = FlatIPIndex(old, data_mesh)
        new1, new2 = _corpus(8, seed=4), _corpus(8, seed=5)
        grown = index.append_sharded(
            _device_rows(new1, data_mesh), 8, headroom=0.5
        )
        assert grown.n_padded >= int(np.ceil(72 * 1.5))
        assert grown._search_fns is not index._search_fns  # shapes changed
        out = grown.append_sharded(_device_rows(new2, data_mesh), 8)
        assert out.corpus.shape == grown.corpus.shape
        assert out._search_fns is grown._search_fns  # headroom paid off
        full = np.concatenate([old, new1, new2])
        q = _corpus(4, seed=6)
        ref_s, ref_i = numpy_search(full, q, 6)
        got_s, got_i = out.search(q, k=6, batch_size=4)
        np.testing.assert_array_equal(got_i, ref_i)

    def test_flat_remove_keeps_shapes_and_programs(self, data_mesh):
        old = _corpus(96)
        index = FlatIPIndex(old, data_mesh)
        out = index.remove_rows([0, 50])
        assert out.n_padded == index.n_padded  # freed rows become headroom
        assert out.corpus.shape == index.corpus.shape
        assert out._search_fns is index._search_fns
        # removed rows freed pad space: this append is shape-preserving
        new = _corpus(2, seed=7)
        out2 = out.append_sharded(_device_rows(new, data_mesh), 2)
        assert out2.corpus.shape == index.corpus.shape
        keep = np.setdiff1d(np.arange(96), [0, 50])
        full = np.concatenate([old[keep], new])
        q = _corpus(4, seed=8)
        ref_s, ref_i = numpy_search(full, q, 6)
        got_s, got_i = out2.search(q, k=6, batch_size=4)
        np.testing.assert_array_equal(got_i, ref_i)

    def test_refine_fast_paths(self, data_mesh):
        old = _corpus(100, d=32)  # n_padded 104: 4 free
        index = RefineIPIndex(old, data_mesh, reduced_dim=16, candidates=32)
        new = _corpus(4, d=32, seed=9)
        out = index.append_sharded(_device_rows(new, data_mesh), 4)
        assert out.corpus.shape == index.corpus.shape
        assert out._search_fns is index._search_fns
        got_s, got_i = out.search(new, k=1, batch_size=4)
        np.testing.assert_array_equal(got_i[:, 0], np.arange(100, 104))
        out2 = out.remove_rows([0])
        assert out2._search_fns is index._search_fns
        got_s, got_i = out2.search(new, k=1, batch_size=4)
        np.testing.assert_array_equal(got_i[:, 0], np.arange(99, 103))

    def test_ivf_carry_over(self, data_mesh):
        corpus = _corpus(160)
        index = IVFIPIndex(corpus, data_mesh, n_clusters=8, nprobe=8,
                           store_dtype=jnp.float32)
        out = index.remove_rows([0, 10])
        assert out._search_fns is index._search_fns  # storage shared
        new = _corpus(2, seed=10)
        out2 = out.append_sharded(_device_rows(new, data_mesh), 2)
        assert out2.capacity == index.capacity  # free slots reused
        assert out2._search_fns is index._search_fns
        keep = np.setdiff1d(np.arange(160), [0, 10])
        full = np.concatenate([corpus[keep], new])
        q = _corpus(5, seed=11)
        ref_s, ref_i = numpy_search(full, q, 10)
        got_s, got_i = out2.search(q, k=10, batch_size=8)
        np.testing.assert_array_equal(got_i, ref_i)


class TestRefineMutation:
    def test_append_keeps_basis_and_finds_new_rows(self, data_mesh):
        old, new = _corpus(120, d=32), _corpus(16, d=32, seed=1)
        index = RefineIPIndex(old, data_mesh, reduced_dim=16, candidates=32)
        out = index.append_sharded(_device_rows(new, data_mesh), 16)
        assert out.ntotal == 136
        # FAISS IndexPreTransform.add: the trained basis is FIXED
        assert out.proj is index.proj and out.candidates == index.candidates
        got_s, got_i = out.search(new, k=1, batch_size=16)
        np.testing.assert_array_equal(got_i[:, 0], np.arange(120, 136))
        # old stage-2 rows ride over bit-exactly
        np.testing.assert_array_equal(
            np.asarray(out.corpus)[:120], np.asarray(index.corpus)[:120]
        )

    def test_remove_renumbers(self, data_mesh):
        corpus = _corpus(90, d=32)
        index = RefineIPIndex(corpus, data_mesh, reduced_dim=16,
                              candidates=64)
        removed = [0, 10, 89]
        out = index.remove_rows(removed)
        keep = np.setdiff1d(np.arange(90), removed)
        got_s, got_i = out.search(corpus[keep], k=1, batch_size=32)
        np.testing.assert_array_equal(got_i[:, 0], np.arange(87))


class TestIVFMutation:
    def _build(self, corpus, mesh, **kw):
        kw.setdefault("n_clusters", 8)
        kw.setdefault("nprobe", 8)  # probe everything: exact at storage
        kw.setdefault("store_dtype", jnp.float32)
        return IVFIPIndex(corpus, mesh, **kw)

    def test_append_matches_oracle_at_full_probe(self, data_mesh):
        old, new = _corpus(160), _corpus(24, seed=1)
        index = self._build(old, data_mesh)
        out = index.append_sharded(_device_rows(new, data_mesh), 24)
        assert out.ntotal == 184
        assert out.nprobe == index.nprobe  # search-time knob survives
        full = np.concatenate([old, new])
        q = _corpus(9, seed=2)
        ref_s, ref_i = numpy_search(full, q, 10)
        got_s, got_i = out.search(q, k=10, batch_size=16)
        np.testing.assert_array_equal(got_i, ref_i)
        np.testing.assert_allclose(got_s, ref_s, rtol=1e-5, atol=1e-5)

    def test_remove_renumbers_and_masks(self, data_mesh):
        corpus = _corpus(150)
        index = self._build(corpus, data_mesh)
        removed = [0, 3, 77, 149]
        out = index.remove_rows(removed)
        assert out.ntotal == 146
        # storage is SHARED (no copy): same device arrays
        assert out.corpus is index.corpus
        keep = np.setdiff1d(np.arange(150), removed)
        q = _corpus(6, seed=3)
        ref_s, ref_i = numpy_search(corpus[keep], q, 10)
        got_s, got_i = out.search(q, k=10, batch_size=8)
        np.testing.assert_array_equal(got_i, ref_i)

    def test_remove_then_append_reuses_freed_slots(self, data_mesh):
        corpus = _corpus(160)
        index = self._build(corpus, data_mesh, capacity_slack=1.0)
        out = index.remove_rows(np.arange(40))
        new = _corpus(30, seed=4)
        grown = out.append_sharded(_device_rows(new, data_mesh), 30)
        assert grown.capacity == index.capacity  # holes were enough
        full = np.concatenate([corpus[40:], new])
        q = _corpus(5, seed=5)
        ref_s, ref_i = numpy_search(full, q, 10)
        got_s, got_i = grown.search(q, k=10, batch_size=8)
        np.testing.assert_array_equal(got_i, ref_i)

    def test_capacity_growth(self, data_mesh):
        corpus = _corpus(160)
        index = self._build(corpus, data_mesh, capacity_slack=1.0)
        new = _corpus(100, seed=6)
        out = index.append_sharded(_device_rows(new, data_mesh), 100)
        assert out.capacity > index.capacity
        assert out.capacity % 8 == 0
        full = np.concatenate([corpus, new])
        q = _corpus(7, seed=7)
        ref_s, ref_i = numpy_search(full, q, 10)
        got_s, got_i = out.search(q, k=10, batch_size=8)
        np.testing.assert_array_equal(got_i, ref_i)

    def test_int8_codes_ride_over(self, data_mesh):
        corpus = _corpus(160)
        index = self._build(corpus, data_mesh, store_dtype=jnp.int8)
        new = _corpus(8, seed=8)
        out = index.append_sharded(_device_rows(new, data_mesh), 8)
        # untouched slots keep their exact codes and scales
        old_codes = np.asarray(index.corpus)
        new_codes = np.asarray(out.corpus)
        untouched = np.asarray(index.row_ids) >= 0
        np.testing.assert_array_equal(
            new_codes[untouched], old_codes[untouched]
        )
        got_s, got_i = out.search(new, k=1, batch_size=8)
        np.testing.assert_array_equal(got_i[:, 0], np.arange(160, 168))

    def test_pq_fixed_codebook_append(self, data_mesh):
        corpus = _corpus(256, d=32)
        index = IVFIPIndex(
            corpus, data_mesh, n_clusters=8, nprobe=8, pq_m=4,
            store_dtype=jnp.bfloat16,
        )
        new = _corpus(16, d=32, seed=9)
        out = index.append_sharded(_device_rows(new, data_mesh), 16)
        # FAISS IVFPQ.add: codebooks FIXED, existing codes bit-exact
        assert out._codebooks_host is index._codebooks_host
        untouched = np.asarray(index.row_ids) >= 0
        np.testing.assert_array_equal(
            np.asarray(out.corpus)[untouched],
            np.asarray(index.corpus)[untouched],
        )
        # new rows are present and decode near their input (ADC error only)
        recon = out.reconstruct(np.arange(256, 272))
        cos = np.sum(recon * new, axis=1) / np.maximum(
            np.linalg.norm(recon, axis=1), 1e-9
        )
        assert (cos > 0.5).all()
        got_s, got_i = out.search(new, k=10, batch_size=16)
        hit = (got_i == np.arange(256, 272)[:, None]).any(axis=1)
        assert hit.mean() >= 0.9

    def test_no_mesh_ivf_mutation(self):
        corpus = _corpus(96)
        index = IVFIPIndex(corpus, None, n_clusters=4, nprobe=4,
                           store_dtype=jnp.float32)
        new = _corpus(10, seed=10)
        out = index.append_sharded(_device_rows(new, None), 10)
        out = out.remove_rows([0, 95, 100])
        full = np.concatenate([corpus, new])
        keep = np.setdiff1d(np.arange(106), [0, 95, 100])
        q = _corpus(4, seed=11)
        ref_s, ref_i = numpy_search(full[keep], q, 8)
        got_s, got_i = out.search(q, k=8, batch_size=4)
        np.testing.assert_array_equal(got_i, ref_i)

    def test_mutated_index_persistence_roundtrip(self, data_mesh):
        """A mutated index (incl. grown capacity) must save/load through
        the structural persistence format bit-identically."""
        from rankpo_tpu.index import io as index_io

        corpus = _corpus(160)
        index = self._build(corpus, data_mesh, capacity_slack=1.0)
        new = _corpus(100, seed=20)
        out = index.append_sharded(_device_rows(new, data_mesh), 100)
        out = out.remove_rows([0, 7, 200])
        assert out.capacity > index.capacity  # growth happened
        restored = index_io.index_from_state(
            index_io.index_state(out), mesh=data_mesh
        )
        assert restored.capacity == out.capacity
        assert restored.ntotal == out.ntotal
        q = _corpus(6, seed=21)
        ref_s, ref_i = out.search(q, k=10, batch_size=8)
        got_s, got_i = restored.search(q, k=10, batch_size=8)
        np.testing.assert_array_equal(got_i, ref_i)
        np.testing.assert_array_equal(got_s, ref_s)

    def test_hybrid_reduced_dim_append(self, data_mesh):
        corpus = _corpus(200, d=32)
        index = IVFIPIndex(
            corpus, data_mesh, n_clusters=8, nprobe=8, reduced_dim=16,
            candidates=64, store_dtype=jnp.float32,
        )
        new = _corpus(12, d=32, seed=12)
        out = index.append_sharded(_device_rows(new, data_mesh), 12)
        got_s, got_i = out.search(new, k=1, batch_size=16)
        np.testing.assert_array_equal(got_i[:, 0], np.arange(200, 212))
        out2 = out.remove_rows([0, 1, 205])
        got_s, got_i = out2.search(new[6:], k=1, batch_size=8)
        np.testing.assert_array_equal(
            got_i[:, 0], np.arange(203, 209)
        )
