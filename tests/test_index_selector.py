"""Filtered search — the FAISS IDSelector / SearchParameters analog.

Reference semantics (faiss SearchParameters(sel=IDSelectorBatch/Not), used
with the IndexFlatIP the reference builds in src/utils.py:38-80): only
selected ids may be returned; when fewer than k rows are eligible the tail
is padded with label -1. The TPU engine implements the filter as one
where-select on the score matrix before top-k (ops/topk.py row_mask), so
exact flat search stays bit-compatible with a filtered numpy oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rankpo_tpu.core.mesh import MeshConfig, make_mesh
from rankpo_tpu.index.flat import FlatIPIndex, build_selector_mask
from rankpo_tpu.index.ivf import IVFIPIndex
from rankpo_tpu.index.refined import RefineIPIndex


def _corpus(n=203, d=64, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.normal(size=(n, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    q = (c[:9] + 0.1 * rng.normal(size=(9, d))).astype(np.float32)
    return c, q


def _oracle(corpus, queries, k, mask):
    """Filtered numpy oracle with FAISS tie + -1 padding semantics."""
    s = queries @ corpus.T
    s[:, ~mask] = -np.inf
    order = np.argsort(-s, axis=1, kind="stable")[:, :k]
    scores = np.take_along_axis(s, order, axis=1)
    idx = np.where(np.isfinite(scores), order, -1)
    return scores, idx


class TestSelectorMask:
    def test_allowed(self):
        m = build_selector_mask(10, allowed_ids=[1, 3])
        assert m.sum() == 2 and m[1] and m[3]

    def test_disallowed(self):
        m = build_selector_mask(10, disallowed_ids=[0, 9])
        assert m.sum() == 8 and not m[0] and not m[9]

    def test_prebuilt_passthrough(self):
        sel = np.zeros(10, bool)
        sel[4] = True
        m = build_selector_mask(10, selector=sel)
        assert np.array_equal(m, sel)
        m[4] = False  # returned mask is a copy
        assert sel[4]

    def test_none_when_no_filter(self):
        assert build_selector_mask(10) is None

    def test_mutually_exclusive(self):
        with pytest.raises(ValueError):
            build_selector_mask(10, allowed_ids=[1], disallowed_ids=[2])

    def test_out_of_range(self):
        with pytest.raises(IndexError):
            build_selector_mask(10, allowed_ids=[10])
        with pytest.raises(IndexError):
            build_selector_mask(10, disallowed_ids=[-1])

    def test_bad_prebuilt(self):
        with pytest.raises(ValueError):
            build_selector_mask(10, selector=np.zeros(9, bool))
        with pytest.raises(ValueError):
            build_selector_mask(10, selector=np.zeros(10, np.int32))


class TestFlatFiltered:
    @pytest.mark.parametrize("with_mesh", [False, True])
    def test_allowed_matches_oracle(self, with_mesh):
        corpus, queries = _corpus()
        mesh = (
            make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
            if with_mesh else None
        )
        index = FlatIPIndex(corpus, mesh=mesh)
        rng = np.random.default_rng(1)
        allowed = rng.choice(len(corpus), 37, replace=False)
        mask = np.zeros(len(corpus), bool)
        mask[allowed] = True
        scores, idx = index.search(queries, k=10, allowed_ids=allowed)
        o_scores, o_idx = _oracle(corpus, queries, 10, mask)
        assert np.array_equal(idx, o_idx)
        np.testing.assert_allclose(
            np.where(np.isfinite(scores), scores, 0.0),
            np.where(np.isfinite(o_scores), o_scores, 0.0),
            rtol=2e-5, atol=2e-6,
        )

    def test_disallowed_matches_oracle(self):
        corpus, queries = _corpus()
        index = FlatIPIndex(corpus)
        rng = np.random.default_rng(2)
        dis = rng.choice(len(corpus), 150, replace=False)
        mask = np.ones(len(corpus), bool)
        mask[dis] = False
        _, idx = index.search(queries, k=25, disallowed_ids=dis)
        _, o_idx = _oracle(corpus, queries, 25, mask)
        assert np.array_equal(idx, o_idx)

    def test_prebuilt_selector(self):
        corpus, queries = _corpus()
        index = FlatIPIndex(corpus)
        mask = np.arange(len(corpus)) % 3 == 0  # arbitrary predicate
        _, idx = index.search(queries, k=10, selector=mask)
        _, o_idx = _oracle(corpus, queries, 10, mask)
        assert np.array_equal(idx, o_idx)

    def test_tail_padded_minus_one(self):
        corpus, queries = _corpus()
        index = FlatIPIndex(corpus)
        scores, idx = index.search(queries, k=10, allowed_ids=[5, 9])
        assert (idx[:, 2:] == -1).all()
        assert set(idx[:, :2].ravel()) <= {5, 9}
        assert not np.isfinite(scores[:, 2:]).any()

    def test_int8_storage_respects_filter(self):
        corpus, queries = _corpus()
        index = FlatIPIndex(corpus, dtype=jnp.int8)
        allowed = [3, 14, 60, 100, 202]
        _, idx = index.search(queries, k=5, allowed_ids=allowed)
        hits = idx[idx >= 0]
        assert set(hits.tolist()) <= set(allowed)

    def test_unfiltered_path_unchanged(self):
        corpus, queries = _corpus()
        index = FlatIPIndex(corpus)
        s1, i1 = index.search(queries, k=10)
        index.search(queries, k=10, allowed_ids=[1, 2, 3])
        s2, i2 = index.search(queries, k=10)  # cache intact after filter
        assert np.array_equal(i1, i2)
        assert np.array_equal(s1, s2)

    def test_filter_survives_mutation(self):
        # shape-preserving append adopts compiled programs, including the
        # filtered variant — the selector mask covers the new rows too
        corpus, queries = _corpus()
        index = FlatIPIndex(corpus)
        new_rows = np.ones((5, corpus.shape[1]), np.float32) * 10.0
        buf = np.zeros((8, corpus.shape[1]), np.float32)
        buf[:5] = new_rows
        grown = index.append_sharded(jnp.asarray(buf), 5, headroom=0.25)
        # only the appended (huge-scoring) rows allowed
        allowed = list(range(len(corpus), len(corpus) + 5))
        _, idx = grown.search(queries, k=5, allowed_ids=allowed)
        assert set(idx.ravel().tolist()) <= set(allowed)


class TestRefineFiltered:
    @pytest.mark.parametrize("with_mesh", [False, True])
    def test_allowed_only_and_recall(self, with_mesh):
        corpus, queries = _corpus(n=640)
        mesh = (
            make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
            if with_mesh else None
        )
        index = RefineIPIndex(
            corpus, mesh=mesh, reduced_dim=16, recall_target=0.95
        )
        rng = np.random.default_rng(3)
        allowed = rng.choice(len(corpus), 101, replace=False)
        mask = np.zeros(len(corpus), bool)
        mask[allowed] = True
        _, idx = index.search(queries, k=10, allowed_ids=allowed)
        assert set(idx[idx >= 0].tolist()) <= set(allowed.tolist())
        _, o_idx = _oracle(corpus, queries, 10, mask)
        recall = np.mean([
            len(set(idx[q][idx[q] >= 0]) & set(o_idx[q][o_idx[q] >= 0])) / 10
            for q in range(len(queries))
        ])
        assert recall >= 0.9  # two-stage filter applies BEFORE selection

    def test_tail_padded(self):
        corpus, queries = _corpus(n=640)
        index = RefineIPIndex(corpus, reduced_dim=16, recall_target=0.95)
        _, idx = index.search(queries, k=10, allowed_ids=[7, 8, 9])
        assert (np.sort(idx, axis=1)[:, :7] == -1).all()
        assert set(idx[idx >= 0].tolist()) <= {7, 8, 9}


class TestIVFFiltered:
    @pytest.mark.parametrize(
        "kwargs",
        [
            {},
            {"store_dtype": jnp.int8},
            {"pq_m": 8},
            {"reduced_dim": 16},
        ],
        ids=["flat", "int8", "pq", "hybrid"],
    )
    def test_allowed_only(self, kwargs):
        corpus, queries = _corpus(n=640)
        index = IVFIPIndex(corpus, n_clusters=8, nprobe=8, **kwargs)
        rng = np.random.default_rng(4)
        allowed = rng.choice(len(corpus), 101, replace=False)
        _, idx = index.search(queries, k=10, allowed_ids=allowed)
        assert set(idx[idx >= 0].tolist()) <= set(allowed.tolist())
        # disallow-complement returns the same eligible set
        dis = np.setdiff1d(np.arange(len(corpus)), allowed)
        _, idx2 = index.search(queries, k=10, disallowed_ids=dis)
        assert set(idx2[idx2 >= 0].tolist()) <= set(allowed.tolist())

    def test_mesh_filtered(self):
        corpus, queries = _corpus(n=640)
        mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
        index = IVFIPIndex(corpus, mesh=mesh, n_clusters=8, nprobe=8)
        allowed = np.arange(0, 640, 5)
        _, idx = index.search(queries, k=10, allowed_ids=allowed)
        assert set(idx[idx >= 0].tolist()) <= set(allowed.tolist())

    def test_full_probe_matches_flat_filtered(self):
        # nprobe == n_clusters probes everything: the filtered IVF result
        # must match the filtered exact oracle on the same rows
        corpus, queries = _corpus(n=640)
        index = IVFIPIndex(corpus, n_clusters=4, nprobe=4)
        rng = np.random.default_rng(5)
        allowed = rng.choice(len(corpus), 64, replace=False)
        mask = np.zeros(len(corpus), bool)
        mask[allowed] = True
        _, idx = index.search(queries, k=10, allowed_ids=allowed)
        _, o_idx = _oracle(corpus, queries, 10, mask)
        assert [set(r[r >= 0]) for r in idx] == [
            set(r[r >= 0]) for r in o_idx
        ]


class TestServiceFiltered:
    def _service(self, data_mesh, stable=False, ids=None, n=16):
        import jax

        from rankpo_tpu.data import HashTokenizer
        from rankpo_tpu.index import InferenceEncoder
        from rankpo_tpu.models import init_params, tiny_llama_config
        from rankpo_tpu.serve import RetrievalService

        cfg = tiny_llama_config(vocab_size=256)
        enc = InferenceEncoder(cfg, init_params(jax.random.key(0), cfg),
                               HashTokenizer(vocab_size=256), mesh=data_mesh,
                               compute_dtype=jnp.float32, length_multiple=8)
        svc = RetrievalService(enc, mesh=data_mesh, max_query_length=16,
                               query_batch_size=8, stable_ids=stable)
        corpus = [f"document {i} on distinct topic {i}" for i in range(n)]
        svc.build_index(corpus, max_passage_length=16, batch_size=8, ids=ids)
        return svc

    def test_positional_filter(self, data_mesh):
        svc = self._service(data_mesh)
        allowed = list(range(0, 16, 2))
        res = svc.query(["document 7 on distinct topic 7"], k=4,
                        allowed_ids=allowed)
        assert res[0]["hits"], "filter must still return eligible hits"
        for hit in res[0]["hits"]:
            assert hit["index"] in allowed

    def test_stable_id_filter(self, data_mesh):
        ids = [100 + 3 * i for i in range(16)]
        svc = self._service(data_mesh, stable=True, ids=ids)
        allowed_ext = [103, 109]
        res = svc.query(["document 3 on distinct topic 3"], k=4,
                        allowed_ids=allowed_ext)
        assert res[0]["hits"]
        for hit in res[0]["hits"]:
            assert hit["id"] in allowed_ext
        # unknown external ids never match (FAISS IDSelectorBatch semantics)
        res2 = svc.query(["document 3 on distinct topic 3"], k=4,
                         allowed_ids=[10 ** 12])
        assert res2[0]["hits"] == []

    def test_disallowed(self, data_mesh):
        svc = self._service(data_mesh)
        res_all = svc.query(["document 5 on distinct topic 5"], k=2)
        top = res_all[0]["hits"][0]["index"]
        res = svc.query(["document 5 on distinct topic 5"], k=2,
                        disallowed_ids=[top])
        assert res[0]["hits"]
        assert all(h["index"] != top for h in res[0]["hits"])

    def test_filtered_matches_fused_on_allowed_rows(self, data_mesh):
        # sanity: an all-allowing filter returns the same top hit as the
        # (unfiltered) fused path
        svc = self._service(data_mesh)
        plain = svc.query(["document 9 on distinct topic 9"], k=3)
        filt = svc.query(["document 9 on distinct topic 9"], k=3,
                         allowed_ids=list(range(16)))
        assert (plain[0]["hits"][0]["index"]
                == filt[0]["hits"][0]["index"] == 9)

    def test_both_filters_rejected(self, data_mesh):
        svc = self._service(data_mesh)
        with pytest.raises(ValueError):
            svc.query(["x"], k=2, allowed_ids=[0], disallowed_ids=[1])
