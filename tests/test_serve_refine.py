"""Serving with index_type='refine': the two-stage RefineIPIndex behind
the same RetrievalService surface (fused dispatch, rebuilds, persistence).

The refine index is approximate by contract, so these tests use a tiny
self-retrieval corpus where recall is trivially 1.0 (each query IS a
corpus document) and assert behavior, not FAISS tie order.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankpo_tpu.data import HashTokenizer
from rankpo_tpu.index import InferenceEncoder, RefineIPIndex
from rankpo_tpu.models import init_params, tiny_llama_config
from rankpo_tpu.serve import RetrievalService


@pytest.fixture(scope="module")
def refine_service(data_mesh):
    cfg = tiny_llama_config(vocab_size=256)
    params = init_params(jax.random.key(0), cfg)
    tok = HashTokenizer(vocab_size=256)
    encoder = InferenceEncoder(cfg, params, tok, mesh=data_mesh,
                               compute_dtype=jnp.float32, length_multiple=8)
    svc = RetrievalService(
        encoder, mesh=data_mesh, max_query_length=16, query_batch_size=8,
        index_type="refine",
        index_kwargs={"reduced_dim": 16, "candidates": 16},
    )
    corpus = [f"document {i} on distinct topic {i}" for i in range(32)]
    svc.build_index(corpus, max_passage_length=16, batch_size=8)
    return svc


class TestRefineServing:
    def test_index_is_refine(self, refine_service):
        assert isinstance(refine_service.index, RefineIPIndex)
        assert refine_service.index.candidates == 16

    def test_self_retrieval(self, refine_service):
        res = refine_service.query("document 7 on distinct topic 7", k=3)
        assert res["hits"][0]["index"] == 7
        assert res["hits"][0]["score"] == pytest.approx(1.0, abs=1e-2)
        assert res["hits"][0]["passage"].startswith("document 7")

    def test_per_request_candidates(self, refine_service):
        # FAISS per-call parameter analog: a full-width rerank pool per
        # request; the tuned index knob is untouched
        res = refine_service.query("document 7 on distinct topic 7", k=3,
                                   candidates=32)
        assert res["hits"][0]["index"] == 7
        assert refine_service.index.candidates == 16
        with pytest.raises(ValueError, match="nprobe applies"):
            refine_service.query("document 7 on distinct topic 7", k=3,
                                 nprobe=4)

    def test_fused_matches_two_dispatch(self, refine_service):
        queries = ["document 3 on distinct topic 3",
                   "document 19 on distinct topic 19"]
        assert refine_service.fuse_encode_search
        fused = refine_service.query(queries, k=4, return_passages=False)
        refine_service.fuse_encode_search = False
        try:
            direct = refine_service.query(queries, k=4, return_passages=False)
        finally:
            refine_service.fuse_encode_search = True
        for f, d in zip(fused, direct):
            assert [h["index"] for h in f["hits"]] == [
                h["index"] for h in d["hits"]
            ]

    def test_save_load_round_trip(self, refine_service, data_mesh, tmp_path):
        path = str(tmp_path / "refine_index.npz")
        refine_service.save_index(path)
        svc = RetrievalService(
            refine_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="refine",
            index_kwargs={"reduced_dim": 16, "candidates": 16},
        )
        svc.load_index_file(path + ".npz" if not path.endswith(".npz") else path)
        assert isinstance(svc.index, RefineIPIndex)
        res = svc.query("document 5 on distinct topic 5", k=2)
        assert res["hits"][0]["index"] == 5

    def test_load_reuses_tuned_candidates(self, refine_service, data_mesh,
                                          tmp_path, monkeypatch):
        # auto-tune once, save; a restart with candidates='auto' must reuse
        # the persisted tuned count instead of re-running the recall ladder
        svc = RetrievalService(
            refine_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="refine",
            index_kwargs={"reduced_dim": 16, "candidates": "auto"},
            recall_target=0.9,
        )
        svc.build_index(
            [f"document {i} on distinct topic {i}" for i in range(20)],
            max_passage_length=16, batch_size=8,
        )
        tuned = svc.index.candidates
        path = str(tmp_path / "tuned.npz")
        svc.save_index(path)

        svc2 = RetrievalService(
            refine_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="refine",
            index_kwargs={"reduced_dim": 16, "candidates": "auto"},
            recall_target=0.9,
        )
        monkeypatch.setattr(
            RefineIPIndex, "_tune_candidates",
            lambda *a, **k: pytest.fail("restart re-ran the tune ladder"),
        )
        svc2.load_index_file(path)
        assert svc2.index.candidates == tuned

    def test_add_passages_rebuilds_refine(self, refine_service, data_mesh):
        svc = RetrievalService(
            refine_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="refine",
            index_kwargs={"reduced_dim": 16, "candidates": 16},
        )
        svc.build_index(
            [f"document {i} on distinct topic {i}" for i in range(16)],
            max_passage_length=16, batch_size=8,
        )
        # a textually distinctive passage: with the untrained tiny encoder
        # some "document i" pairs collide to identical embeddings (exact
        # search would tie-break those too)
        svc.add_passages(["zebra quark lantern umbrella volcano"],
                         max_passage_length=16, batch_size=8)
        assert svc.ntotal == 17
        res = svc.query("zebra quark lantern umbrella volcano", k=1)
        assert res["hits"][0]["index"] == 16

    def test_add_passages_keeps_tuned_candidates(self, refine_service,
                                                 data_mesh, monkeypatch):
        svc = RetrievalService(
            refine_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="refine",
            index_kwargs={"reduced_dim": 16, "candidates": "auto"},
            recall_target=0.9,
        )
        svc.build_index(
            [f"document {i} on distinct topic {i}" for i in range(20)],
            max_passage_length=16, batch_size=8,
        )
        tuned = svc.index.candidates
        monkeypatch.setattr(
            RefineIPIndex, "_tune_candidates",
            lambda *a, **k: pytest.fail("/add re-ran the tune ladder"),
        )
        svc.add_passages(["zebra quark lantern volcano extra"],
                         max_passage_length=16, batch_size=8)
        assert svc.ntotal == 21
        assert svc.index.candidates == tuned

    def test_int8_refine_rejected(self, data_mesh, refine_service):
        with pytest.raises(ValueError, match="int8"):
            RetrievalService(
                refine_service.encoder, mesh=data_mesh,
                index_type="refine", index_dtype=jnp.int8,
            )

    def test_unknown_index_type_rejected(self, data_mesh, refine_service):
        with pytest.raises(ValueError, match="index_type"):
            RetrievalService(
                refine_service.encoder, mesh=data_mesh, index_type="hnsw"
            )
