"""Serving with index_type='ivf': the clustered IVFIPIndex behind the same
RetrievalService surface (fused dispatch, rebuilds, persistence).

IVF is approximate by contract, so these tests probe every cluster (full
probe = exact coverage) or use tiny self-retrieval corpora, and assert
behavior rather than FAISS tie order.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankpo_tpu.data import HashTokenizer
from rankpo_tpu.index import InferenceEncoder, IVFIPIndex
from rankpo_tpu.models import init_params, tiny_llama_config
from rankpo_tpu.serve import RetrievalService


@pytest.fixture(scope="module")
def ivf_service(data_mesh):
    cfg = tiny_llama_config(vocab_size=256)
    params = init_params(jax.random.key(0), cfg)
    tok = HashTokenizer(vocab_size=256)
    encoder = InferenceEncoder(cfg, params, tok, mesh=data_mesh,
                               compute_dtype=jnp.float32, length_multiple=8)
    svc = RetrievalService(
        encoder, mesh=data_mesh, max_query_length=16, query_batch_size=8,
        index_type="ivf",
        # full probe on a tiny corpus: recall is exactly 1.0, tests are
        # deterministic; the recall-ladder path is covered in test_index_ivf
        index_kwargs={"n_clusters": 8, "nprobe": 8},
    )
    corpus = [f"document {i} on distinct topic {i}" for i in range(32)]
    svc.build_index(corpus, max_passage_length=16, batch_size=8)
    return svc


class TestIVFServing:
    def test_index_is_ivf(self, ivf_service):
        assert isinstance(ivf_service.index, IVFIPIndex)
        assert ivf_service.index.nprobe == 8

    def test_self_retrieval(self, ivf_service):
        res = ivf_service.query("document 7 on distinct topic 7", k=3)
        assert res["hits"][0]["index"] == 7
        assert res["hits"][0]["score"] == pytest.approx(1.0, abs=1e-2)
        assert res["hits"][0]["passage"].startswith("document 7")
        assert all(h["index"] >= 0 for h in res["hits"])

    def test_per_request_nprobe(self, ivf_service):
        # FAISS SearchParametersIVF analog: nprobe=<all clusters> per call
        # must retrieve the target even if a smaller nprobe would miss it;
        # the tuned index knob is untouched
        res = ivf_service.query("document 11 on distinct topic 11", k=3,
                                nprobe=8)
        assert res["hits"][0]["index"] == 11
        assert ivf_service.index.nprobe == 8
        # nprobe=1 still answers (tiny corpus; behavior not tie order)
        res1 = ivf_service.query("document 11 on distinct topic 11", k=3,
                                 nprobe=1)
        assert all(h["index"] >= 0 for h in res1["hits"])

    def test_nprobe_composes_with_filter(self, ivf_service):
        res = ivf_service.query("document 11 on distinct topic 11", k=4,
                                nprobe=8, allowed_ids=[4, 11])
        assert res["hits"]
        assert all(h["index"] in (4, 11) for h in res["hits"])

    def test_candidates_rejected_on_flat(self, data_mesh):
        cfg = tiny_llama_config(vocab_size=256)
        enc = InferenceEncoder(cfg, init_params(jax.random.key(0), cfg),
                               HashTokenizer(vocab_size=256), mesh=data_mesh,
                               compute_dtype=jnp.float32, length_multiple=8)
        svc = RetrievalService(enc, mesh=data_mesh, max_query_length=16)
        svc.build_index([f"doc {i}" for i in range(8)],
                        max_passage_length=16, batch_size=8)
        with pytest.raises(ValueError, match="nprobe applies"):
            svc.query("doc 1", k=2, nprobe=4)
        with pytest.raises(ValueError, match="candidates applies"):
            svc.query("doc 1", k=2, candidates=16)

    def test_fused_matches_two_dispatch(self, ivf_service):
        queries = ["document 3 on distinct topic 3",
                   "document 19 on distinct topic 19"]
        assert ivf_service.fuse_encode_search
        fused = ivf_service.query(queries, k=4, return_passages=False)
        ivf_service.fuse_encode_search = False
        try:
            direct = ivf_service.query(queries, k=4, return_passages=False)
        finally:
            ivf_service.fuse_encode_search = True
        for f, d in zip(fused, direct):
            assert [h["index"] for h in f["hits"]] == [
                h["index"] for h in d["hits"]
            ]

    def test_save_load_round_trip(self, ivf_service, data_mesh, tmp_path):
        # save de-permutes the cluster-major storage back to corpus order;
        # a restart must retrieve identically
        path = str(tmp_path / "ivf_index.npz")
        ivf_service.save_index(path)
        svc = RetrievalService(
            ivf_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="ivf",
            index_kwargs={"n_clusters": 8, "nprobe": 8},
        )
        svc.load_index_file(path if path.endswith(".npz") else path + ".npz")
        assert isinstance(svc.index, IVFIPIndex)
        res = svc.query("document 5 on distinct topic 5", k=2)
        assert res["hits"][0]["index"] == 5

    def test_load_reuses_tuned_nprobe(self, ivf_service, data_mesh,
                                      tmp_path, monkeypatch):
        svc = RetrievalService(
            ivf_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="ivf",
            index_kwargs={"nprobe": "auto"}, recall_target=0.9,
        )
        svc.build_index(
            [f"document {i} on distinct topic {i}" for i in range(20)],
            max_passage_length=16, batch_size=8,
        )
        tuned = svc.index.nprobe
        path = str(tmp_path / "tuned_ivf.npz")
        svc.save_index(path)

        svc2 = RetrievalService(
            ivf_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="ivf",
            index_kwargs={"nprobe": "auto"}, recall_target=0.9,
        )
        monkeypatch.setattr(
            IVFIPIndex, "_tune_nprobe",
            lambda *a, **k: pytest.fail("restart re-ran the nprobe ladder"),
        )
        svc2.load_index_file(path)
        assert svc2.index.nprobe == tuned
        assert svc2.index.n_clusters == svc.index.n_clusters

    def test_load_rejects_kind_mismatch(self, ivf_service, data_mesh,
                                        tmp_path):
        # a structural file restores the SAVED class; silently serving it
        # under a different configured index_type would make the next /add
        # rebuild as that other class
        path = str(tmp_path / "saved_ivf.npz")
        ivf_service.save_index(path)
        svc = RetrievalService(
            ivf_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="flat",
        )
        with pytest.raises(ValueError, match="--index_type ivf"):
            svc.load_index_file(path)

    def test_legacy_embedding_file_still_loads(self, ivf_service, data_mesh,
                                               tmp_path):
        # pre-structural files (raw embeddings + tuned knobs) keep working:
        # the load rebuilds with the saved knobs
        emb = np.eye(12, 64, dtype=np.float32)
        path = str(tmp_path / "legacy.npz")
        np.savez_compressed(
            path, embeddings=emb,
            corpus_texts=np.asarray([f"p{i}" for i in range(12)], object),
            ivf_nprobe=np.int64(8), ivf_n_clusters=np.int64(8),
        )
        svc = RetrievalService(
            ivf_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="ivf",
            index_kwargs={"n_clusters": "auto", "nprobe": "auto"},
        )
        svc.load_index_file(path)
        assert isinstance(svc.index, IVFIPIndex)
        assert svc.index.n_clusters == 8
        assert svc.corpus_texts[3] == "p3"

    def test_add_passages_rebuilds_ivf(self, ivf_service, data_mesh):
        svc = RetrievalService(
            ivf_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="ivf",
            index_kwargs={"n_clusters": 8, "nprobe": 8},
        )
        svc.build_index(
            [f"document {i} on distinct topic {i}" for i in range(16)],
            max_passage_length=16, batch_size=8,
        )
        svc.add_passages(["zebra quark lantern umbrella volcano"],
                         max_passage_length=16, batch_size=8)
        assert svc.ntotal == 17
        res = svc.query("zebra quark lantern umbrella volcano", k=1)
        assert res["hits"][0]["index"] == 16

    def test_add_passages_keeps_tuned_nprobe(self, ivf_service, data_mesh,
                                             monkeypatch):
        svc = RetrievalService(
            ivf_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="ivf",
            index_kwargs={"nprobe": "auto"}, recall_target=0.9,
        )
        svc.build_index(
            [f"document {i} on distinct topic {i}" for i in range(20)],
            max_passage_length=16, batch_size=8,
        )
        tuned = svc.index.nprobe
        monkeypatch.setattr(
            IVFIPIndex, "_tune_nprobe",
            lambda *a, **k: pytest.fail("/add re-ran the nprobe ladder"),
        )
        svc.add_passages(["zebra quark lantern volcano extra"],
                         max_passage_length=16, batch_size=8)
        assert svc.ntotal == 21
        assert svc.index.nprobe == tuned

    def test_fresh_build_after_add_retunes(self, ivf_service, data_mesh,
                                           monkeypatch):
        # the /add tuned-nprobe reuse must be per-rebuild, not sticky: a
        # later build_index on a fresh corpus re-runs the recall ladder
        calls = []
        orig = IVFIPIndex._tune_nprobe
        monkeypatch.setattr(
            IVFIPIndex, "_tune_nprobe",
            lambda self, *a, **k: calls.append(1) or orig(self, *a, **k),
        )
        svc = RetrievalService(
            ivf_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="ivf",
            index_kwargs={"nprobe": "auto"}, recall_target=0.9,
        )
        svc.build_index(
            [f"document {i} on distinct topic {i}" for i in range(20)],
            max_passage_length=16, batch_size=8,
        )
        assert len(calls) == 1
        svc.add_passages(["zebra quark lantern volcano extra"],
                         max_passage_length=16, batch_size=8)
        assert len(calls) == 1  # /add reused the tuned nprobe
        svc.build_index(
            [f"fresh corpus item {i} about theme {i}" for i in range(24)],
            max_passage_length=16, batch_size=8,
        )
        assert len(calls) == 2  # fresh build re-tuned
        assert svc.index_kwargs.get("nprobe") == "auto"  # config not mutated

    def test_pq_ivf_serves(self, data_mesh, ivf_service, tmp_path):
        # IVF+PQ serving: uint8 residual codes behind the same surface.
        # Scores are ADC approximations, so assertions are rank-tolerant
        svc = RetrievalService(
            ivf_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="ivf",
            index_kwargs={"n_clusters": 8, "nprobe": 8, "pq_m": 16,
                          "pq_iters": 5},
        )
        svc.build_index(
            [f"document {i} on distinct topic {i}" for i in range(16)],
            max_passage_length=16, batch_size=8,
        )
        assert svc.index.pq_m == 16
        assert np.asarray(svc.index.corpus).dtype == np.uint8
        res = svc.query("document 9 on distinct topic 9", k=3)
        assert 9 in [h["index"] for h in res["hits"]]
        assert res["hits"][0]["score"] == pytest.approx(1.0, abs=0.15)
        # structural persistence round-trips the codes + codebooks
        path = str(tmp_path / "pq_index.npz")
        svc.save_index(path)
        svc2 = RetrievalService(
            ivf_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="ivf",
            index_kwargs={"n_clusters": 8, "nprobe": 8, "pq_m": 16},
        )
        svc2.load_index_file(path)
        assert svc2.index.pq_m == 16
        r1 = svc.query("document 5 on distinct topic 5", k=4,
                       return_passages=False)
        r2 = svc2.query("document 5 on distinct topic 5", k=4,
                        return_passages=False)
        assert [h["index"] for h in r1["hits"]] == [
            h["index"] for h in r2["hits"]
        ]
        # /add rebuild keeps the PQ codec
        svc.add_passages(["zebra quark lantern umbrella volcano"],
                         max_passage_length=16, batch_size=8)
        assert svc.ntotal == 17
        assert svc.index.pq_m == 16
        res = svc.query("zebra quark lantern umbrella volcano", k=3)
        assert 16 in [h["index"] for h in res["hits"]]

    def test_rotated_pq_stored_embeddings_unrotate(self, data_mesh,
                                                   ivf_service):
        """Regression (round-3 review): _stored_embeddings must UN-rotate
        rotated-codec reconstructions (codes store z = residual @ rot). The
        bug fed /add and /remove rebuilds essentially random vectors —
        decode error 1.67 vs 0.19 on unit rows — and recall collapsed
        silently after any mutation of an OPQ/RR index."""
        corpus = [f"document {i} on distinct topic {i}" for i in range(16)]
        svc_plain = RetrievalService(
            ivf_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="ivf",
            index_kwargs={"n_clusters": 4, "nprobe": 4, "pq_m": 16,
                          "pq_iters": 5},
        )
        svc_plain.build_index(corpus, max_passage_length=16, batch_size=8)
        svc_rot = RetrievalService(
            ivf_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="ivf",
            index_kwargs={"n_clusters": 4, "nprobe": 4, "pq_m": 16,
                          "pq_iters": 5, "pq_rotate": "random"},
        )
        svc_rot.build_index(corpus, max_passage_length=16, batch_size=8)
        true_emb = ivf_service.encoder.encode(
            corpus, batch_size=8, max_length=16
        )
        err_plain = np.linalg.norm(
            svc_plain._stored_embeddings(svc_plain.index) - true_emb, axis=1
        ).mean()
        err_rot = np.linalg.norm(
            svc_rot._stored_embeddings(svc_rot.index) - true_emb, axis=1
        ).mean()
        # rotated decode must be as accurate as the unrotated codec (both
        # carry only PQ quantization error), not ~unit-norm garbage
        assert err_rot < max(2.0 * err_plain, 0.35), (err_rot, err_plain)
        # and a mutation keeps the index searchable: remove then self-query
        svc_rot.remove_passages([0])
        res = svc_rot.query("document 9 on distinct topic 9", k=3)
        assert 8 in [h["index"] for h in res["hits"]]  # 9 shifted down by 1

    def test_pq_codec_survives_restart_then_add(self, data_mesh,
                                                ivf_service, tmp_path):
        # a restarted service knows pq_m only from the persisted index (the
        # operator may omit --ivf_pq_m since the structural load ignores
        # build knobs); /add must still rebuild WITH the codec, not as a
        # plain bf16 IVF (32x the memory at the scale PQ targets)
        svc = RetrievalService(
            ivf_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="ivf",
            index_kwargs={"n_clusters": 8, "nprobe": 8, "pq_m": 16,
                          "pq_iters": 5},
        )
        svc.build_index(
            [f"document {i} on distinct topic {i}" for i in range(16)],
            max_passage_length=16, batch_size=8,
        )
        path = str(tmp_path / "pq_restart.npz")
        svc.save_index(path)
        svc2 = RetrievalService(
            ivf_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="ivf",
            index_kwargs={"n_clusters": 8, "nprobe": 8},  # no pq_m
        )
        svc2.load_index_file(path)
        assert svc2.index.pq_m == 16
        svc2.add_passages(["zebra quark lantern umbrella volcano"],
                          max_passage_length=16, batch_size=8)
        assert svc2.index.pq_m == 16
        assert np.asarray(svc2.index.corpus).dtype == np.uint8
        res = svc2.query("zebra quark lantern umbrella volcano", k=3)
        assert 16 in [h["index"] for h in res["hits"]]

    def test_int8_ivf_serves(self, data_mesh, ivf_service):
        # int8 storage is a first-class IVF option (4x memory vs fp32);
        # save_index must de-permute AND dequantize
        svc = RetrievalService(
            ivf_service.encoder, mesh=data_mesh, max_query_length=16,
            query_batch_size=8, index_type="ivf", index_dtype=jnp.int8,
            index_kwargs={"n_clusters": 8, "nprobe": 8},
        )
        svc.build_index(
            [f"document {i} on distinct topic {i}" for i in range(16)],
            max_passage_length=16, batch_size=8,
        )
        assert svc.index.quantized
        res = svc.query("document 9 on distinct topic 9", k=2)
        assert res["hits"][0]["index"] == 9
        svc.add_passages(["zebra quark lantern umbrella volcano"],
                         max_passage_length=16, batch_size=8)
        res = svc.query("zebra quark lantern umbrella volcano", k=1)
        assert res["hits"][0]["index"] == 16
        assert res["hits"][0]["score"] == pytest.approx(1.0, abs=5e-2)


class TestAdoptIndex:
    """adopt_index: serve an EXTERNALLY built index (the 10M
    from_chunk_fn tier whose fp32 matrix never exists — load_index's
    host-numpy signature cannot carry it)."""

    def test_adopt_chunked_index_serves_and_mutates(self, data_mesh):
        cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(0), cfg)
        tok = HashTokenizer(vocab_size=256)
        encoder = InferenceEncoder(cfg, params, tok, mesh=data_mesh,
                                   compute_dtype=jnp.float32,
                                   length_multiple=8)
        svc = RetrievalService(
            encoder, mesh=None, max_query_length=16, query_batch_size=8,
            index_type="ivf", index_kwargs={"n_clusters": 8, "nprobe": 8},
        )
        d = cfg.hidden_size
        rng = np.random.default_rng(0)
        emb = rng.standard_normal((64, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        index = IVFIPIndex.from_chunk_fn(
            lambda lo, hi: emb[lo:hi], 64, d, chunk_rows=32,
            n_clusters=8, nprobe=8, store_dtype=jnp.int8, kmeans_iters=3,
        )
        texts = [f"adopted passage {i}" for i in range(64)]
        svc.adopt_index(index, texts)
        assert svc.index is index
        res = svc.query("some query text", k=3)
        assert len(res["hits"]) == 3
        assert res["hits"][0]["passage"].startswith("adopted passage")
        # device mutation on the adopted index
        svc.add_passages(["brand new adopted doc"], max_passage_length=16)
        assert svc.index.ntotal == 65
        assert svc.corpus_texts[-1] == "brand new adopted doc"
        removed = svc.remove_passages([0])
        assert removed == 1
        assert svc.index.ntotal == 64

    def test_adopt_rejects_mismatches(self, data_mesh):
        cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(1), cfg)
        tok = HashTokenizer(vocab_size=256)
        encoder = InferenceEncoder(cfg, params, tok, mesh=data_mesh,
                                   compute_dtype=jnp.float32,
                                   length_multiple=8)
        svc = RetrievalService(encoder, mesh=None, max_query_length=16)
        rng = np.random.default_rng(0)
        emb = rng.standard_normal((16, cfg.hidden_size + 8)).astype(np.float32)
        from rankpo_tpu.index import FlatIPIndex

        wrong_dim = FlatIPIndex(emb)
        with pytest.raises(ValueError, match="dim"):
            svc.adopt_index(wrong_dim, ["t"] * 16)
        ok = FlatIPIndex(
            rng.standard_normal((16, cfg.hidden_size)).astype(np.float32)
        )
        with pytest.raises(ValueError, match="corpus texts"):
            svc.adopt_index(ok, ["t"] * 5)


def test_balanced_ivf_serves_fused(data_mesh):
    """The balanced build adds assign_bias to search_arrays — the fused
    serving path must compose the extended protocol."""
    cfg = tiny_llama_config(vocab_size=256)
    params = init_params(jax.random.key(2), cfg)
    tok = HashTokenizer(vocab_size=256)
    encoder = InferenceEncoder(cfg, params, tok, mesh=data_mesh,
                               compute_dtype=jnp.float32, length_multiple=8)
    svc = RetrievalService(
        encoder, mesh=data_mesh, max_query_length=16, query_batch_size=8,
        index_type="ivf",
        index_kwargs={"n_clusters": 8, "nprobe": 8, "balance_eta": 0.05,
                      "capacity_slack": 1.05},
    )
    corpus = [f"document {i} about topic {i % 4}" for i in range(48)]
    svc.build_index(corpus, max_passage_length=16, batch_size=8)
    assert svc.index.assign_bias is not None
    res = svc.query(corpus[7], k=5)
    assert len(res["hits"]) == 5
    # full probe: self-retrieval must find the row
    assert any(h["index"] == 7 for h in res["hits"])
