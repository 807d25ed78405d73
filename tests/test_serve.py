"""Serving tests: RetrievalService library API and the HTTP endpoint."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankpo_tpu.data import HashTokenizer
from rankpo_tpu.index import InferenceEncoder
from rankpo_tpu.models import init_params, tiny_llama_config
from rankpo_tpu.serve import RetrievalService


@pytest.fixture(scope="module")
def service(data_mesh):
    cfg = tiny_llama_config(vocab_size=256)
    params = init_params(jax.random.key(0), cfg)
    tok = HashTokenizer(vocab_size=256)
    encoder = InferenceEncoder(cfg, params, tok, mesh=data_mesh,
                               compute_dtype=jnp.float32, length_multiple=8)
    svc = RetrievalService(encoder, mesh=data_mesh, max_query_length=16,
                           query_batch_size=8)
    corpus = [f"document {i} on distinct topic {i}" for i in range(32)]
    svc.build_index(corpus, max_passage_length=16, batch_size=8)
    return svc


class TestRetrievalService:
    def test_query_single(self, service):
        res = service.query("document 7 on distinct topic 7", k=3)
        assert res["hits"][0]["index"] == 7
        assert res["hits"][0]["score"] == pytest.approx(1.0, abs=1e-4)
        assert res["hits"][0]["passage"].startswith("document 7")

    def test_query_batch(self, service):
        res = service.query(
            ["document 3 on distinct topic 3", "document 19 on distinct topic 19"],
            k=2,
        )
        assert [r["hits"][0]["index"] for r in res] == [3, 19]

    def test_query_without_index_raises(self, data_mesh):
        cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(0), cfg)
        enc = InferenceEncoder(cfg, params, HashTokenizer(256), mesh=data_mesh,
                               compute_dtype=jnp.float32)
        svc = RetrievalService(enc, mesh=data_mesh)
        with pytest.raises(RuntimeError):
            svc.query("x")

    def test_load_prebuilt_index(self, service, data_mesh):
        emb = np.eye(8, 64, dtype=np.float32)
        svc = RetrievalService(service.encoder, mesh=data_mesh,
                               max_query_length=16)
        svc.load_index(emb, [f"p{i}" for i in range(8)])
        assert svc.ntotal == 8


class TestFusedEncodeSearch:
    """Serving fuses tokens->embed->search into ONE compiled dispatch; the
    results must be bit-identical to the two-dispatch path (same tokenizer
    prep, same search callable — only the program boundary moves)."""

    QUERIES = ["document 3 on distinct topic 3",
               "document 19 on distinct topic 19",
               "document 7 on distinct topic 7"]

    def _both(self, service, k):
        assert service.fuse_encode_search
        fused = service.query(self.QUERIES, k=k, return_passages=False)
        service.fuse_encode_search = False
        try:
            direct = service.query(self.QUERIES, k=k, return_passages=False)
        finally:
            service.fuse_encode_search = True
        return fused, direct

    def test_bit_identical_to_two_dispatch(self, service):
        fused, direct = self._both(service, k=5)
        for f, d in zip(fused, direct):
            assert [h["index"] for h in f["hits"]] == [
                h["index"] for h in d["hits"]
            ]
            for hf, hd in zip(f["hits"], d["hits"]):
                assert hf["score"] == hd["score"]

    def test_single_string_and_k_above_ntotal(self, service):
        res = service.query("document 7 on distinct topic 7", k=1000)
        assert len(res["hits"]) == service.ntotal
        assert res["hits"][0]["index"] == 7

    def test_group_larger_than_query_batch_size_chunks_fused(self, service):
        # groups beyond query_batch_size (8 in the fixture) must still ride
        # the fused path (chunked) — the two-dispatch fallback is never
        # precompiled by warmup, so falling into it cold would pay a live
        # XLA compile (review finding, round 3)
        corpus = [f"document {j} on distinct topic {j}" for j in range(32)]
        tok = service.encoder.tokenizer

        def ids(t):
            return tuple(tok(t, max_length=16)["input_ids"])

        texts = [corpus[i] for i in range(20)]
        res = service.query(texts, k=2, return_passages=False)
        assert len(res) == 20
        for i, r in enumerate(res):
            # HashTokenizer@vocab256 collides some numerals (e.g. "13"=="10")
            # giving identical embeddings; FAISS tie semantics then pick the
            # LOWEST colliding corpus index — expect that, not i itself
            expect = min(j for j in range(32) if ids(corpus[j]) == ids(texts[i]))
            assert r["hits"][0]["index"] == expect, (i, r["hits"][0])

    def test_empty_query_list_returns_empty(self, service):
        # review finding, round 3: the chunked loop never ran for [] and
        # np.concatenate([]) raised where the old code returned []
        assert service.query([], k=2, return_passages=True) == []

    def test_stale_snapshot_decorates_with_its_own_texts(self, service,
                                                         data_mesh):
        # review finding, round 3: query() read self.corpus_texts LIVE, so a
        # rebuild racing an in-flight fused query decorated old-index hit ids
        # with the new corpus's texts (IndexError for a smaller corpus).
        # Simulate the race: pin the fused snapshot from before a rebuild.
        from rankpo_tpu.serve.service import RetrievalService

        svc = RetrievalService(service.encoder, mesh=data_mesh,
                               max_query_length=16, query_batch_size=8)
        big = [f"document {i} on distinct topic {i}" for i in range(32)]
        svc.build_index(big, max_passage_length=16, batch_size=8)
        stale = svc._get_fused(2)  # (fn, index, texts) of the 32-doc state
        svc.build_index(big[:8], max_passage_length=16, batch_size=8)
        svc._get_fused = lambda k: stale  # in-flight query sees old snapshot
        res = svc.query("document 21 on distinct topic 21", k=2)
        # hit ids come from the 32-doc index; passages MUST come from the
        # matching 32-doc text list (live corpus_texts has only 8 entries)
        # (doc 21 avoids the HashTokenizer@256 numeral collisions, e.g.
        # "20"=="10")
        assert res["hits"][0]["index"] == 21
        assert res["hits"][0]["passage"] == big[21]

    def test_fused_k_clamps_to_searched_snapshot(self, service, data_mesh):
        # review finding, round 3: query() derived k_eff from ITS state
        # snapshot while _query_fused re-snapshots via _get_fused — a rebuild
        # shrinking the corpus between the two reads reached top_k with
        # k > rows (ValueError) or returned -inf padding rows whose ids index
        # past the snapshot's text list. _get_fused now clamps k against the
        # snapshot it actually returns. Simulate the race: call _query_fused
        # with a k computed against the pre-rebuild (32-doc) state.
        from rankpo_tpu.serve.service import RetrievalService

        svc = RetrievalService(service.encoder, mesh=data_mesh,
                               max_query_length=16, query_batch_size=8)
        big = [f"document {i} on distinct topic {i}" for i in range(32)]
        svc.build_index(big, max_passage_length=16, batch_size=8)
        svc.build_index(big[:5], max_passage_length=16, batch_size=8)
        scores, idx, texts, _ = svc._query_fused(
            ["document 1 on distinct topic 1"], 20
        )
        assert scores.shape == (1, 5) and idx.shape == (1, 5)
        assert len(texts) == 5
        assert int(idx.max()) < 5 and np.isfinite(scores).all()

    def test_empty_query_list_nonfused(self, service):
        # review finding, round 3 second pass: the empty-group guard lived
        # only in _query_fused; the two-dispatch fallback still crashed on []
        # (np.concatenate of zero chunks). FlatIPIndex.search now guards it.
        service.fuse_encode_search = False
        try:
            assert service.query([], k=2, return_passages=True) == []
        finally:
            service.fuse_encode_search = True

    def test_index_rebuild_invalidates_fused_cache(self, service, data_mesh):
        from rankpo_tpu.serve.service import RetrievalService

        svc = RetrievalService(service.encoder, mesh=data_mesh,
                               max_query_length=16, query_batch_size=8)
        svc.build_index([f"document {i} on distinct topic {i}"
                         for i in range(16)], max_passage_length=16,
                        batch_size=8)
        first = svc.query("document 5 on distinct topic 5", k=3,
                          return_passages=False)
        assert first["hits"][0]["index"] == 5
        # rebuild with a different corpus size: fused programs baked the old
        # n_total/k_local and must be rebuilt, not reused
        svc.build_index([f"document {i} on distinct topic {i}"
                         for i in range(24)], max_passage_length=16,
                        batch_size=8)
        res = svc.query("document 21 on distinct topic 21", k=3,
                        return_passages=False)
        assert res["hits"][0]["index"] == 21


class TestHTTPServer:
    def test_search_endpoint(self, service):
        from http.server import ThreadingHTTPServer
        from rankpo_tpu.cli.serve import make_handler

        server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
                health = json.loads(r.read())
            assert health["status"] == "ok" and health["ntotal"] == 32

            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/search",
                data=json.dumps(
                    {"queries": ["document 5 on distinct topic 5"], "k": 2}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                body = json.loads(r.read())
            assert body["results"][0]["hits"][0]["index"] == 5

            # 'query': str single-query sugar
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/search",
                data=json.dumps(
                    {"query": "document 7 on distinct topic 7", "k": 1}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                body = json.loads(r.read())
            assert body["results"][0]["hits"][0]["index"] == 7

            # FAISS IDSelector analog over HTTP: allowed_ids restricts the
            # hit set for this request only
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/search",
                data=json.dumps(
                    {"queries": ["document 5 on distinct topic 5"], "k": 3,
                     "allowed_ids": [2, 9]}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                body = json.loads(r.read())
            hits = body["results"][0]["hits"]
            assert hits and all(h["index"] in (2, 9) for h in hits)

            # malformed bodies get a 400 with a usage message, not a 500
            # (urllib.error is loaded by the module-level urllib.request
            # import; importing it here would shadow the module local)
            for bad in ({"k": 3}, {"queries": "oops"}, {"queries": [1, 2]}):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/search",
                    data=json.dumps(bad).encode(),
                    headers={"Content-Type": "application/json"},
                )
                try:
                    urllib.request.urlopen(req)
                    raise AssertionError(f"{bad} should have been rejected")
                except urllib.error.HTTPError as e:
                    assert e.code == 400
                    assert "queries" in json.loads(e.read())["error"]
        finally:
            server.shutdown()


class TestMicroBatcher:
    def test_results_match_direct_query(self, service):
        from rankpo_tpu.serve.batching import MicroBatcher

        mb = MicroBatcher(service, max_batch=8, max_wait_ms=20, k_max=10)
        try:
            direct = service.query("document 3 on distinct topic 3", k=3)
            batched = mb.query("document 3 on distinct topic 3", k=3)
            assert [h["index"] for h in batched["hits"]] == [
                h["index"] for h in direct["hits"]
            ]
            np.testing.assert_allclose(
                [h["score"] for h in batched["hits"]],
                [h["score"] for h in direct["hits"]],
                rtol=1e-6,
            )
            assert batched["hits"][0]["passage"] == direct["hits"][0]["passage"]
        finally:
            mb.close()

    def test_concurrent_requests_share_dispatches(self, service):
        from rankpo_tpu.serve.batching import MicroBatcher

        # long window so all concurrent requests land in one group
        mb = MicroBatcher(service, max_batch=16, max_wait_ms=300, k_max=10)
        try:
            results = [None] * 12
            def call(i):
                results[i] = mb.query(f"document {i} on distinct topic {i}", k=2)
            threads = [threading.Thread(target=call, args=(i,)) for i in range(12)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            for i, res in enumerate(results):
                assert res["hits"][0]["index"] == i, (i, res["hits"][:2])
                assert len(res["hits"]) == 2
            assert mb.n_queries == 12
            assert mb.n_dispatches <= 2  # grouped, not per-request
        finally:
            mb.close()

    def test_k_above_k_max_rejected(self, service):
        from rankpo_tpu.serve.batching import MicroBatcher

        mb = MicroBatcher(service, k_max=5)
        try:
            with pytest.raises(ValueError, match="k_max"):
                mb.query("anything", k=50)
        finally:
            mb.close()

    def test_http_single_query_routes_through_batcher(self, service):
        from http.server import ThreadingHTTPServer
        from rankpo_tpu.cli.serve import make_handler
        from rankpo_tpu.serve.batching import MicroBatcher

        mb = MicroBatcher(service, max_batch=8, max_wait_ms=10, k_max=10)
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(service, mb)
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/search",
                data=json.dumps(
                    {"queries": ["document 5 on distinct topic 5"], "k": 2}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                body = json.loads(r.read())
            assert body["results"][0]["hits"][0]["index"] == 5
            assert mb.n_queries >= 1
        finally:
            server.shutdown()
            mb.close()


class TestReviewRegressions:
    """Round-2 review findings (serving robustness)."""

    def test_mixed_k_concurrent_searches_are_correct(self, service):
        # per-k compiled-search cache: concurrent different-k callers must
        # each get exactly their k columns (single-slot cache raced here)
        errors = []

        def call(k):
            try:
                for _ in range(5):
                    res = service.query("document 4 on distinct topic 4", k=k)
                    assert len(res["hits"]) == k, (k, len(res["hits"]))
            except Exception as e:
                errors.append(e)

        threads = [threading.Thread(target=call, args=(k,)) for k in (3, 7) * 3]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors

    def test_query_after_close_raises(self, service):
        from rankpo_tpu.serve.batching import MicroBatcher

        mb = MicroBatcher(service, k_max=10)
        mb.close()
        with pytest.raises(RuntimeError, match="closed"):
            mb.query("anything", k=2)

    def test_close_concurrent_queries_never_hang(self, service):
        # advisor round-2 low finding: a query() thread that passed the
        # _stopping check and enqueued after close()'s final drain blocked
        # forever. Every racing caller must now either get a result or a
        # RuntimeError, within a bounded time.
        from rankpo_tpu.serve.batching import MicroBatcher

        mb = MicroBatcher(service, max_batch=8, max_wait_ms=1, k_max=10)
        outcomes = []

        def call():
            try:
                outcomes.append(
                    mb.query("document 1 on distinct topic 1", k=2,
                             return_passages=False)
                )
            except RuntimeError as e:
                outcomes.append(e)

        threads = [threading.Thread(target=call) for _ in range(12)]
        for t in threads:
            t.start()
        mb.close()
        for t in threads:
            t.join(timeout=15)
        assert all(not t.is_alive() for t in threads), "caller hung on close"
        assert len(outcomes) == 12

    def test_warmup_lengths_include_capped_bucket(self, service):
        # advisor round-2 low finding: warmup walked only multiples of
        # length_multiple, so a non-multiple (or < multiple) max_query_length
        # bucket was never precompiled
        from rankpo_tpu.serve.service import RetrievalService

        svc = RetrievalService(service.encoder, max_query_length=20)
        assert svc._default_warmup_lengths() == [8, 16, 20]
        svc = RetrievalService(service.encoder, max_query_length=16)
        assert svc._default_warmup_lengths() == [8, 16]
        svc = RetrievalService(service.encoder, max_query_length=5)
        assert svc._default_warmup_lengths() == [5]

    def test_handler_uniform_k_limit(self, service):
        import urllib.error
        from http.server import ThreadingHTTPServer
        from rankpo_tpu.cli.serve import make_handler
        from rankpo_tpu.serve.batching import MicroBatcher

        mb = MicroBatcher(service, max_batch=8, max_wait_ms=5, k_max=5)
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(service, mb, k_max=5)
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            def post(payload):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/search",
                    data=json.dumps(payload).encode(),
                    headers={"Content-Type": "application/json"},
                )
                try:
                    with urllib.request.urlopen(req) as r:
                        return r.status, json.loads(r.read())
                except urllib.error.HTTPError as e:
                    return e.code, json.loads(e.read())

            # over-limit k rejected on BOTH the 1-query and N-query paths
            for queries in (["q one"], ["q one", "q two"]):
                code, body = post({"queries": queries, "k": 50})
                assert code == 400 and "k_max" in body["error"]
            # in-limit multi-query path slices to the requested k
            code, body = post(
                {"queries": ["document 5 on distinct topic 5",
                             "document 6 on distinct topic 6"], "k": 2}
            )
            assert code == 200
            assert all(len(r["hits"]) == 2 for r in body["results"])
            assert body["results"][0]["hits"][0]["index"] == 5
            assert "passage" in body["results"][0]["hits"][0]
        finally:
            server.shutdown()
            mb.close()


def test_statsz_endpoint(service):
    from http.server import ThreadingHTTPServer
    from rankpo_tpu.cli.serve import make_handler
    from rankpo_tpu.serve.batching import MicroBatcher

    mb = MicroBatcher(service, max_batch=8, max_wait_ms=5, k_max=10)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service, mb, k_max=10))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        mb.query("document 2 on distinct topic 2", k=2)
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/statsz") as r:
            stats = json.loads(r.read())
        assert stats["ntotal"] == 32 and stats["k_max"] == 10
        assert stats["microbatch_queries"] >= 1
        assert stats["avg_group_size"] >= 1
    finally:
        server.shutdown()
        mb.close()


class TestAddPassages:
    def test_add_extends_index_preserving_ids(self, data_mesh):
        from rankpo_tpu.index import InferenceEncoder
        from rankpo_tpu.models import init_params, tiny_llama_config

        cfg = tiny_llama_config(vocab_size=256)
        enc = InferenceEncoder(cfg, init_params(jax.random.key(0), cfg),
                               HashTokenizer(vocab_size=256), mesh=data_mesh,
                               compute_dtype=jnp.float32, length_multiple=8)
        svc = RetrievalService(enc, mesh=data_mesh, max_query_length=16,
                               query_batch_size=8)
        corpus = [f"document {i} on distinct topic {i}" for i in range(16)]
        svc.build_index(corpus, max_passage_length=16, batch_size=8)
        before = svc.query("document 7 on distinct topic 7", k=1)

        svc.add_passages(
            [f"document {i} on distinct topic {i}" for i in (90, 91)],
            max_passage_length=16, batch_size=8,
        )
        assert svc.ntotal == 18
        # old ids unchanged
        after = svc.query("document 7 on distinct topic 7", k=1)
        assert after["hits"][0]["index"] == before["hits"][0]["index"] == 7
        # new passages get the next ids and are retrievable
        new = svc.query("document 91 on distinct topic 91", k=1)
        assert new["hits"][0]["index"] == 17
        assert new["hits"][0]["passage"] == "document 91 on distinct topic 91"

    def test_add_int8_storage(self, data_mesh):
        from rankpo_tpu.index import InferenceEncoder
        from rankpo_tpu.models import init_params, tiny_llama_config

        cfg = tiny_llama_config(vocab_size=256)
        enc = InferenceEncoder(cfg, init_params(jax.random.key(0), cfg),
                               HashTokenizer(vocab_size=256), mesh=data_mesh,
                               compute_dtype=jnp.float32, length_multiple=8)
        svc = RetrievalService(enc, mesh=data_mesh, max_query_length=16,
                               query_batch_size=8, index_dtype=jnp.int8)
        corpus = [f"document {i} on distinct topic {i}" for i in range(16)]
        svc.build_index(corpus, max_passage_length=16, batch_size=8)
        svc.add_passages(["document 55 on distinct topic 55"],
                         max_passage_length=16, batch_size=8)
        got = svc.query("document 55 on distinct topic 55", k=1)
        assert got["hits"][0]["index"] == 16

    def test_http_add_endpoint(self, service):
        # NB: module-scoped `service` fixture — restore its index afterwards
        from http.server import ThreadingHTTPServer
        from rankpo_tpu.cli.serve import make_handler

        emb_before = service._stored_embeddings(service.index)
        texts_before = list(service.corpus_texts)
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(service, None, k_max=10)
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/add",
                data=json.dumps(
                    {"passages": ["document 77 on distinct topic 77"]}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                body = json.loads(r.read())
            assert body["ntotal"] == 33
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/search",
                data=json.dumps(
                    {"queries": ["document 77 on distinct topic 77"], "k": 1}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                got = json.loads(r.read())
            assert got["results"][0]["hits"][0]["index"] == 32
        finally:
            server.shutdown()
            service.load_index(emb_before, texts_before)


class TestRemovePassages:
    """FAISS remove_ids analog: drop by corpus position, remaining ids
    shift down (FAISS renumbering), search never returns removed rows."""

    def _service(self, data_mesh, **kw):
        from rankpo_tpu.index import InferenceEncoder
        from rankpo_tpu.models import init_params, tiny_llama_config

        cfg = tiny_llama_config(vocab_size=256)
        enc = InferenceEncoder(cfg, init_params(jax.random.key(0), cfg),
                               HashTokenizer(vocab_size=256), mesh=data_mesh,
                               compute_dtype=jnp.float32, length_multiple=8)
        svc = RetrievalService(enc, mesh=data_mesh, max_query_length=16,
                               query_batch_size=8, **kw)
        corpus = [f"document {i} on distinct topic {i}" for i in range(16)]
        svc.build_index(corpus, max_passage_length=16, batch_size=8)
        return svc

    def test_remove_shifts_ids_and_hides_rows(self, data_mesh):
        svc = self._service(data_mesh)
        # before: exact-text query hits its own row
        assert svc.query("document 7 on distinct topic 7", k=1)["hits"][0][
            "index"] == 7
        removed = svc.remove_passages([3, 5])
        assert removed == 2 and svc.ntotal == 14
        # id 7 shifted down by the 2 removals before it
        hit = svc.query("document 7 on distinct topic 7", k=1)["hits"][0]
        assert hit["index"] == 5
        assert hit["passage"] == "document 7 on distinct topic 7"
        # removed text no longer retrievable as itself
        top = svc.query("document 3 on distinct topic 3", k=svc.ntotal)
        assert all(
            h["passage"] != "document 3 on distinct topic 3"
            for h in top["hits"]
        )
        # duplicates collapse; empty list is a no-op
        assert svc.remove_passages([]) == 0
        assert svc.remove_passages([0, 0]) == 1 and svc.ntotal == 13

    def test_remove_int8_roundtrip_bitexact(self, data_mesh):
        """int8 storage: per-row max-abs scales are unaffected by removing
        OTHER rows, so surviving rows' quantized storage is bit-identical."""
        import numpy as np

        svc = self._service(data_mesh, index_dtype=jnp.int8)
        before = np.asarray(svc.index.corpus)[4:]  # rows surviving below
        svc.remove_passages([0, 1, 2, 3])
        after = np.asarray(svc.index.corpus)[: before.shape[0]]
        np.testing.assert_array_equal(before, after)

    def test_remove_errors(self, data_mesh):
        svc = self._service(data_mesh)
        with pytest.raises(ValueError, match="out of range"):
            svc.remove_passages([16])
        with pytest.raises(ValueError, match="every passage"):
            svc.remove_passages(list(range(16)))

    def test_mutation_preserves_storage_dtype_after_restart(
        self, data_mesh, tmp_path
    ):
        """An int8 index restored from a file into a service whose
        --index_dtype defaults to fp32 must keep int8 storage on the first
        mutation (round-3 review: _rebuild_overrides now carries the live
        index's dtype, like the codec knobs)."""
        import numpy as np

        svc = self._service(data_mesh, index_dtype=jnp.int8)
        path = str(tmp_path / "idx.npz")
        svc.save_index(path)
        svc2 = self._service(data_mesh)  # default fp32 index_dtype
        svc2.load_index_file(path)
        assert svc2.index.quantized  # restored bit-identical int8
        svc2.remove_passages([0])
        assert svc2.index.quantized, (
            "mutation rebuild silently switched storage dtype"
        )
        assert np.asarray(svc2.index.corpus).dtype == np.int8
        svc2.add_passages(["document 16 on distinct topic 16"],
                          max_passage_length=16, batch_size=8)
        assert svc2.index.quantized

    def test_rewarm_after_mutation(self, data_mesh):
        """rewarm_after_mutation replays the last warmup() spec ONLY when a
        mutation drops compiled programs (storage outgrew its buffer).
        Shape-preserving mutations — every remove, adds that fit the pad
        headroom — carry the programs over and must NOT pay a rewarm."""
        svc = self._service(data_mesh, rewarm_after_mutation=True)
        svc.warmup(k=3, lengths=(8,))
        calls = []
        orig = svc.warmup
        svc.warmup = lambda **kw: calls.append(kw) or orig(**kw)
        svc.remove_passages([0])
        assert calls == []  # programs carried over: nothing to rewarm
        assert svc._fused_fns
        # the remove freed ONE pad row; adding two outgrows the buffer:
        # programs drop, the warmup replays
        svc.add_passages(["document 16 on distinct topic 16",
                          "document 18 on distinct topic 18"],
                         max_passage_length=16, batch_size=8)
        assert calls == [{"k": 3, "lengths": (8,)}]
        # programs for the warmed bucket exist again after the mutation
        assert svc._fused_fns
        # ...and the NEXT add lands in the mutation headroom: no rewarm
        svc.add_passages(["document 17 on distinct topic 17"],
                         max_passage_length=16, batch_size=8)
        assert len(calls) == 1

    def test_http_remove_endpoint(self, service):
        from http.server import ThreadingHTTPServer

        from rankpo_tpu.cli.serve import make_handler

        emb_before = service._stored_embeddings(service.index)
        texts_before = list(service.corpus_texts)
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(service, None, k_max=10)
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            n0 = service.ntotal
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/remove",
                data=json.dumps({"ids": [0]}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                body = json.loads(r.read())
            assert body["removed"] == 1 and body["ntotal"] == n0 - 1
            # bad ids surface as JSON 400, not a wedged server
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/remove",
                data=json.dumps({"ids": [10**6]}).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                urllib.request.urlopen(req)
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
        finally:
            server.shutdown()
            # module-scoped fixture: restore the index for later tests
            service.load_index(emb_before, texts_before)


class TestDeviceResidentMutation:
    """/add //remove must run on device: the O(N*D) fp32 host fetch
    (``_stored_embeddings``) is only the fallback for index types without
    mutation methods — on the built-in tiers a device-resident
    multi-million-passage corpus must never round-trip through host RAM."""

    def _svc(self, data_mesh, **kw):
        cfg = tiny_llama_config(vocab_size=256)
        enc = InferenceEncoder(cfg, init_params(jax.random.key(0), cfg),
                               HashTokenizer(vocab_size=256), mesh=data_mesh,
                               compute_dtype=jnp.float32, length_multiple=8)
        svc = RetrievalService(enc, mesh=data_mesh, max_query_length=16,
                               query_batch_size=8, **kw)
        corpus = [f"document {i} on distinct topic {i}" for i in range(16)]
        svc.build_index(corpus, max_passage_length=16, batch_size=8)
        return svc

    @pytest.mark.parametrize("kw", [
        {},
        {"index_dtype": jnp.int8},
        {"index_type": "refine",
         "index_kwargs": {"reduced_dim": 8, "candidates": 16}},
        {"index_type": "ivf",
         "index_kwargs": {"n_clusters": 4, "nprobe": 4}},
    ])
    def test_mutations_never_touch_host_matrix(self, data_mesh, kw,
                                               monkeypatch):
        svc = self._svc(data_mesh, **kw)

        def boom(index):
            raise AssertionError(
                "mutation fell back to the O(N*D) host fetch"
            )

        monkeypatch.setattr(svc, "_stored_embeddings", boom)
        svc.add_passages(["document 77 on distinct topic 77"],
                         max_passage_length=16, batch_size=8)
        assert svc.ntotal == 17
        got = svc.query("document 77 on distinct topic 77", k=1)
        assert got["hits"][0]["index"] == 16
        assert svc.remove_passages([0, 16]) == 2
        assert svc.ntotal == 15
        # survivors renumbered: old position 7 now answers at 6
        got = svc.query("document 7 on distinct topic 7", k=1)
        assert got["hits"][0]["index"] == 6
        assert got["hits"][0]["passage"].startswith("document 7 ")

    def test_clamped_k_rewarms_when_append_crosses_ntotal(self, data_mesh):
        """A program compiled at an ntotal-CLAMPED k_eff stops covering the
        same client k once an append raises ntotal past the clamp — even a
        shape-preserving add must then report not-all-rebound so
        rewarm_after_mutation pre-pays the new k_eff's compile."""
        svc = self._svc(data_mesh, rewarm_after_mutation=True)
        svc.warmup(k=20, lengths=(8,))  # ntotal 16: compiles k_eff=16
        calls = []
        orig = svc.warmup
        svc.warmup = lambda **kw: calls.append(kw) or orig(**kw)
        # growth add: programs drop, rewarm #1 compiles k_eff=17
        svc.add_passages(["document 50 on distinct topic 50"],
                         max_passage_length=16, batch_size=8)
        assert len(calls) == 1
        assert any(k == 17 for k in svc._fused_fns)
        # shape-preserving add, but ntotal crosses the 17 clamp: rewarm #2
        # must fire to compile k_eff=19 (the k=20 warmup re-clamps itself)
        svc.add_passages(["document 51 on distinct topic 51",
                          "document 52 on distinct topic 52"],
                         max_passage_length=16, batch_size=8)
        assert len(calls) == 2
        assert any(k == 19 for k in svc._fused_fns)
        got = svc.query("document 52 on distinct topic 52", k=20)
        assert got["hits"][0]["index"] == 18

    def test_shape_preserving_mutations_keep_fused_programs(self, data_mesh):
        """An /add that fits the mutation headroom (and every /remove)
        must CARRY the compiled fused serving programs over — queries
        after the mutation reuse the same jitted fn objects (through a
        remote-compile setup, a dropped program is minutes of latency)."""
        svc = self._svc(data_mesh)
        svc.query("document 3 on distinct topic 3", k=2)  # warm one bucket
        # first add outgrows the zero-headroom initial buffer: programs
        # drop, the rebuilt buffer pre-pays mutation_headroom pad rows
        svc.add_passages(["document 40 on distinct topic 40"],
                         max_passage_length=16, batch_size=8)
        svc.query("document 40 on distinct topic 40", k=2)  # recompile once
        fns_before = {k: v[0] for k, v in svc._fused_fns.items()}
        assert fns_before  # the bucket is compiled
        svc.add_passages(["document 41 on distinct topic 41"],
                         max_passage_length=16, batch_size=8)
        for k_eff, fn in fns_before.items():
            assert svc._fused_fns[k_eff][0] is fn  # rebound, not rebuilt
        got = svc.query("document 41 on distinct topic 41", k=2)
        assert got["hits"][0]["index"] == 17
        svc.remove_passages([0])
        for k_eff, fn in fns_before.items():
            assert svc._fused_fns[k_eff][0] is fn
        got = svc.query("document 41 on distinct topic 41", k=2)
        assert got["hits"][0]["index"] == 16


class TestSaveEndpoint:
    """POST /save (live FAISS write_index analog) + --autosave: mutations
    must be able to survive a restart — the persisted file reloads into a
    service with the mutated corpus, bit-identical storage."""

    def _svc(self, data_mesh):
        cfg = tiny_llama_config(vocab_size=256)
        enc = InferenceEncoder(cfg, init_params(jax.random.key(0), cfg),
                               HashTokenizer(vocab_size=256), mesh=data_mesh,
                               compute_dtype=jnp.float32, length_multiple=8)
        svc = RetrievalService(enc, mesh=data_mesh, max_query_length=16,
                               query_batch_size=8)
        corpus = [f"document {i} on distinct topic {i}" for i in range(16)]
        svc.build_index(corpus, max_passage_length=16, batch_size=8)
        return svc

    def _post(self, port, path, payload=None):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload or {}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    def test_save_and_autosave(self, data_mesh, tmp_path):
        from http.server import ThreadingHTTPServer
        from rankpo_tpu.cli.serve import make_handler

        svc = self._svc(data_mesh)
        index_file = str(tmp_path / "live_index.npz")
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0),
            make_handler(svc, None, k_max=10, index_file=index_file,
                         autosave=True),
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            # autosave: the /add response only returns after the save landed
            body = self._post(port, "/add", {
                "passages": ["document 70 on distinct topic 70"]})
            assert body["ntotal"] == 17 and body["saved"] == index_file
            import os
            assert os.path.exists(index_file)
            # a restart from the file sees the mutated corpus
            svc2 = RetrievalService(svc.encoder, mesh=data_mesh,
                                    max_query_length=16, query_batch_size=8)
            svc2.load_index_file(index_file)
            assert svc2.ntotal == 17
            got = svc2.query("document 70 on distinct topic 70", k=1)
            assert got["hits"][0]["index"] == 16
            # autosave also covers /remove
            body = self._post(port, "/remove", {"ids": [0]})
            assert body["removed"] == 1 and body["saved"] == index_file
            svc2.load_index_file(index_file)
            assert svc2.ntotal == 16
            # explicit /save to another path
            alt = str(tmp_path / "alt.npz")
            body = self._post(port, "/save", {"path": alt})
            assert body["saved"] == alt and os.path.exists(alt)
            # bare /save defaults to the server's index_file
            body = self._post(port, "/save")
            assert body["saved"] == index_file
        finally:
            server.shutdown()

    def test_autosave_failure_reports_committed_mutation(self, data_mesh,
                                                         tmp_path,
                                                         monkeypatch):
        """If the autosave fails AFTER the mutation committed, the reply
        must be a 500 carrying mutated=true — not a 400 that invites the
        client to retry (and duplicate) the mutation."""
        from http.server import ThreadingHTTPServer
        from rankpo_tpu.cli.serve import make_handler

        svc = self._svc(data_mesh)

        def boom(path):
            raise OSError("disk full")

        monkeypatch.setattr(svc, "save_index", boom)
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0),
            make_handler(svc, None, k_max=10,
                         index_file=str(tmp_path / "x.npz"), autosave=True),
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            try:
                self._post(port, "/add", {"passages": ["doc 71 topic 71"]})
                assert False, "expected HTTP 500"
            except urllib.error.HTTPError as e:
                assert e.code == 500
                body = json.loads(e.read())
                assert body["mutated"] is True
                assert "disk full" in body["error"]
            assert svc.ntotal == 17  # the mutation DID commit
        finally:
            server.shutdown()

    def test_save_without_target_is_400(self, data_mesh):
        from http.server import ThreadingHTTPServer
        from rankpo_tpu.cli.serve import make_handler

        svc = self._svc(data_mesh)
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(svc, None, k_max=10)
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            try:
                self._post(port, "/save")
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
        finally:
            server.shutdown()


class TestStableIds:
    """FAISS IndexIDMap analog (--stable_ids): external int64 ids survive
    removals (no renumbering), /add accepts explicit ids or auto-continues,
    hits carry an 'id' field, persistence round-trips the map."""

    def _service(self, data_mesh, n=16, ids=None, **kw):
        cfg = tiny_llama_config(vocab_size=256)
        enc = InferenceEncoder(cfg, init_params(jax.random.key(0), cfg),
                               HashTokenizer(vocab_size=256), mesh=data_mesh,
                               compute_dtype=jnp.float32, length_multiple=8)
        svc = RetrievalService(enc, mesh=data_mesh, max_query_length=16,
                               query_batch_size=8, stable_ids=True, **kw)
        corpus = [f"document {i} on distinct topic {i}" for i in range(n)]
        svc.build_index(corpus, max_passage_length=16, batch_size=8, ids=ids)
        return svc

    def test_ids_survive_removal(self, data_mesh):
        # custom non-contiguous ids at build time
        ids = [100 + 3 * i for i in range(16)]
        svc = self._service(data_mesh, ids=ids)
        hit = svc.query("document 7 on distinct topic 7", k=1)["hits"][0]
        assert hit["index"] == 7 and hit["id"] == 121
        # remove by EXTERNAL id; unknown ids ignored (FAISS remove_ids
        # returns the count actually removed)
        assert svc.remove_passages([103, 106, 99999]) == 2
        assert svc.ntotal == 14
        # survivor keeps its external id even though its position shifted
        hit = svc.query("document 7 on distinct topic 7", k=1)["hits"][0]
        assert hit["index"] == 5 and hit["id"] == 121
        assert hit["passage"] == "document 7 on distinct topic 7"
        # removed id no longer present
        assert 103 not in svc.passage_ids
        # removing the same ids again is a no-op, not an error
        assert svc.remove_passages([103, 106]) == 0

    def test_add_with_and_without_ids(self, data_mesh):
        svc = self._service(data_mesh, n=8)
        svc.add_passages(["document 8 on distinct topic 8"], ids=[500],
                         max_passage_length=16, batch_size=8)
        hit = svc.query("document 8 on distinct topic 8", k=1)["hits"][0]
        assert hit["id"] == 500 and hit["index"] == 8
        # auto ids continue from max(live)+1
        svc.add_passages(["document 9 on distinct topic 9"],
                         max_passage_length=16, batch_size=8)
        hit = svc.query("document 9 on distinct topic 9", k=1)["hits"][0]
        assert hit["id"] == 501

    def test_id_validation(self, data_mesh):
        with pytest.raises(ValueError, match="unique"):
            self._service(data_mesh, n=4, ids=[1, 2, 2, 3])
        with pytest.raises(ValueError, match="match the corpus"):
            self._service(data_mesh, n=4, ids=[1, 2, 3])
        svc = self._service(data_mesh, n=4, ids=[10, 11, 12, 13])
        with pytest.raises(ValueError, match="already present"):
            svc.add_passages(["dup doc"], ids=[12],
                             max_passage_length=16, batch_size=8)

    def test_stable_file_rejected_in_positional_mode(self, data_mesh,
                                                     tmp_path):
        """A file saved under stable_ids (non-arange map) must not load
        into a positional-mode service — same hazard class as the
        index-kind mismatch (the next /add would extend a map positional
        mode says cannot exist). Positional saves (arange) load fine."""
        ids = [100 + i for i in range(16)]
        svc = self._service(data_mesh, ids=ids)
        path = str(tmp_path / "stable.npz")
        svc.save_index(path)
        cfg = tiny_llama_config(vocab_size=256)
        enc = InferenceEncoder(cfg, init_params(jax.random.key(0), cfg),
                               HashTokenizer(vocab_size=256), mesh=data_mesh,
                               compute_dtype=jnp.float32, length_multiple=8)
        positional = RetrievalService(enc, mesh=data_mesh,
                                      max_query_length=16,
                                      query_batch_size=8)
        with pytest.raises(ValueError, match="--stable_ids"):
            positional.load_index_file(path)
        # an arange map (positional save) loads into either mode
        svc_pos = self._service(data_mesh, ids=list(range(16)))
        path2 = str(tmp_path / "arange.npz")
        svc_pos.save_index(path2)
        positional.load_index_file(path2)
        assert positional.ntotal == 16

    def test_persistence_roundtrip(self, data_mesh, tmp_path):
        ids = [7 * i + 2 for i in range(16)]
        svc = self._service(data_mesh, ids=ids)
        svc.remove_passages([2])  # external id of position 0
        path = str(tmp_path / "idx.npz")
        svc.save_index(path)
        svc2 = self._service(data_mesh, n=2)  # fresh service, throwaway index
        svc2.load_index_file(path)
        np.testing.assert_array_equal(
            svc2.passage_ids, np.asarray(ids[1:], np.int64)
        )
        hit = svc2.query("document 7 on distinct topic 7", k=1)["hits"][0]
        assert hit["id"] == 7 * 7 + 2

    def test_positional_mode_unchanged(self, data_mesh):
        """Without stable_ids, hits carry no 'id' and remove renumbers."""
        cfg = tiny_llama_config(vocab_size=256)
        enc = InferenceEncoder(cfg, init_params(jax.random.key(0), cfg),
                               HashTokenizer(vocab_size=256), mesh=data_mesh,
                               compute_dtype=jnp.float32, length_multiple=8)
        svc = RetrievalService(enc, mesh=data_mesh, max_query_length=16,
                               query_batch_size=8)
        svc.build_index(
            [f"document {i} on distinct topic {i}" for i in range(8)],
            max_passage_length=16, batch_size=8,
        )
        hit = svc.query("document 5 on distinct topic 5", k=1)["hits"][0]
        assert "id" not in hit
        svc.remove_passages([0])
        # positional ids re-establish position==id after the shift
        np.testing.assert_array_equal(svc.passage_ids, np.arange(7))
        # caller-supplied external ids are a stable_ids-mode concept:
        # positional mode must reject them clearly instead of silently
        # corrupting the position==id invariant (round-3 review finding)
        with pytest.raises(ValueError, match="stable_ids"):
            svc.add_passages(["doc x"], ids=[100],
                             max_passage_length=16, batch_size=8)
        with pytest.raises(ValueError, match="stable_ids"):
            svc.build_index(["doc y"], max_passage_length=16,
                            batch_size=8, ids=[0])
        np.testing.assert_array_equal(svc.passage_ids, np.arange(7))

    def test_finalize_hits_uses_search_snapshot(self, data_mesh):
        """Hit decoration must come from the state snapshot the search ran
        on: slicing a result against LIVE corpus_texts after a concurrent
        /remove paired ids with the wrong (shifted) document's text."""
        from rankpo_tpu.serve.service import finalize_hits

        svc = self._service(data_mesh, n=8)
        res = svc.query(["document 6 on distinct topic 6"], k=2,
                        return_passages=True)[0]
        # mutate AFTER the search: positions shift down
        svc.remove_passages([int(svc.passage_ids[0])])
        out = finalize_hits(res, 1)
        hit = out["hits"][0]
        assert hit["passage"] == f"document {hit['index']} on distinct topic {hit['index']}"
        # return_passages=False strips the texts instead of re-attaching
        res2 = svc.query(["document 3 on distinct topic 3"], k=2,
                         return_passages=True)[0]
        out2 = finalize_hits(res2, 2, return_passages=False)
        assert all("passage" not in h for h in out2["hits"])

    def test_http_add_with_ids(self, data_mesh):
        from http.server import ThreadingHTTPServer

        from rankpo_tpu.cli.serve import make_handler

        svc = self._service(data_mesh, n=8)
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(svc, None, k_max=10)
        )
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/add",
                data=json.dumps({
                    "passages": ["document 8 on distinct topic 8"],
                    "ids": [777],
                }).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                assert json.loads(r.read())["ntotal"] == 9
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/search",
                data=json.dumps({
                    "query": "document 8 on distinct topic 8", "k": 1,
                }).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                hit = json.loads(r.read())["results"][0]["hits"][0]
            assert hit["id"] == 777
        finally:
            server.shutdown()


class TestPackedQueries:
    """pack_queries=True: identical hits to the unpacked fused path on
    mixed-length query groups (same tokenization; only the batching packs)."""

    def _build(self, data_mesh, pack):
        cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(0), cfg)
        tok = HashTokenizer(vocab_size=256)
        encoder = InferenceEncoder(cfg, params, tok, mesh=data_mesh,
                                   compute_dtype=jnp.float32,
                                   length_multiple=8)
        svc = RetrievalService(encoder, mesh=data_mesh, max_query_length=24,
                               query_batch_size=8, pack_queries=pack,
                               pack_max_segments=4)
        corpus = [f"document {i} on distinct topic {i}" for i in range(32)]
        svc.build_index(corpus, max_passage_length=16, batch_size=8)
        return svc

    def test_matches_unpacked(self, data_mesh):
        plain = self._build(data_mesh, pack=False)
        packed = self._build(data_mesh, pack=True)
        # mixed lengths: short + long in one group, plus a multi-chunk batch
        queries = [
            "document 3 on distinct topic 3",
            "q",
            "document 19 on distinct topic 19 with a much longer tail "
            "of extra words to stretch the tokenized length out",
            "document 7 on distinct topic 7",
        ] + [f"document {i} on distinct topic {i}" for i in range(11)]
        a = plain.query(queries, k=3)
        b = packed.query(queries, k=3)
        for ra, rb in zip(a, b):
            assert [h["index"] for h in ra["hits"]] == [
                h["index"] for h in rb["hits"]
            ]
            np.testing.assert_allclose(
                [h["score"] for h in ra["hits"]],
                [h["score"] for h in rb["hits"]],
                atol=2e-4,
            )

    def test_warmup_and_single(self, data_mesh):
        svc = self._build(data_mesh, pack=True)
        svc.warmup(k=3)
        res = svc.query("document 5 on distinct topic 5", k=3)
        assert res["hits"][0]["index"] == 5
