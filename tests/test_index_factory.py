"""FAISS index_factory analog (rankpo_tpu/index/factory.py): spec strings
resolve to (index_type, kwargs) and drive the real index tiers end to end.

The reference builds only faiss.IndexFlatIP (src/utils.py:38-51); FAISS
users configure everything else through index_factory strings — this keeps
that muscle memory working against the TPU tiers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankpo_tpu.index import parse_index_spec, resolve_index_spec


class TestParse:
    def test_flat(self):
        assert parse_index_spec("Flat") == ("flat", {})
        assert parse_index_spec("flat") == ("flat", {})

    def test_flat_storage(self):
        kind, kw = parse_index_spec("SQ8")
        assert kind == "flat" and kw == {"dtype": jnp.int8}
        kind, kw = parse_index_spec("SQbf16")
        assert kind == "flat" and kw == {"dtype": jnp.bfloat16}
        # fp16 maps to the TPU half-width tier
        assert parse_index_spec("SQfp16")[1] == {"dtype": jnp.bfloat16}

    def test_refine(self):
        kind, kw = parse_index_spec("PCA128,Flat")
        assert kind == "refine" and kw == {"reduced_dim": 128}
        # PCAR/PCAW spellings accepted
        assert parse_index_spec("PCAR64,Flat") == ("refine", {"reduced_dim": 64})

    def test_ivf(self):
        assert parse_index_spec("IVF4096,Flat") == ("ivf", {"n_clusters": 4096})
        kind, kw = parse_index_spec("IVF1024,SQ8")
        assert kind == "ivf"
        assert kw == {"n_clusters": 1024, "store_dtype": jnp.int8}

    def test_ivf_pq(self):
        kind, kw = parse_index_spec("IVF4096,PQ64")
        assert kind == "ivf" and kw == {"n_clusters": 4096, "pq_m": 64}
        kind, kw = parse_index_spec("OPQ64,IVF4096,PQ64")
        assert kw == {"n_clusters": 4096, "pq_m": 64, "pq_rotate": "opq"}
        kind, kw = parse_index_spec("RR64,IVF4096,PQ64")
        assert kw == {"n_clusters": 4096, "pq_m": 64, "pq_rotate": "random"}
        # bare rotation prefix (block count elided) is allowed
        kind, kw = parse_index_spec("OPQ,IVF16,PQ8")
        assert kw == {"n_clusters": 16, "pq_m": 8, "pq_rotate": "opq"}

    def test_ivf_pca_hybrid(self):
        kind, kw = parse_index_spec("PCA128,IVF4096,Flat")
        assert kind == "ivf"
        assert kw == {"n_clusters": 4096, "reduced_dim": 128}

    def test_errors(self):
        with pytest.raises(ValueError, match="unknown"):
            parse_index_spec("HNSW32")
        with pytest.raises(ValueError, match="PQ<m>"):
            parse_index_spec("OPQ64,IVF16,Flat")  # rotation without PQ
        with pytest.raises(ValueError, match="!= PQ m"):
            parse_index_spec("OPQ32,IVF16,PQ64")  # mismatched m
        with pytest.raises(ValueError, match="IVF"):
            parse_index_spec("PQ64")  # flat PQ unsupported
        with pytest.raises(ValueError, match="int8"):
            parse_index_spec("PCA64,SQ8")  # refine over int8 rows
        with pytest.raises(ValueError, match="SQ"):
            parse_index_spec("IVF16,PQ8,SQ8")  # PQ replaces row storage
        with pytest.raises(ValueError, match="empty"):
            parse_index_spec("  ")
        with pytest.raises(ValueError, match="empty"):
            parse_index_spec(",")  # only separators is a typo, not Flat
        with pytest.raises(ValueError, match="duplicate"):
            parse_index_spec("IVF16,IVF32,Flat")
        with pytest.raises(ValueError, match="duplicate"):
            parse_index_spec("SQ8,SQbf16")
        with pytest.raises(ValueError, match="duplicate rotation"):
            parse_index_spec("OPQ8,RR8,IVF16,PQ8")

    def test_resolve_passthrough_and_merge(self):
        # plain tier names untouched
        assert resolve_index_spec("ivf", {"nprobe": 4}) == ("ivf", {"nprobe": 4})
        # spec parsed; explicit kwargs win over spec components
        kind, kw = resolve_index_spec("IVF64,PQ8", {"n_clusters": 32})
        assert kind == "ivf" and kw == {"n_clusters": 32, "pq_m": 8}


class TestEndToEnd:
    def test_evaluator_accepts_spec(self, tmp_path):
        """evaluate_checkpoint with a factory string builds the right tier
        and produces sane metrics on a separable toy corpus."""
        from rankpo_tpu.data.tokenization import HashTokenizer
        from rankpo_tpu.eval.evaluator import evaluate_checkpoint
        from rankpo_tpu.models import (
            init_params,
            save_pretrained,
            tiny_llama_config,
        )

        cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(0), cfg)
        model = tmp_path / "model"
        save_pretrained(str(model), cfg, params)
        tok = HashTokenizer(vocab_size=256)
        queries = [f"subject {i} methods" for i in range(4)]
        labels = [[i] for i in range(4)]
        corpus = [f"subject {i} methods" for i in range(24)]

        metrics, indices, _ = evaluate_checkpoint(
            str(model), queries, labels, corpus, tokenizer=tok,
            batch_size=8, max_query_length=16, max_passage_length=16,
            k=5, cutoffs=(1, 5), compute_dtype=jnp.float32,
            index_type="IVF4,Flat",
            index_kwargs={"nprobe": 4, "kmeans_iters": 2,
                          "store_dtype": jnp.float32},
        )
        # full probe = exact hit sets: identical query/corpus text i must
        # retrieve corpus i first
        assert metrics["MRR@1"] == 1.0
        assert indices.shape == (4, 5)

    def test_service_accepts_spec(self):
        """RetrievalService resolves a storage spec to flat + int8."""
        import jax.numpy as jnp

        from rankpo_tpu.serve.service import RetrievalService

        svc = RetrievalService.__new__(RetrievalService)
        # __init__ needs an encoder only for later use; pass a stub
        RetrievalService.__init__(
            svc, encoder=None, index_type="SQ8",
        )
        assert svc.index_type == "flat"
        assert svc.index_dtype == jnp.int8

        svc2 = RetrievalService.__new__(RetrievalService)
        RetrievalService.__init__(
            svc2, encoder=None, index_type="OPQ8,IVF16,PQ8",
            index_kwargs={"nprobe": 2},
        )
        assert svc2.index_type == "ivf"
        assert svc2.index_kwargs == {
            "n_clusters": 16, "pq_m": 8, "pq_rotate": "opq", "nprobe": 2,
        }

    def test_service_spec_keeps_bf16_tier_default(self):
        """Regression (round-3 review): an ivf/refine spec without an SQ
        component must get the tier's documented bf16 storage — the service
        used to collapse index_dtype=None to fp32 and setdefault it into
        store_dtype, doubling HBM vs the same spec on evaluate/mining."""
        from rankpo_tpu.serve.service import RetrievalService

        svc = RetrievalService.__new__(RetrievalService)
        RetrievalService.__init__(svc, encoder=None, index_type="IVF16,Flat")
        assert svc.index_kwargs["store_dtype"] == jnp.bfloat16
        assert svc._approx_kwargs()["store_dtype"] == jnp.bfloat16
        # explicit SQ component still wins
        svc2 = RetrievalService.__new__(RetrievalService)
        RetrievalService.__init__(svc2, encoder=None, index_type="IVF16,SQ8")
        assert svc2._approx_kwargs()["store_dtype"] == jnp.int8
        # explicit index_dtype wins over the tier default
        svc3 = RetrievalService.__new__(RetrievalService)
        RetrievalService.__init__(
            svc3, encoder=None, index_type="IVF16,Flat",
            index_dtype=jnp.float32,
        )
        assert svc3._approx_kwargs()["store_dtype"] == jnp.float32
