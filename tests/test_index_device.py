"""Device-resident index build: encode_sharded + from_sharded.

The host path (encode -> numpy -> FlatIPIndex) round-trips the full corpus
through host RAM twice; the device path writes embed outputs straight into
a row-sharded HBM buffer and pins it into the index. These tests assert
the two paths are bit-identical end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rankpo_tpu.core.mesh import DATA_AXIS
from rankpo_tpu.data import HashTokenizer
from rankpo_tpu.index import (
    FlatIPIndex,
    InferenceEncoder,
    RefineIPIndex,
    numpy_search,
)
from rankpo_tpu.models import init_params, tiny_llama_config


@pytest.fixture(scope="module")
def encoder(data_mesh):
    cfg = tiny_llama_config(vocab_size=256)
    params = init_params(jax.random.key(0), cfg)
    tok = HashTokenizer(vocab_size=256)
    return InferenceEncoder(cfg, params, tok, mesh=data_mesh,
                            compute_dtype=jnp.float32, length_multiple=8)


def _texts(n):
    # mixed lengths so sort_by_length actually reorders
    return [
        ("document %d " % i) + ("filler " * (i % 7))
        for i in range(n)
    ]


def _device_rows(corpus, mesh):
    """Host matrix -> the encode_sharded layout (row-sharded, zero-padded)."""
    n = corpus.shape[0]
    n_shards = mesh.shape[DATA_AXIS]
    n_buf = -(-n // n_shards) * n_shards
    emb = np.concatenate(
        [corpus, np.zeros((n_buf - n, corpus.shape[1]), np.float32)]
    )
    return jax.device_put(
        emb, NamedSharding(mesh, P(DATA_AXIS, None))
    )


class TestEncodeSharded:
    def test_bit_identical_to_host_encode(self, encoder):
        texts = _texts(37)  # not divisible by batch or shards
        host = encoder.encode(texts, batch_size=16, max_length=16)
        dev, n = encoder.encode_sharded(texts, batch_size=16, max_length=16)
        assert n == 37
        assert dev.shape[0] % 8 == 0 and dev.shape[0] >= 37
        fetched = np.asarray(dev, np.float32)
        np.testing.assert_array_equal(fetched[:37], host)
        assert not fetched[37:].any()  # pad rows stay zero

    def test_no_sort_path(self, encoder):
        texts = _texts(20)
        host = encoder.encode(texts, batch_size=16, max_length=16,
                              sort_by_length=False)
        dev, n = encoder.encode_sharded(texts, batch_size=16, max_length=16,
                                        sort_by_length=False)
        np.testing.assert_array_equal(np.asarray(dev)[:20], host)


class TestFromSharded:
    def _corpus(self, n=803, d=16, seed=42):
        rng = np.random.RandomState(seed)
        x = rng.randn(n, d).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        return x

    def test_flat_matches_host_build(self, data_mesh):
        corpus = self._corpus()
        queries = self._corpus(29, seed=43)
        host_idx = FlatIPIndex(corpus, mesh=data_mesh)
        dev_idx = FlatIPIndex.from_sharded(
            _device_rows(corpus, data_mesh), 803, data_mesh
        )
        hs, hi = host_idx.search(queries, k=50, batch_size=8)
        ds, di = dev_idx.search(queries, k=50, batch_size=8)
        np.testing.assert_array_equal(hi, di)
        np.testing.assert_array_equal(hs, ds)
        es, ei = numpy_search(corpus, queries, 50)
        np.testing.assert_array_equal(di, ei)

    def test_flat_int8_matches_host_build(self, data_mesh):
        corpus = self._corpus(96, 16)
        queries = self._corpus(5, 16, seed=7)
        host_idx = FlatIPIndex(corpus, mesh=data_mesh, dtype=jnp.int8)
        dev_idx = FlatIPIndex.from_sharded(
            _device_rows(corpus, data_mesh), 96, data_mesh, dtype=jnp.int8
        )
        hs, hi = host_idx.search(queries, k=10, batch_size=8)
        ds, di = dev_idx.search(queries, k=10, batch_size=8)
        np.testing.assert_array_equal(hi, di)
        np.testing.assert_allclose(hs, ds, atol=1e-6)

    def test_flat_rejects_bad_layout(self, data_mesh):
        corpus = self._corpus(10, 8)
        with pytest.raises(ValueError, match="divisible"):
            FlatIPIndex.from_sharded(
                jax.device_put(jnp.asarray(corpus)), 10, data_mesh
            )

    def test_refine_full_coverage_exact(self, data_mesh):
        corpus = self._corpus(120, 16)
        queries = self._corpus(9, 16, seed=9)
        dev_idx = RefineIPIndex.from_sharded(
            _device_rows(corpus, data_mesh), 120, data_mesh,
            reduced_dim=16, candidates=120, store_dtype=jnp.float32,
        )
        s, i = dev_idx.search(queries, k=20, batch_size=8)
        es, ei = numpy_search(corpus, queries, 20)
        np.testing.assert_allclose(s, es, atol=1e-5)
        for r in range(len(queries)):
            assert set(i[r].tolist()) == set(ei[r].tolist())

    def test_refine_autotune_on_device(self, data_mesh):
        rng = np.random.RandomState(3)
        corpus = rng.randn(2000, 32).astype(np.float32)
        corpus *= (np.arange(1, 33, dtype=np.float32) ** -0.5)[None]
        corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
        dev_idx = RefineIPIndex.from_sharded(
            _device_rows(corpus, data_mesh), 2000, data_mesh,
            reduced_dim=8, recall_target=0.9, tune_sample=32, tune_k=10,
        )
        host_idx = RefineIPIndex(
            corpus, mesh=data_mesh, reduced_dim=8, recall_target=0.9,
            tune_sample=32, tune_k=10,
        )
        # same data, same seed, same ladder -> same tuned C
        assert dev_idx.candidates == host_idx.candidates


class TestServiceDeviceBuild:
    def test_device_and_host_builds_agree(self, encoder, data_mesh):
        from rankpo_tpu.serve import RetrievalService

        corpus = [f"document {i} on distinct topic {i}" for i in range(19)]
        results = {}
        for device_resident in (True, False):
            svc = RetrievalService(
                encoder, mesh=data_mesh, max_query_length=16,
                query_batch_size=8,
            )
            svc.build_index(corpus, max_passage_length=16, batch_size=8,
                            device_resident=device_resident)
            res = svc.query(
                ["document 7 on distinct topic 7",
                 "document 12 on distinct topic 12"],
                k=5, return_passages=False,
            )
            results[device_resident] = [
                [(h["index"], h["score"]) for h in r["hits"]] for r in res
            ]
        assert results[True] == results[False]
