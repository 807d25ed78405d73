"""Index engine tests: exact parity vs the numpy FAISS-semantics oracle,
tie-breaking, sharded (8-device) vs single-device equivalence, streaming
matmul_topk vs dense top_k, and the inference encoder."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankpo_tpu.index import FlatIPIndex, InferenceEncoder, numpy_search
from rankpo_tpu.ops.topk import matmul_topk
from rankpo_tpu.data import HashTokenizer
from rankpo_tpu.models import init_params, tiny_llama_config


def _random_corpus(n, d, seed=0, normalize=True):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    if normalize:
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
    return x


class TestMatmulTopk:
    @pytest.mark.parametrize("allow_dense", [True, False])
    def test_matches_dense_topk(self, allow_dense):
        corpus = _random_corpus(1000, 32, 0)
        queries = _random_corpus(17, 32, 1)
        s, i = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=10,
                           block_size=128, allow_dense=allow_dense)
        dense = queries @ corpus.T
        ds, di = jax.lax.top_k(jnp.asarray(dense), 10)
        np.testing.assert_allclose(np.asarray(s), np.asarray(ds), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(di))

    def test_scan_equals_dense_path(self):
        corpus = _random_corpus(2000, 16, 8)
        queries = _random_corpus(9, 16, 9)
        sd, idn = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=25,
                              allow_dense=True)
        ss, ids = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=25,
                              block_size=256, allow_dense=False)
        np.testing.assert_array_equal(np.asarray(idn), np.asarray(ids))
        np.testing.assert_allclose(np.asarray(sd), np.asarray(ss), atol=1e-5)

    def test_n_valid_masks_padding(self):
        corpus = np.zeros((100, 8), np.float32)
        corpus[:50] = _random_corpus(50, 8, 2)
        corpus[50:] = 100.0  # huge scores that must never surface
        queries = _random_corpus(4, 8, 3)
        s, i = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=20,
                           n_valid=50, block_size=32)
        assert int(np.asarray(i).max()) < 50

    def test_index_offset(self):
        corpus = _random_corpus(64, 8, 4)
        queries = _random_corpus(2, 8, 5)
        _, i0 = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=5)
        _, i7 = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=5,
                            index_offset=700)
        np.testing.assert_array_equal(np.asarray(i7), np.asarray(i0) + 700)

    def test_tie_breaking_lowest_index(self):
        base = _random_corpus(32, 8, 6)
        corpus = np.concatenate([base, base], axis=0)  # every vector duplicated
        queries = _random_corpus(4, 8, 7)
        _, idx = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=8,
                             block_size=16)
        idx = np.asarray(idx)
        # with exact ties, the lower index (first copy, < 32) must come first
        for row in idx:
            seen_pairs = {}
            for rank, j in enumerate(row):
                pair = j % 32
                if pair in seen_pairs:
                    assert row[seen_pairs[pair]] == pair, (
                        f"lower index should rank first: {row}"
                    )
                else:
                    seen_pairs[pair] = rank


class TestBlockmaxExactTopk:
    """Two-pass exact top-k (block-max prefilter, ops/topk.py
    exact_topk_blockmax): engages only above ~8k columns, so these corpora are
    sized to actually exercise it (the small-corpus sweeps below take the
    plain-sort path)."""

    def test_engages_and_matches_oracle(self):
        corpus = _random_corpus(20_000, 16, 10)  # 156 blocks + ragged tail
        queries = _random_corpus(8, 16, 11)
        s, i = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=10)
        es, ei = numpy_search(corpus, queries, 10)
        np.testing.assert_array_equal(np.asarray(i), ei)
        np.testing.assert_allclose(np.asarray(s), es, atol=1e-5)

    def test_exact_multiple_of_block(self):
        corpus = _random_corpus(128 * 100, 8, 12)  # no tail
        queries = _random_corpus(4, 8, 13)
        s, i = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=37)
        es, ei = numpy_search(corpus, queries, 37)
        np.testing.assert_array_equal(np.asarray(i), ei)

    def test_mass_ties_fall_back_and_stay_exact(self):
        # every vector duplicated 8x: far more tied blocks than the slack can
        # hold -> the verification must trip the full-sort fallback, and FAISS
        # lowest-index tie order must still hold bit-exactly
        base = _random_corpus(2048, 8, 14)
        corpus = np.concatenate([base] * 8, axis=0)  # 16384 rows
        queries = _random_corpus(4, 8, 15)
        s, i = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=50)
        es, ei = numpy_search(corpus, queries, 50)
        np.testing.assert_array_equal(np.asarray(i), ei)
        np.testing.assert_allclose(np.asarray(s), es, atol=1e-5)

    def test_top1_hits_in_tail(self):
        corpus = _random_corpus(128 * 80 + 77, 8, 16)  # ragged 77-col tail
        queries = _random_corpus(3, 8, 17)
        # plant the global best in the tail for every query
        corpus[-1] = 10.0 * queries[0] / np.linalg.norm(queries[0])
        s, i = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=5)
        assert int(np.asarray(i)[0, 0]) == corpus.shape[0] - 1
        es, ei = numpy_search(corpus, queries, 5)
        np.testing.assert_array_equal(np.asarray(i), ei)

    def test_n_valid_padding_with_blockmax(self):
        corpus = np.full((16384, 8), 100.0, np.float32)
        corpus[:9000] = _random_corpus(9000, 8, 18)
        queries = _random_corpus(4, 8, 19)
        s, i = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=20,
                           n_valid=9000)
        assert int(np.asarray(i).max()) < 9000
        es, ei = numpy_search(corpus[:9000], queries, 20)
        np.testing.assert_array_equal(np.asarray(i), ei)


class TestHierBlockmax:
    """Two-level (superblock) selection tier of exact_topk_blockmax.

    The real gate needs >= HIER_MIN_BLOCKS (8192) blocks = 256k+ columns; the
    monkeypatched cases lower it to exercise the two-level code on CPU-sized
    corpora, including ties/fallback, ragged tails, and n_valid padding."""

    def _patched(self, monkeypatch, min_blocks=8, group=4):
        from rankpo_tpu.ops import topk as topk_mod
        monkeypatch.setattr(topk_mod, "HIER_MIN_BLOCKS", min_blocks)
        monkeypatch.setattr(topk_mod, "HIER_GROUP", group)

    def test_two_level_matches_oracle(self, monkeypatch):
        self._patched(monkeypatch)
        corpus = _random_corpus(20_000, 16, 40)  # 625 blocks, ragged tail
        queries = _random_corpus(8, 16, 41)
        s, i = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=10)
        es, ei = numpy_search(corpus, queries, 10)
        np.testing.assert_array_equal(np.asarray(i), ei)
        np.testing.assert_allclose(np.asarray(s), es, atol=1e-5)

    def test_two_level_mass_ties_fall_back(self, monkeypatch):
        self._patched(monkeypatch)
        base = _random_corpus(2048, 8, 42)
        corpus = np.concatenate([base] * 8, axis=0)
        queries = _random_corpus(4, 8, 43)
        s, i = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=50)
        es, ei = numpy_search(corpus, queries, 50)
        np.testing.assert_array_equal(np.asarray(i), ei)

    def test_two_level_n_valid_padding(self, monkeypatch):
        self._patched(monkeypatch)
        corpus = np.full((16384, 8), 100.0, np.float32)
        corpus[:9000] = _random_corpus(9000, 8, 44)
        queries = _random_corpus(4, 8, 45)
        s, i = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=20,
                           n_valid=9000)
        assert int(np.asarray(i).max()) < 9000
        es, ei = numpy_search(corpus[:9000], queries, 20)
        np.testing.assert_array_equal(np.asarray(i), ei)

    def test_two_level_top1_in_tail(self, monkeypatch):
        self._patched(monkeypatch)
        corpus = _random_corpus(32 * 700 + 13, 8, 46)  # ragged 13-col tail
        queries = _random_corpus(3, 8, 47)
        corpus[-1] = 10.0 * queries[0] / np.linalg.norm(queries[0])
        s, i = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=5)
        assert int(np.asarray(i)[0, 0]) == corpus.shape[0] - 1
        es, ei = numpy_search(corpus, queries, 5)
        np.testing.assert_array_equal(np.asarray(i), ei)

    def test_real_gate_engages_and_matches(self):
        # 300k columns > HIER_MIN_BLOCKS*32: the unpatched two-level path
        from rankpo_tpu.ops.topk import exact_topk_blockmax
        rng = np.random.RandomState(48)
        scores = jnp.asarray(rng.randn(4, 300_032).astype(np.float32))
        s, i = jax.jit(lambda x: exact_topk_blockmax(x, 25))(scores)
        order = np.argsort(-np.asarray(scores), axis=1, kind="stable")[:, :25]
        np.testing.assert_array_equal(np.asarray(i), order)

    def test_large_k_keeps_single_level(self, monkeypatch):
        # 2*c > B//GROUP must bypass the two-level tier (coverage needs
        # c superblocks); results still exact
        self._patched(monkeypatch, min_blocks=8, group=64)
        corpus = _random_corpus(20_000, 8, 49)
        queries = _random_corpus(3, 8, 50)
        s, i = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=300)
        es, ei = numpy_search(corpus, queries, 300)
        np.testing.assert_array_equal(np.asarray(i), ei)


class TestDotAlgorithmX3:
    """The TPU exact-mode default is BF16_BF16_F32_X3 (ops/topk.py decision
    record). On CPU the default stays native fp32 (bit-exact vs the numpy
    oracle — everything the rest of this file asserts); this exercises the
    X3 algorithm explicitly: scores must match the oracle to ~2e-6-class
    accumulation noise and index divergence must be confined to near-ties."""

    def test_x3_near_tie_bounded_divergence(self):
        import jax as _jax

        corpus = _random_corpus(20_000, 64, 60)
        queries = _random_corpus(32, 64, 61)
        s, i = matmul_topk(
            jnp.asarray(queries), jnp.asarray(corpus), k=50,
            precision=_jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3,
        )
        es, ei = numpy_search(corpus, queries, 50)
        s, i = np.asarray(s), np.asarray(i)
        mism = i != ei
        # divergence (if any) must be rare and confined to near-ties
        assert mism.sum() <= 32 * 50 // 100, int(mism.sum())
        np.testing.assert_allclose(s, es, atol=2e-5)

    def test_exact_default_on_cpu_is_fp32(self):
        # the None-precision default must stay bit-exact vs the oracle on
        # the CPU backend (the suite's standing assumption)
        corpus = _random_corpus(20_000, 32, 62)
        queries = _random_corpus(16, 32, 63)
        s, i = matmul_topk(jnp.asarray(queries), jnp.asarray(corpus), k=25)
        es, ei = numpy_search(corpus, queries, 25)
        np.testing.assert_array_equal(np.asarray(i), ei)


class TestRandomizedSweep:
    def test_many_random_configs_match_oracle(self, data_mesh):
        """Property sweep: random (n, d, q, k, shard) configs — indices must
        exactly match the FAISS-semantics oracle every time."""
        rng = np.random.RandomState(99)
        for trial in range(12):
            n = int(rng.randint(20, 1500))
            d = int(rng.choice([8, 16, 31, 64]))
            nq = int(rng.randint(1, 40))
            k = int(rng.randint(1, min(n, 150) + 1))
            sharded = bool(rng.randint(2))
            corpus = rng.randn(n, d).astype(np.float32)
            if rng.randint(2):  # sometimes inject duplicates for ties
                dup = rng.randint(1, max(n // 2, 2))
                corpus[-dup:] = corpus[:dup]
            queries = rng.randn(nq, d).astype(np.float32)
            index = FlatIPIndex(corpus, mesh=data_mesh if sharded else None)
            s, i = index.search(queries, k=k, batch_size=int(rng.randint(1, nq + 1)))
            es, ei = numpy_search(corpus, queries, k)
            # indices must match EXCEPT where numpy-vs-XLA fp32 rounding flips
            # a near-tie (score gap within 1e-5) — same tolerance FAISS-vs-GPU
            # comparisons need
            mismatch = i != ei
            if mismatch.any():
                gap = np.abs(s[mismatch] - es[mismatch])
                assert gap.max() < 1e-5, (
                    f"trial {trial}: n={n} d={d} q={nq} k={k} sharded={sharded}: "
                    f"non-tie index mismatch, score gap {gap.max()}"
                )
            np.testing.assert_allclose(s, es, atol=1e-4)


class TestFlatIPIndex:
    @pytest.mark.parametrize("n,k", [(100, 10), (1000, 100), (257, 64)])
    def test_parity_vs_numpy_oracle_single_device(self, n, k):
        corpus = _random_corpus(n, 16, seed=n)
        queries = _random_corpus(33, 16, seed=n + 1)
        index = FlatIPIndex(corpus)
        s, i = index.search(queries, k=k, batch_size=16)
        es, ei = numpy_search(corpus, queries, k)
        np.testing.assert_array_equal(i, ei)
        np.testing.assert_allclose(s, es, atol=1e-5)

    def test_parity_sharded_8dev(self, data_mesh):
        corpus = _random_corpus(803, 16, seed=42)  # deliberately not divisible by 8
        queries = _random_corpus(29, 16, seed=43)
        index = FlatIPIndex(corpus, mesh=data_mesh)
        s, i = index.search(queries, k=100, batch_size=8)
        es, ei = numpy_search(corpus, queries, 100)
        np.testing.assert_array_equal(i, ei)
        np.testing.assert_allclose(s, es, atol=1e-5)

    def test_k_larger_than_corpus_clamped(self):
        corpus = _random_corpus(7, 8, 1)
        index = FlatIPIndex(corpus)
        s, i = index.search(_random_corpus(3, 8, 2), k=100)
        assert s.shape == (3, 7)

    def test_ntotal(self, data_mesh):
        index = FlatIPIndex(_random_corpus(10, 4, 0), mesh=data_mesh)
        assert index.ntotal == 10

    def test_zero_queries_returns_empty(self):
        # review finding, round 3 second pass: the chunk loop ran zero times
        # for an empty query batch and np.concatenate([]) raised
        index = FlatIPIndex(_random_corpus(7, 8, 1))
        s, i = index.search(np.zeros((0, 8), np.float32), k=3)
        assert s.shape == (0, 3) and s.dtype == np.float32
        assert i.shape == (0, 3) and i.dtype == np.int32


class TestInferenceEncoder:
    def _encoder(self, mesh=None):
        cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(0), cfg)
        tok = HashTokenizer(vocab_size=256)
        return InferenceEncoder(
            cfg, params, tok, mesh=mesh, compute_dtype=jnp.float32,
            length_multiple=8,
        )

    def test_shapes_and_norm(self):
        enc = self._encoder()
        texts = [f"document number {i} about topic {i % 3}" for i in range(10)]
        embs = enc.encode(texts, batch_size=4, max_length=16)
        assert embs.shape == (10, 64)
        assert embs.dtype == np.float32
        np.testing.assert_allclose(np.linalg.norm(embs, axis=-1), 1.0, rtol=1e-4)

    def test_single_string(self):
        enc = self._encoder()
        e = enc.encode("hello world", batch_size=4, max_length=16)
        assert e.shape == (64,)

    def test_batch_padding_does_not_change_results(self):
        enc = self._encoder()
        texts = [f"text {i} alpha beta gamma" for i in range(5)]
        a = enc.encode(texts, batch_size=8, max_length=16)   # padded batch
        b = enc.encode(texts, batch_size=5, max_length=16)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_length_sorted_encode_restores_order(self):
        # sort_by_length reorders texts into length-homogeneous chunks (so
        # mixed corpora ride short buckets) and must invert the permutation:
        # row i of the output always embeds texts[i], bit-for-row equal to
        # the unsorted path (each row's computation sees only its own tokens)
        enc = self._encoder()
        rng = np.random.default_rng(5)
        texts = [
            "w " * int(rng.integers(1, 14)) + f"doc {i}" for i in range(23)
        ]
        sorted_out = enc.encode(texts, batch_size=4, max_length=16)
        plain = enc.encode(
            texts, batch_size=4, max_length=16, sort_by_length=False
        )
        assert len({len(t) for t in texts}) > 4  # genuinely mixed lengths
        np.testing.assert_allclose(sorted_out, plain, atol=1e-5)
        # spot-check a row against its solo encode (independent oracle)
        solo = enc.encode(texts[7], batch_size=4, max_length=16)
        np.testing.assert_allclose(sorted_out[7], solo, atol=1e-5)

    def test_mesh_sharded_encode_matches_single(self, data_mesh):
        enc_s = self._encoder(mesh=data_mesh)
        enc_1 = self._encoder()
        texts = [f"doc {i} content words here" for i in range(16)]
        a = enc_s.encode(texts, batch_size=8, max_length=16)
        b = enc_1.encode(texts, batch_size=8, max_length=16)
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestEndToEndRetrieval:
    def test_encode_index_search(self, data_mesh):
        """Mini end-to-end: encode corpus+queries, search, positives retrieved.
        The SURVEY.md §7 'minimum end-to-end slice' check."""
        cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(0), cfg)
        tok = HashTokenizer(vocab_size=256)
        enc = InferenceEncoder(cfg, params, tok, mesh=data_mesh,
                               compute_dtype=jnp.float32, length_multiple=8)
        corpus_texts = [f"unique document {i} topic {i}" for i in range(40)]
        # query texts identical to their positive docs -> must retrieve them
        queries = [corpus_texts[i] for i in (3, 17, 29)]
        c_emb = enc.encode(corpus_texts, batch_size=8, max_length=16)
        q_emb = enc.encode(queries, batch_size=8, max_length=16)
        index = FlatIPIndex(c_emb, mesh=data_mesh)
        scores, indices = index.search(q_emb, k=5)
        assert list(indices[:, 0]) == [3, 17, 29]
        np.testing.assert_allclose(scores[:, 0], 1.0, atol=1e-4)


class TestQuantizedIndex:
    def test_int8_recall_vs_fp32(self, data_mesh):
        """4x-memory int8 storage: top-10 recall vs exact fp32 must stay high
        on normalized embeddings (serving-mode trade)."""
        rng = np.random.RandomState(7)
        corpus = rng.randn(2000, 64).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
        queries = rng.randn(32, 64).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=-1, keepdims=True)

        exact = FlatIPIndex(corpus)
        _, ie = exact.search(queries, k=10)
        for mesh in (None, data_mesh):
            q8 = FlatIPIndex(corpus, mesh=mesh, dtype=jnp.int8)
            s8, i8 = q8.search(queries, k=10)
            recall = np.mean([
                len(set(i8[r]) & set(ie[r])) / 10 for r in range(len(queries))
            ])
            assert recall >= 0.9, f"int8 recall too low (mesh={mesh}): {recall}"
            # scores approximate the true cosines
            es, _ = exact.search(queries, k=10)
            assert abs(float(s8[0, 0]) - float(es[0, 0])) < 0.02

    def test_int8_mxu_path_matches_contract(self):
        """The true int8 x int8 -> int32 path (TPU default, forced here on
        CPU): scores must equal q_scale * col_scale * (q8 . c8) exactly
        (integer dot reproduced in numpy) and rank nearly identically to
        the dequant path."""
        from rankpo_tpu.ops.topk import dense_matmul_topk

        rng = np.random.RandomState(3)
        corpus = rng.randn(512, 64).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
        queries = rng.randn(16, 64).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=-1, keepdims=True)

        c_scale = np.maximum(np.abs(corpus).max(axis=1), 1e-12) / 127.0
        c8 = np.clip(np.round(corpus / c_scale[:, None]), -127, 127)
        q_scale = np.maximum(np.abs(queries).max(axis=1), 1e-12) / 127.0
        q8 = np.clip(np.round(queries / q_scale[:, None]), -127, 127)
        full = (
            q_scale[:, None] * c_scale[None, :]
            * (q8.astype(np.int64) @ c8.T.astype(np.int64))
        )
        ref_i = np.argsort(-full, axis=1, kind="stable")[:, :10]
        ref_s = np.take_along_axis(full, ref_i, axis=1)

        s, i = jax.jit(
            functools.partial(dense_matmul_topk, k=10, int8_mxu=True)
        )(
            jnp.asarray(queries, jnp.bfloat16),
            jnp.asarray(c8, jnp.int8),
            col_scale=jnp.asarray(c_scale, jnp.float32),
        )
        # query quantization happens from the bf16 queries, so re-derive
        # the oracle from the same rounding only if indices disagree
        overlap = np.mean([
            len(set(np.asarray(i)[r]) & set(ref_i[r])) / 10
            for r in range(len(queries))
        ])
        assert overlap >= 0.9, overlap
        match = np.asarray(i) == ref_i
        np.testing.assert_allclose(
            np.asarray(s)[match], ref_s[match], rtol=2e-2, atol=2e-3
        )

    def test_int8_memory_is_quarter(self):
        corpus = np.random.RandomState(0).randn(256, 64).astype(np.float32)
        idx8 = FlatIPIndex(corpus, dtype=jnp.int8)
        assert idx8.corpus.dtype == jnp.int8
        assert idx8.row_scale is not None and idx8.row_scale.shape == (256,)


def test_bucket_length_respects_max_length_below_multiple():
    """max_query_length below the length multiple must cap the bucket (the
    old max(multiple, ...) padded 32-token queries to 64)."""
    from rankpo_tpu.data import HashTokenizer
    from rankpo_tpu.index import InferenceEncoder
    from rankpo_tpu.models import init_params, tiny_llama_config

    cfg = tiny_llama_config(vocab_size=64)
    enc = InferenceEncoder(cfg, init_params(jax.random.key(0), cfg),
                           HashTokenizer(64), length_multiple=64)
    assert enc._bucket_length(10, 32) == 32
    assert enc._bucket_length(100, 512) == 128
    assert enc._bucket_length(1000, 512) == 512


class TestReconstruct:
    """FAISS reconstruct/reconstruct_batch analogs across the tiers."""

    def _rows(self, n, d, seed=0):
        rng = np.random.default_rng(seed)
        x = rng.standard_normal((n, d)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    def test_flat_fp32_exact(self):
        emb = self._rows(100, 16)
        index = FlatIPIndex(emb)
        ids = np.array([0, 7, 99, 7])
        np.testing.assert_array_equal(index.reconstruct(ids), emb[ids])

    def test_flat_scalar_id_and_bf16(self):
        emb = self._rows(50, 8)
        index = FlatIPIndex(emb, dtype=jnp.bfloat16)
        got = index.reconstruct(3)
        assert got.shape == (1, 8) and got.dtype == np.float32
        expect = emb[3:4].astype(jnp.bfloat16).astype(np.float32)
        np.testing.assert_array_equal(got, expect)

    def test_flat_int8_dequantizes(self):
        emb = self._rows(64, 32, seed=1)
        index = FlatIPIndex(emb, dtype=jnp.int8)
        got = index.reconstruct(np.arange(64))
        # symmetric max-abs int8: one quantization step of error per element
        step = np.abs(emb).max(axis=1, keepdims=True) / 127.0
        assert np.all(np.abs(got - emb) <= step + 1e-7)

    def test_flat_rejects_bad_ids(self):
        index = FlatIPIndex(self._rows(10, 8))
        with pytest.raises(IndexError):
            index.reconstruct([10])
        with pytest.raises(IndexError):
            index.reconstruct([-1])
        assert index.reconstruct([]).shape == (0, 8)

    def test_flat_sharded(self, data_mesh):
        emb = self._rows(37, 16, seed=2)  # pad rows must never surface
        index = FlatIPIndex(emb, mesh=data_mesh)
        ids = np.array([0, 36, 18])
        np.testing.assert_array_equal(index.reconstruct(ids), emb[ids])

    def test_refine_storage_precision(self):
        from rankpo_tpu.index import RefineIPIndex

        emb = self._rows(80, 32, seed=3)
        index = RefineIPIndex(emb, reduced_dim=8, candidates=16)
        ids = np.array([5, 79, 0])
        expect = emb[ids].astype(jnp.bfloat16).astype(np.float32)
        np.testing.assert_array_equal(index.reconstruct(ids), expect)

    def test_ivf_fp32_exact(self):
        from rankpo_tpu.index import IVFIPIndex

        emb = self._rows(200, 16, seed=4)
        index = IVFIPIndex(emb, n_clusters=4, nprobe=2,
                           store_dtype=jnp.float32)
        ids = np.array([0, 123, 199, 50])
        np.testing.assert_allclose(index.reconstruct(ids), emb[ids],
                                   atol=1e-6)

    def test_ivf_int8_dequantizes(self):
        from rankpo_tpu.index import IVFIPIndex

        emb = self._rows(150, 32, seed=5)
        index = IVFIPIndex(emb, n_clusters=4, nprobe=2,
                           store_dtype=jnp.int8)
        ids = np.arange(150)
        got = index.reconstruct(ids)
        step = np.abs(emb).max(axis=1, keepdims=True) / 127.0
        assert np.all(np.abs(got - emb) <= step + 1e-7)

    def test_ivf_pq_decodes_near_original(self):
        from rankpo_tpu.index import IVFIPIndex

        emb = self._rows(600, 32, seed=6)
        index = IVFIPIndex(emb, n_clusters=4, nprobe=4, pq_m=8,
                           kmeans_iters=5, pq_iters=10)
        got = index.reconstruct(np.arange(600))
        # PQ is lossy; decoded rows must still be far closer to their own
        # original than to an unrelated row
        cos_own = np.sum(got * emb, axis=1) / np.maximum(
            np.linalg.norm(got, axis=1), 1e-9
        )
        assert float(np.mean(cos_own)) > 0.8

    def test_ivf_rotated_pq_unrotates(self):
        from rankpo_tpu.index import IVFIPIndex

        emb = self._rows(600, 32, seed=7)
        plain = IVFIPIndex(emb, n_clusters=4, nprobe=4, pq_m=8,
                           kmeans_iters=5, pq_iters=10)
        rot = IVFIPIndex(emb, n_clusters=4, nprobe=4, pq_m=8,
                         kmeans_iters=5, pq_iters=10, pq_rotate="random")
        # if reconstruct forgot rot^T the rows would live in rotated space
        # and correlate with the originals no better than chance
        def mean_cos(index):
            got = index.reconstruct(np.arange(600))
            return float(np.mean(
                np.sum(got * emb, axis=1)
                / np.maximum(np.linalg.norm(got, axis=1), 1e-9)
            ))

        assert mean_cos(rot) > 0.8
        assert mean_cos(rot) > mean_cos(plain) - 0.1

    def test_ivf_streamed_build_reconstruct(self):
        from rankpo_tpu.index import IVFIPIndex

        emb = self._rows(500, 32, seed=8)
        index = IVFIPIndex.from_chunk_fn(
            lambda lo, hi: emb[lo:hi], 500, 32, chunk_rows=128,
            n_clusters=4, nprobe=2, store_dtype=jnp.float32,
            kmeans_iters=5,
        )
        ids = np.array([0, 499, 250])
        np.testing.assert_allclose(index.reconstruct(ids), emb[ids],
                                   atol=1e-6)

    def test_ivf_sharded_reconstruct(self, data_mesh):
        from rankpo_tpu.index import IVFIPIndex

        emb = self._rows(400, 32, seed=9)
        index = IVFIPIndex(emb, mesh=data_mesh, n_clusters=8, nprobe=4,
                           store_dtype=jnp.float32)
        ids = np.array([0, 399, 17, 200])
        np.testing.assert_allclose(index.reconstruct(ids), emb[ids],
                                   atol=1e-6)


class TestRangeSearch:
    """FAISS range_search analog: CSR (lims, scores, ids), score > radius."""

    def _rows(self, n, d, seed=0):
        rng = np.random.default_rng(seed)
        x = rng.standard_normal((n, d)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    def _oracle(self, corpus, queries, radius):
        s = queries @ corpus.T
        return [
            set(np.nonzero(s[q] > radius)[0].tolist())
            for q in range(len(queries))
        ]

    def test_matches_numpy_oracle(self):
        corpus = self._rows(300, 16, seed=0)
        queries = self._rows(9, 16, seed=1)
        radius = 0.3
        lims, scores, ids = FlatIPIndex(corpus).range_search(queries, radius)
        expect = self._oracle(corpus, queries, radius)
        assert lims.shape == (10,) and lims[0] == 0
        assert lims[-1] == len(ids) == len(scores)
        for q in range(9):
            got_ids = ids[lims[q]:lims[q + 1]]
            got_s = scores[lims[q]:lims[q + 1]]
            assert set(got_ids.tolist()) == expect[q]
            assert np.all(got_s > radius)
            assert np.all(np.diff(got_s) <= 1e-7)  # descending

    def test_self_query_includes_self(self):
        corpus = self._rows(128, 32, seed=2)
        lims, scores, ids = FlatIPIndex(corpus).range_search(
            corpus[:5], 0.99
        )
        for q in range(5):
            assert q in set(ids[lims[q]:lims[q + 1]].tolist())

    def test_no_hits_and_empty_queries(self):
        corpus = self._rows(64, 16, seed=3)
        index = FlatIPIndex(corpus)
        lims, scores, ids = index.range_search(self._rows(3, 16, seed=4), 2.0)
        assert lims.tolist() == [0, 0, 0, 0] and ids.size == 0
        lims, scores, ids = index.range_search(
            np.zeros((0, 16), np.float32), 0.0
        )
        assert lims.tolist() == [0] and ids.size == 0

    def test_low_radius_returns_everything(self):
        corpus = self._rows(100, 8, seed=5)
        queries = self._rows(4, 8, seed=6)
        lims, scores, ids = FlatIPIndex(corpus).range_search(queries, -2.0)
        assert lims[-1] == 4 * 100  # unit rows: every score > -2
        for q in range(4):
            assert len(set(ids[lims[q]:lims[q + 1]].tolist())) == 100

    def test_sharded(self, data_mesh):
        corpus = self._rows(203, 16, seed=7)  # padded rows must not hit
        queries = self._rows(5, 16, seed=8)
        radius = 0.25
        lims, scores, ids = FlatIPIndex(
            corpus, mesh=data_mesh
        ).range_search(queries, radius)
        expect = self._oracle(corpus, queries, radius)
        for q in range(5):
            assert set(ids[lims[q]:lims[q + 1]].tolist()) == expect[q]
