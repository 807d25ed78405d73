"""C++ native runtime tests: top-k parity vs the numpy oracle (incl. ties),
batch padding vs the python collator, jsonl offset scanning."""

import json

import numpy as np
import pytest

from rankpo_tpu.native import (
    ensure_built,
    native_pad_batch,
    native_scan_jsonl,
    native_topk_ip,
)

pytestmark = pytest.mark.skipif(
    not ensure_built(), reason="native toolchain unavailable"
)


class TestNativeTopK:
    def test_parity_vs_numpy_oracle(self):
        from rankpo_tpu.index import numpy_search

        rng = np.random.RandomState(0)
        corpus = rng.randn(5000, 64).astype(np.float32)
        queries = rng.randn(37, 64).astype(np.float32)
        es, ei = numpy_search(corpus, queries, 50)
        s, i = native_topk_ip(corpus, queries, 50)
        np.testing.assert_array_equal(i, ei)
        np.testing.assert_allclose(s, es, rtol=1e-5)

    def test_tie_breaking_lowest_index(self):
        base = np.random.RandomState(1).randn(64, 16).astype(np.float32)
        corpus = np.concatenate([base, base])  # exact duplicates
        queries = np.random.RandomState(2).randn(8, 16).astype(np.float32)
        _, idx = native_topk_ip(corpus, queries, 16)
        for row in idx:
            firsts = {}
            for rank, j in enumerate(row):
                pair = j % 64
                if pair in firsts:
                    assert row[firsts[pair]] == pair  # lower copy came first
                else:
                    firsts[pair] = rank

    def test_k_clamped(self):
        corpus = np.random.randn(5, 8).astype(np.float32)
        queries = np.random.randn(2, 8).astype(np.float32)
        s, i = native_topk_ip(corpus, queries, 100)
        assert s.shape == (2, 5)

    def test_multithreaded_matches_single(self):
        rng = np.random.RandomState(3)
        corpus = rng.randn(2000, 32).astype(np.float32)
        queries = rng.randn(64, 32).astype(np.float32)
        s1, i1 = native_topk_ip(corpus, queries, 20, n_threads=1)
        s8, i8 = native_topk_ip(corpus, queries, 20, n_threads=8)
        np.testing.assert_array_equal(i1, i8)
        np.testing.assert_array_equal(s1, s8)


class TestNativePad:
    def test_matches_python_padding(self):
        seqs = [[1, 2, 3], [4], [5, 6, 7, 8, 9], []]
        ids, mask = native_pad_batch(seqs, target=4, pad_id=0)
        assert ids.tolist() == [
            [1, 2, 3, 0], [4, 0, 0, 0], [5, 6, 7, 8], [0, 0, 0, 0]
        ]
        assert mask.tolist() == [
            [1, 1, 1, 0], [1, 0, 0, 0], [1, 1, 1, 1], [0, 0, 0, 0]
        ]


class TestNativeScan:
    def test_offsets(self, tmp_path):
        rows = [{"a": i} for i in range(5)]
        path = tmp_path / "x.jsonl"
        text = "\n".join(json.dumps(r) for r in rows) + "\n"
        path.write_text(text)
        offsets = native_scan_jsonl(str(path))
        assert len(offsets) == 6
        raw = text.encode()
        for i in range(5):
            line = raw[offsets[i]:offsets[i + 1]].decode().strip()
            assert json.loads(line) == rows[i]
