"""Data-layer tests: schemas (on the actual reference sample fixtures), collator
semantics (random positive, sampled negatives, interleave, static shapes), and
loader sharding/resume."""

import numpy as np
import pytest

from rankpo_tpu.data import (
    ContrastiveCollator,
    ContrastiveDataset,
    DataLoader,
    HashTokenizer,
    PairPreferenceDataset,
    RankPOCollator,
)
from rankpo_tpu.data.datasets import load_eval_corpus, load_eval_queries, load_mining_rows

REF_TRAIN = "/root/reference/data/train_data-sample.jsonl"
REF_PAIRS = "/root/reference/data/annotated_pair_data-sample.jsonl"


@pytest.fixture(scope="module")
def tok():
    return HashTokenizer(vocab_size=512)


class TestDatasets:
    def test_contrastive_on_reference_fixture(self, tok):
        ds = ContrastiveDataset(REF_TRAIN, tok, max_query_length=16,
                                max_passage_length=24)
        assert len(ds) == 10
        row = ds[0]
        assert isinstance(row["query"], list)
        assert all(len(p) <= 24 for p in row["positives"])
        assert all(len(n) <= 24 for n in row["negatives"])
        assert len(row["query"]) <= 16

    def test_pairs_on_reference_fixture(self, tok):
        ds = PairPreferenceDataset(REF_PAIRS, tok, max_query_length=16,
                                   max_passage_length=24)
        assert len(ds) == 100
        assert set(ds[0]) == {"query", "chosen", "rejected"}

    def test_preferred_ab_rule(self, tok):
        rows = [
            {"query": "q", "passage1": "first text", "passage2": "second text",
             "preferred": "B"},
        ]
        ds = PairPreferenceDataset(rows, tok, 8, 8)
        chosen = ds[0]["chosen"]
        expected = tok("second text", max_length=8, truncation=True)["input_ids"]
        assert chosen == expected

    def test_preferred_invalid_raises(self, tok):
        rows = [{"query": "q", "passage1": "a", "passage2": "b", "preferred": "X"}]
        with pytest.raises(ValueError):
            PairPreferenceDataset(rows, tok, 8, 8)


class TestContrastiveCollator:
    def _rows(self, tok, n=4, n_pos=3, n_neg=8):
        rows = []
        for i in range(n):
            rows.append({
                "query": tok(f"query number {i}", max_length=16, truncation=True)["input_ids"],
                "positives": [
                    tok(f"pos {i} {j} " + "w " * j, max_length=20, truncation=True)["input_ids"]
                    for j in range(n_pos)
                ],
                "negatives": [
                    tok(f"neg {i} {j} " + "x " * j, max_length=20, truncation=True)["input_ids"]
                    for j in range(n_neg)
                ],
            })
        return rows

    def test_shapes_static(self, tok):
        rows = self._rows(tok)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=5,
                                   max_query_length=16, max_passage_length=20)
        batch = coll(rows)
        assert batch["query"]["input_ids"].shape == (4, 16)
        assert batch["passage"]["input_ids"].shape == (4 * 6, 20)
        assert batch["passage"]["attention_mask"].dtype == np.int32
        # right padding: mask is a prefix of ones
        m = batch["passage"]["attention_mask"]
        assert np.all(np.diff(m, axis=1) <= 0)

    def test_group_layout_positive_first(self, tok):
        """Passage block layout must be [pos_i, neg_i...] per example — the
        InfoNCE target rule (arange*G) depends on it."""
        rows = self._rows(tok, n=2, n_pos=1, n_neg=2)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=2,
                                   max_query_length=16, max_passage_length=20)
        batch = coll(rows)
        pos0 = rows[0]["positives"][0]
        got = batch["passage"]["input_ids"][0][: len(pos0)].tolist()
        assert got == pos0

    def test_sampling_without_replacement(self, tok):
        rows = self._rows(tok, n=1, n_pos=1, n_neg=5)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=5,
                                   max_query_length=16, max_passage_length=20)
        batch = coll(rows)
        negs = [tuple(x) for x in batch["passage"]["input_ids"][1:].tolist()]
        assert len(set(negs)) == 5

    def test_zero_negatives_pure_inbatch(self, tok):
        """num_negatives=0: group size 1, pure in-batch negatives — a valid
        configuration the loss must handle (targets = arange)."""
        rows = self._rows(tok, n=3, n_pos=1, n_neg=2)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=0,
                                   max_query_length=16, max_passage_length=20)
        batch = coll(rows)
        assert batch["passage"]["input_ids"].shape[0] == 3  # 1 positive each

        import jax.numpy as jnp
        from rankpo_tpu.losses import info_nce_loss
        import numpy as _np
        q = jnp.asarray(_np.random.RandomState(0).randn(3, 4), jnp.float32)
        p = jnp.asarray(_np.random.RandomState(1).randn(3, 4), jnp.float32)
        loss, scores = info_nce_loss(q, p, temperature=0.1)
        assert scores.shape == (3, 3)
        assert bool(jnp.isfinite(loss))

    def test_too_few_negatives_raises(self, tok):
        rows = self._rows(tok, n=1, n_neg=2)
        coll = ContrastiveCollator(num_negatives=5, max_passage_length=20)
        with pytest.raises(ValueError):
            coll(rows)

    def test_seeded_reproducibility(self, tok):
        rows = self._rows(tok)
        a = ContrastiveCollator(num_negatives=3, max_query_length=16,
                                max_passage_length=20, seed=7)(rows)
        b = ContrastiveCollator(num_negatives=3, max_query_length=16,
                                max_passage_length=20, seed=7)(rows)
        np.testing.assert_array_equal(a["passage"]["input_ids"],
                                      b["passage"]["input_ids"])

    def test_pad_multiple_bucketing(self, tok):
        rows = self._rows(tok)
        coll = ContrastiveCollator(num_negatives=2, max_query_length=128,
                                   max_passage_length=128, pad_multiple=16)
        batch = coll(rows)
        assert batch["query"]["input_ids"].shape[1] % 16 == 0
        assert batch["passage"]["input_ids"].shape[1] % 16 == 0


class TestRankPOCollator:
    def test_interleave_chosen_rejected(self, tok):
        rows = [
            {"query": [1, 2], "chosen": [3, 4], "rejected": [5]},
            {"query": [6], "chosen": [7], "rejected": [8, 9, 10]},
        ]
        batch = RankPOCollator(pad_token_id=0, max_query_length=4,
                               max_passage_length=4)(rows)
        ids = batch["passage"]["input_ids"]
        assert ids.shape == (4, 4)
        assert ids[0].tolist()[:2] == [3, 4]   # chosen of row 0
        assert ids[1].tolist()[:1] == [5]      # rejected of row 0
        assert ids[2].tolist()[:1] == [7]      # chosen of row 1
        assert ids[3].tolist()[:3] == [8, 9, 10]

    def test_missing_key_raises(self):
        with pytest.raises(KeyError):
            RankPOCollator()([{"query": [1], "chosen": [2]}])


class TestLoader:
    def _ds(self, tok, n=32):
        rows = [
            {"query": f"q {i}", "positives": [f"p {i}"], "negatives": [f"n {i} {j}" for j in range(6)]}
            for i in range(n)
        ]
        return ContrastiveDataset(rows, tok, 8, 8)

    def test_epoch_covers_all_and_shards(self, tok):
        ds = self._ds(tok)
        coll = ContrastiveCollator(num_negatives=2, max_query_length=8,
                                   max_passage_length=8)
        seen = []
        for pi in range(4):
            dl = DataLoader(ds, coll, batch_size=8, seed=1, process_index=pi,
                            process_count=4)
            n_batches = 0
            for batch in dl.epoch(0):
                assert batch["query"]["input_ids"].shape[0] == 2  # local batch
                n_batches += 1
            assert n_batches == 4
        # determinism: same epoch order across processes
        dl_a = DataLoader(ds, coll, batch_size=8, seed=1)
        dl_b = DataLoader(ds, coll, batch_size=8, seed=1)
        np.testing.assert_array_equal(dl_a._epoch_order(3), dl_b._epoch_order(3))
        assert not np.array_equal(dl_a._epoch_order(0), dl_a._epoch_order(1))

    def test_resume_skips_batches(self, tok):
        ds = self._ds(tok)
        coll = ContrastiveCollator(num_negatives=2, max_query_length=8,
                                   max_passage_length=8, seed=3)
        dl = DataLoader(ds, coll, batch_size=8, seed=1)
        full = list(dl.epoch(0))
        coll.rng = np.random.default_rng(3)  # reset collator RNG for comparison
        resumed = list(dl.epoch(0, start_step=2))
        assert len(resumed) == len(full) - 2
        np.testing.assert_array_equal(
            full[2]["query"]["input_ids"], resumed[0]["query"]["input_ids"]
        )

    def test_drop_last(self, tok):
        ds = self._ds(tok, n=30)
        coll = ContrastiveCollator(num_negatives=2, max_query_length=8,
                                   max_passage_length=8)
        dl = DataLoader(ds, coll, batch_size=8, drop_last=True)
        assert dl.steps_per_epoch() == 3


class TestEvalSchemas:
    def test_eval_and_mining_schemas(self, tmp_path):
        import json
        qf = tmp_path / "q.jsonl"
        cf = tmp_path / "c.jsonl"
        qf.write_text(json.dumps({
            "query": {"text": "hello"}, "positives": {"index": [0, 2]}
        }) + "\n")
        cf.write_text("\n".join(json.dumps({"text": t}) for t in ["a", "b", "c"]))
        queries, labels = load_eval_queries(str(qf))
        assert queries == ["hello"] and labels == [[0, 2]]
        assert load_eval_corpus(str(cf)) == ["a", "b", "c"]

        mf = tmp_path / "m.jsonl"
        mf.write_text(json.dumps({
            "query": {"text": "q1"},
            "positives": {"text": ["p1", "p2"]},
            "negatives": {"text": ["n1", "p1"]},
        }) + "\n")
        rows, queries, corpus = load_mining_rows(str(mf))
        assert rows[0]["positives"] == ["p1", "p2"]
        assert corpus == ["p1", "p2", "n1"]  # deduped, order-preserving


class TestHFDatasetsInput:
    def test_contrastive_accepts_hf_dataset(self, tok):
        """The reference loads via datasets.load_dataset('json'); our readers
        accept any iterable of row dicts, so an HF Dataset drops straight in."""
        datasets = pytest.importorskip("datasets")
        rows = [
            {"query": f"q {i}", "positives": [f"p {i}"],
             "negatives": [f"n {i} {j}" for j in range(3)]}
            for i in range(4)
        ]
        hf_ds = datasets.Dataset.from_list(rows)
        ds = ContrastiveDataset(hf_ds, tok, 8, 8)
        assert len(ds) == 4
        assert isinstance(ds[0]["query"], list)


class TestStreamingDataset:
    def test_matches_eager(self, tok, tmp_path):
        import json as _json
        from rankpo_tpu.data import StreamingContrastiveDataset

        rows = [
            {"query": f"q {i}", "positives": [f"p {i} a", f"p {i} b"],
             "negatives": [f"n {i} {j}" for j in range(4)]}
            for i in range(12)
        ]
        path = tmp_path / "stream.jsonl"
        path.write_text("\n".join(_json.dumps(r) for r in rows))
        eager = ContrastiveDataset(str(path), tok, 8, 8)
        lazy = StreamingContrastiveDataset(str(path), tok, 8, 8)
        assert len(lazy) == len(eager) == 12
        for i in (0, 5, 11):
            assert lazy[i] == eager[i]

    def test_works_with_loader_and_collator(self, tok, tmp_path):
        import json as _json
        from rankpo_tpu.data import StreamingContrastiveDataset

        rows = [
            {"query": f"q {i}", "positives": [f"p {i}"],
             "negatives": [f"n {i} {j}" for j in range(4)]}
            for i in range(16)
        ]
        path = tmp_path / "s2.jsonl"
        path.write_text("\n".join(_json.dumps(r) for r in rows))
        ds = StreamingContrastiveDataset(str(path), tok, 8, 8)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=2,
                                   max_query_length=8, max_passage_length=8)
        dl = DataLoader(ds, coll, batch_size=8)
        batches = list(dl.epoch(0))
        assert len(batches) == 2
        assert batches[0]["passage"]["input_ids"].shape == (24, 8)


def test_loader_abandoned_epoch_releases_producer_thread():
    """Abandoning epoch() mid-iteration (max_steps, preemption) must stop the
    producer thread instead of leaving it blocked on the bounded queue."""
    import threading
    import time as _time

    from rankpo_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return i

    def collator(rows):
        return {"x": np.asarray(rows, np.int32)}

    before = threading.active_count()
    loader = DataLoader(DS(), collator, batch_size=4, shuffle=False,
                        drop_last=True, prefetch=1)
    it = loader.epoch(0)
    next(it)
    it.close()  # abandon mid-epoch
    deadline = _time.time() + 5
    while _time.time() < deadline and threading.active_count() > before:
        _time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread still alive"


def test_loader_rejects_ragged_stack():
    from rankpo_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return i

    loader = DataLoader(DS(), lambda r: {"x": np.asarray(r)}, batch_size=4,
                        shuffle=False, drop_last=False)
    with pytest.raises(ValueError, match="drop_last"):
        next(loader.epoch(0, stack=2))
