"""Sequence packing: the packed encode path must bit-match (to fp tolerance)
running each text alone — positions, attention, pooling, normalization.

Reference behavior being replaced: per-batch padding to the max length
(src/data_utils.py:62-71, src/modeling.py:509-518); packing is the
TPU-native anti-padding design (see rankpo_tpu/data/packing.py).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankpo_tpu.data.packing import (
    PackedRows,
    occupancy,
    pack_lengths,
    pack_token_lists,
)
from rankpo_tpu.models import (
    encoder as enc,
    init_params,
    tiny_llama_config,
    tiny_roberta_config,
)
from rankpo_tpu.models.packing import packed_pool, packed_positions


class TestPackLengths:
    def test_every_item_placed_once(self):
        rng = np.random.RandomState(0)
        lengths = rng.randint(1, 65, size=200)
        bins = pack_lengths(lengths, capacity=128, max_segments=8)
        placed = sorted(i for b in bins for i in b)
        assert placed == list(range(200))

    def test_capacity_and_segment_caps_respected(self):
        rng = np.random.RandomState(1)
        lengths = rng.randint(1, 33, size=300)
        bins = pack_lengths(lengths, capacity=64, max_segments=3)
        for b in bins:
            assert len(b) <= 3
            assert sum(int(lengths[i]) for i in b) <= 64

    def test_rejects_oversized_and_empty(self):
        with pytest.raises(ValueError, match="exceeds pack capacity"):
            pack_lengths([10, 200], capacity=128, max_segments=8)
        with pytest.raises(ValueError, match="empty"):
            pack_lengths([10, 0], capacity=128, max_segments=8)

    def test_occupancy_beats_padding(self):
        # mixed lengths: padding-to-max wastes >60%, packing stays >90%
        rng = np.random.RandomState(2)
        ids = [list(range(L)) for L in rng.randint(8, 120, size=500)]
        packed = pack_token_lists(ids, capacity=128, max_segments=16, pad_id=0)
        assert occupancy(packed) > 0.9

    def test_deterministic(self):
        lengths = [17, 3, 64, 64, 5, 31, 8, 8]
        a = pack_lengths(lengths, 64, 4)
        b = pack_lengths(lengths, 64, 4)
        assert a == b


class TestPackTokenLists:
    def test_layout_and_text_index(self):
        ids = [[7, 8, 9], [1, 2], [3, 4, 5, 6]]
        packed = pack_token_lists(ids, capacity=6, max_segments=4, pad_id=0)
        # every text appears exactly once, contiguous, with its own segment id
        seen = set()
        for r in range(packed.n_rows):
            for j in range(packed.max_segments):
                t = int(packed.text_index[r, j])
                if t < 0:
                    continue
                seen.add(t)
                pos = np.where(packed.segment_ids[r] == j + 1)[0]
                np.testing.assert_array_equal(
                    packed.input_ids[r, pos], np.asarray(ids[t])
                )
                assert np.all(np.diff(pos) == 1)  # contiguous
        assert seen == {0, 1, 2}
        # pad tail is 0-segment
        assert np.all(packed.input_ids[packed.segment_ids == 0] == 0)


class TestPackedPositions:
    def test_restart_per_segment(self):
        seg = jnp.asarray([[1, 1, 1, 2, 2, 3, 0, 0]], jnp.int32)
        pos = packed_positions(seg)
        np.testing.assert_array_equal(
            np.asarray(pos[0]), [0, 1, 2, 0, 1, 0, 0, 1]
        )


class TestPackedPool:
    @pytest.mark.parametrize("mode", ["last_token", "cls", "mean"])
    def test_matches_per_segment(self, mode):
        rng = np.random.RandomState(0)
        hidden = jnp.asarray(rng.randn(1, 10, 4).astype(np.float32))
        seg = jnp.asarray([[1, 1, 1, 2, 2, 2, 2, 3, 0, 0]], jnp.int32)
        reps, valid = packed_pool(hidden, seg, max_segments=4, mode=mode)
        assert valid.tolist() == [[True, True, True, False]]
        spans = [(0, 3), (3, 7), (7, 8)]
        for j, (lo, hi) in enumerate(spans):
            h = np.asarray(hidden[0, lo:hi])
            if mode == "last_token":
                want = h[-1]
            elif mode == "cls":
                want = h[0]
            else:
                want = h.mean(axis=0)
            np.testing.assert_allclose(
                np.asarray(reps[0, j]), want, atol=1e-6,
                err_msg=f"{mode} slot {j}",
            )


def _embed_each(params, cfg, ids_list, **kw):
    """Oracle: encode each text alone (its own batch row, no padding)."""
    out = []
    for ids in ids_list:
        batch = {
            "input_ids": jnp.asarray([ids], jnp.int32),
            "attention_mask": jnp.ones((1, len(ids)), jnp.int32),
        }
        out.append(np.asarray(enc.embed(params, cfg, batch, **kw)[0]))
    return np.stack(out)


@pytest.mark.slow
class TestEmbedPacked:
    """embed_packed == embed per text: positions (RoPE / learned absolute),
    block-diagonal attention, per-segment pooling, L2-normalize."""

    def _ids(self, rng, n, vocab, lens):
        return [list(rng.randint(5, vocab, size=L)) for L in lens]

    @pytest.mark.parametrize("attn_impl", ["xla", "flash"])
    def test_llama_last_token(self, attn_impl):
        cfg = tiny_llama_config(vocab_size=64)
        params = init_params(jax.random.key(0), cfg)
        rng = np.random.RandomState(0)
        ids_list = self._ids(rng, 5, 64, [9, 17, 4, 30, 12])
        packed = pack_token_lists(ids_list, capacity=48, max_segments=4,
                                  pad_id=0)
        reps, valid = enc.embed_packed(
            params, cfg,
            {"input_ids": jnp.asarray(packed.input_ids),
             "segment_ids": jnp.asarray(packed.segment_ids)},
            packed.max_segments,
            compute_dtype=jnp.float32, attn_impl=attn_impl,
        )
        want = _embed_each(params, cfg, ids_list,
                           compute_dtype=jnp.float32, attn_impl="xla")
        got = np.zeros_like(want)
        for r in range(packed.n_rows):
            for j in range(packed.max_segments):
                t = int(packed.text_index[r, j])
                if t >= 0:
                    assert bool(valid[r, j])
                    got[t] = np.asarray(reps[r, j])
        np.testing.assert_allclose(got, want, atol=2e-4)

    @pytest.mark.parametrize("pooling", ["cls", "mean"])
    def test_roberta(self, pooling):
        cfg = dataclasses.replace(tiny_roberta_config(64), pooling=pooling)
        params = init_params(jax.random.key(1), cfg)
        rng = np.random.RandomState(1)
        ids_list = self._ids(rng, 4, 64, [6, 21, 13, 3])
        packed = pack_token_lists(ids_list, capacity=32, max_segments=3,
                                  pad_id=cfg.pad_token_id or 1)
        reps, valid = enc.embed_packed(
            params, cfg,
            {"input_ids": jnp.asarray(packed.input_ids),
             "segment_ids": jnp.asarray(packed.segment_ids)},
            packed.max_segments,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        want = _embed_each(params, cfg, ids_list,
                           compute_dtype=jnp.float32, attn_impl="xla")
        for r in range(packed.n_rows):
            for j in range(packed.max_segments):
                t = int(packed.text_index[r, j])
                if t >= 0:
                    np.testing.assert_allclose(
                        np.asarray(reps[r, j]), want[t], atol=2e-4,
                        err_msg=f"text {t}",
                    )

    def test_empty_slots_are_zero(self):
        cfg = tiny_llama_config(vocab_size=64)
        params = init_params(jax.random.key(0), cfg)
        packed = pack_token_lists([[5, 6, 7]], capacity=16, max_segments=2,
                                  pad_id=0)
        reps, valid = enc.embed_packed(
            params, cfg,
            {"input_ids": jnp.asarray(packed.input_ids),
             "segment_ids": jnp.asarray(packed.segment_ids)},
            2, compute_dtype=jnp.float32,
        )
        assert not bool(valid[0, 1])
        assert float(jnp.abs(reps[0, 1]).max()) == 0.0


class TestEncodePacked:
    """InferenceEncoder.encode_packed vs encode: same embeddings, input
    order restored, variable text counts / chunk boundaries."""

    def _encoder(self, mesh=None):
        from rankpo_tpu.data.tokenization import HashTokenizer
        from rankpo_tpu.index.encoding import InferenceEncoder

        cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(0), cfg)
        tok = HashTokenizer(vocab_size=256)
        return InferenceEncoder(
            cfg, params, tok, mesh=mesh, compute_dtype=jnp.float32,
            length_multiple=8,
        )

    def test_matches_unpacked(self):
        e = self._encoder()
        rng = np.random.RandomState(0)
        texts = [
            "word " * int(n) + f"tail{i}"
            for i, n in enumerate(rng.randint(1, 40, size=37))
        ]
        base = e.encode(texts, batch_size=8, max_length=48)
        packed = e.encode_packed(texts, max_length=48, tokens_per_batch=512)
        np.testing.assert_allclose(packed, base, atol=2e-4)

    def test_chunk_boundaries(self):
        e = self._encoder()
        texts = [f"text {i} " + "pad " * (i % 7) for i in range(23)]
        base = e.encode(texts, batch_size=8, max_length=32)
        packed = e.encode_packed(
            texts, max_length=32, tokens_per_batch=256, pack_chunk=10,
        )
        np.testing.assert_allclose(packed, base, atol=2e-4)

    def test_empty_and_validation(self):
        e = self._encoder()
        assert e.encode_packed([], max_length=16).shape[0] == 0
        with pytest.raises(ValueError, match="list of texts"):
            e.encode_packed("just one string", max_length=16)

    def test_mesh_sharded(self):
        from rankpo_tpu.core.mesh import make_mesh

        mesh = make_mesh()
        e = self._encoder(mesh=mesh)
        texts = [f"sharded doc {i} " + "x " * (i % 11) for i in range(19)]
        base = e.encode(texts, batch_size=8, max_length=32)
        packed = e.encode_packed(texts, max_length=32, tokens_per_batch=512)
        np.testing.assert_allclose(packed, base, atol=2e-4)


@pytest.mark.slow
class TestPackedTraining:
    """PackedContrastiveCollator + the packed loss path vs the plain
    collator + plain path on the SAME sampled examples (same seed): loss,
    accuracy, and parameter gradients must match."""

    def _rows(self, rng, n, vocab=64, n_neg=2):
        def text(lo, hi):
            return list(rng.randint(5, vocab, size=rng.randint(lo, hi)))

        return [
            {
                "query": text(3, 12),
                "positives": [text(4, 20) for _ in range(2)],
                "negatives": [text(4, 20) for _ in range(4)],
            }
            for _ in range(n)
        ]

    def test_loss_and_grads_match(self):
        from rankpo_tpu.data.collators import ContrastiveCollator
        from rankpo_tpu.data.packing import PackedContrastiveCollator
        from rankpo_tpu.train.steps import make_contrastive_loss_fn

        cfg = tiny_llama_config(vocab_size=64)
        params = init_params(jax.random.key(0), cfg)
        rng = np.random.RandomState(0)
        rows = self._rows(rng, 4)

        plain = ContrastiveCollator(
            pad_token_id=0, num_negatives=2,
            max_query_length=16, max_passage_length=24,
        )
        packed = PackedContrastiveCollator(
            pad_token_id=0, num_negatives=2,
            max_query_length=16, max_passage_length=24,
            query_max_segments=4, passage_max_segments=4,
        )
        b_plain = plain(rows)
        b_packed = packed(rows)
        # identical sampling (same seeded RNG contract)
        loss_fn = make_contrastive_loss_fn(
            cfg, temperature=0.05, compute_dtype=jnp.float32,
        )

        def as_jnp(b):
            return jax.tree_util.tree_map(jnp.asarray, b)

        (l0, m0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(
            params, as_jnp(b_plain), None
        )
        (l1, m1), g1 = jax.value_and_grad(loss_fn, has_aux=True)(
            params, as_jnp(b_packed), None
        )
        np.testing.assert_allclose(float(l0), float(l1), atol=1e-5)
        np.testing.assert_allclose(
            float(m0["accuracy"]), float(m1["accuracy"]), atol=1e-6
        )
        flat0 = jax.tree_util.tree_leaves(g0)
        flat1 = jax.tree_util.tree_leaves(g1)
        for a, b in zip(flat0, flat1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4
            )

    def test_sticky_row_budget(self):
        from rankpo_tpu.data.packing import PackedContrastiveCollator

        rng = np.random.RandomState(1)
        coll = PackedContrastiveCollator(
            pad_token_id=0, num_negatives=2,
            max_query_length=16, max_passage_length=24,
            query_max_segments=4, passage_max_segments=4,
        )
        shapes = set()
        for _ in range(5):
            b = coll(self._rows(rng, 4))
            shapes.add(
                (b["query"]["input_ids"].shape, b["passage"]["input_ids"].shape)
            )
        # steady state: one compiled step shape, or at most one overflow
        # variant (small batches take no slack row — see _BlockPacker)
        assert len(shapes) <= 2

    def test_fixed_budget_and_slot_offset(self):
        """Multi-process mode: a fixed budget never changes the row count —
        small batches pad, overflow batches truncate-to-fit deterministically
        — and slot_offset shifts slot tables to global positions."""
        from rankpo_tpu.data.packing import _BlockPacker

        p = _BlockPacker(capacity=16, max_segments=4, pad_id=0)
        p.set_budget(3)
        p.slot_offset = 10
        rng = np.random.RandomState(0)

        # small batch: padded up to exactly 3 rows
        small = p([[1, 2, 3], [4, 5]])
        assert small["input_ids"].shape[0] == 3
        used = small["slot_index"][small["slot_index"] >= 0]
        assert sorted(used.tolist()) == [10, 11]  # offset applied
        assert (small["slot_index"] >= 0).sum() == 2

        # overflow batch: 8 texts of 15 tokens need 8 rows; budget 3 forces
        # truncation, but ALL texts stay present at exactly 3 rows
        big = [[int(x) for x in rng.randint(1, 9, size=15)] for _ in range(8)]
        out = p(big)
        assert out["input_ids"].shape[0] == 3
        used = sorted(out["slot_index"][out["slot_index"] >= 0].tolist())
        assert used == list(range(10, 18))
        assert p.n_truncated == 1
        # deterministic: same inputs, same layout
        out2 = p(big)
        np.testing.assert_array_equal(out["input_ids"], out2["input_ids"])

        # impossible budget (more texts than slots) is a clear error
        p2 = _BlockPacker(capacity=16, max_segments=2, pad_id=0)
        p2.set_budget(1)
        with pytest.raises(ValueError, match="cannot hold"):
            p2([[1]] * 5)

    def test_probe_needs_leaves_rng_untouched(self):
        from rankpo_tpu.data.packing import PackedContrastiveCollator

        rng = np.random.RandomState(3)
        rows = self._rows(rng, 4)
        a = PackedContrastiveCollator(
            pad_token_id=0, num_negatives=2,
            max_query_length=16, max_passage_length=24, seed=5,
        )
        b = PackedContrastiveCollator(
            pad_token_id=0, num_negatives=2,
            max_query_length=16, max_passage_length=24, seed=5,
        )
        needs = a.probe_needs(rows)
        assert all(n >= 1 for n in needs)
        ba = a(rows)
        bb = b(rows)  # b never probed; identical sampling => identical batch
        np.testing.assert_array_equal(
            ba["passage"]["input_ids"], bb["passage"]["input_ids"]
        )

    def test_loader_stacks_overflow_groups(self):
        from rankpo_tpu.data.loader import _stack_microbatches

        a = {"x": {"input_ids": np.zeros((2, 4), np.int32),
                   "slot_index": np.zeros((2, 3), np.int32)}}
        b = {"x": {"input_ids": np.ones((4, 4), np.int32),
                   "slot_index": np.ones((4, 3), np.int32)}}
        stacked = jax.tree_util.tree_map_with_path(_stack_microbatches, a, b)
        assert stacked["x"]["input_ids"].shape == (2, 4, 4)
        assert stacked["x"]["slot_index"].shape == (2, 4, 3)
        # padded rows: ids filled 0, slot_index filled -1
        assert np.all(stacked["x"]["input_ids"][0, 2:] == 0)
        assert np.all(stacked["x"]["slot_index"][0, 2:] == -1)


@pytest.mark.slow
class TestPackedRankPO:
    def test_loss_matches_unpacked(self):
        from rankpo_tpu.data.collators import RankPOCollator
        from rankpo_tpu.data.packing import PackedRankPOCollator
        from rankpo_tpu.train.steps import make_rankpo_loss_fn

        cfg = tiny_llama_config(vocab_size=64)
        params = init_params(jax.random.key(0), cfg)
        rng = np.random.RandomState(2)

        def text(lo, hi):
            return list(rng.randint(5, 64, size=rng.randint(lo, hi)))

        rows = [
            {"query": text(3, 10), "chosen": text(4, 20),
             "rejected": text(4, 20)}
            for _ in range(3)
        ]
        plain = RankPOCollator(
            pad_token_id=0, max_query_length=16, max_passage_length=24,
        )
        packed = PackedRankPOCollator(
            pad_token_id=0, max_query_length=16, max_passage_length=24,
            query_max_segments=4, passage_max_segments=4,
        )
        loss_fn = make_rankpo_loss_fn(
            cfg, beta=2.0, temperature=0.1, compute_dtype=jnp.float32,
        )

        def run(batch):
            b = jax.tree_util.tree_map(jnp.asarray, batch)
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, b, None)
            return float(loss), metrics, grads

        l0, m0, g0 = run(plain(rows))
        l1, m1, g1 = run(packed(rows))
        np.testing.assert_allclose(l0, l1, atol=1e-5)
        np.testing.assert_allclose(
            float(m0["rewards/accuracies"]), float(m1["rewards/accuracies"]),
            atol=1e-6,
        )
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
