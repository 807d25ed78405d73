"""Gradient-cache contrastive accumulation: gradients must be IDENTICAL to a
single full-batch InfoNCE step (the whole point), at microbatch memory."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankpo_tpu.data import ContrastiveCollator, ContrastiveDataset, HashTokenizer
from rankpo_tpu.models import init_params, tiny_llama_config
from rankpo_tpu.train import TrainConfig, Trainer, make_contrastive_loss_fn
from rankpo_tpu.train.gradcache import make_contrastive_gradcache_grad_fn


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_llama_config(vocab_size=128)
    params = init_params(jax.random.key(0), cfg)
    tok = HashTokenizer(vocab_size=128)
    rows = [
        {"query": f"topic {i} alpha", "positives": [f"topic {i} beta"],
         "negatives": [f"other {j} {i}" for j in range(4)]}
        for i in range(16)
    ]
    ds = ContrastiveDataset(rows, tok, 8, 8)
    coll = ContrastiveCollator(pad_token_id=0, num_negatives=2,
                               max_query_length=8, max_passage_length=8, seed=0)
    return cfg, params, ds, coll


def _stacked_batch(ds, coll, accum, mb_rows):
    micros = [coll([ds[i] for i in range(a * mb_rows, (a + 1) * mb_rows)])
              for a in range(accum)]
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *micros)


@pytest.mark.slow
class TestGradCache:
    def test_matches_full_batch_gradients(self, setup):
        cfg, params, ds, coll = setup
        accum, mb = 4, 4
        batch = _stacked_batch(ds, coll, accum, mb)

        grad_fn = make_contrastive_gradcache_grad_fn(
            cfg, temperature=0.05, compute_dtype=jnp.float32,
        )
        loss_gc, metrics_gc, grads_gc = jax.jit(grad_fn)(params, batch, None)

        # reference: ONE InfoNCE over the concatenated [accum*B] batch
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), batch
        )
        loss_fn = make_contrastive_loss_fn(
            cfg, temperature=0.05, compute_dtype=jnp.float32,
        )
        (loss_ref, _), grads_ref = jax.value_and_grad(loss_fn, has_aux=True)(
            params, flat, None
        )

        np.testing.assert_allclose(float(loss_gc), float(loss_ref), rtol=1e-5)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(grads_gc),
            jax.tree_util.tree_leaves_with_path(grads_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(pa)}",
            )

    def test_packed_matches_full_batch_gradients(self, setup):
        """Sequence-packed microbatches through the cache: gradients must
        still equal ONE full-batch InfoNCE on the same sampled examples
        (per-chunk packing must not perturb the cross-chunk negative pool)."""
        from rankpo_tpu.data.loader import _stack_microbatches
        from rankpo_tpu.data.packing import PackedContrastiveCollator

        cfg, params, ds, _ = setup
        accum, mb = 4, 4
        # fresh seeded collators: identical example sampling across the two
        # paths (the ContrastiveCollator RNG contract)
        plain_coll = ContrastiveCollator(
            pad_token_id=0, num_negatives=2,
            max_query_length=8, max_passage_length=8, seed=7,
        )
        packed_coll = PackedContrastiveCollator(
            pad_token_id=0, num_negatives=2,
            max_query_length=8, max_passage_length=8,
            query_max_segments=4, passage_max_segments=4, seed=7,
        )
        plain = _stacked_batch(ds, plain_coll, accum, mb)
        micros = [
            packed_coll([ds[i] for i in range(a * mb, (a + 1) * mb)])
            for a in range(accum)
        ]
        packed = jax.tree_util.tree_map_with_path(_stack_microbatches, *micros)

        grad_fn = make_contrastive_gradcache_grad_fn(
            cfg, temperature=0.05, compute_dtype=jnp.float32,
        )
        loss_gc, _, grads_gc = jax.jit(grad_fn)(params, packed, None)

        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), plain
        )
        loss_fn = make_contrastive_loss_fn(
            cfg, temperature=0.05, compute_dtype=jnp.float32,
        )
        (loss_ref, _), grads_ref = jax.value_and_grad(loss_fn, has_aux=True)(
            params, flat, None
        )
        np.testing.assert_allclose(float(loss_gc), float(loss_ref), rtol=1e-5)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(grads_gc),
            jax.tree_util.tree_leaves_with_path(grads_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(pa)}",
            )

    def test_negatives_cross_accumulation(self, setup):
        """The cache loss must differ from per-microbatch accumulation — the
        negative pool is the FULL batch."""
        cfg, params, ds, coll = setup
        accum, mb = 2, 4
        batch = _stacked_batch(ds, coll, accum, mb)
        grad_fn = make_contrastive_gradcache_grad_fn(
            cfg, temperature=0.05, compute_dtype=jnp.float32,
        )
        loss_gc, _, _ = jax.jit(grad_fn)(params, batch, None)

        loss_fn = make_contrastive_loss_fn(
            cfg, temperature=0.05, compute_dtype=jnp.float32,
        )
        per_micro = [
            float(loss_fn(params, jax.tree_util.tree_map(lambda x: x[a], batch),
                          None)[0])
            for a in range(accum)
        ]
        # more negatives -> harder problem -> larger CE than the micro mean
        assert float(loss_gc) > np.mean(per_micro)

    def test_trainer_integration(self, setup, data_mesh, tmp_path):
        cfg, params, ds, coll = setup
        grad_fn = make_contrastive_gradcache_grad_fn(
            cfg, temperature=0.05, compute_dtype=jnp.float32,
        )
        tcfg = TrainConfig(
            output_dir=str(tmp_path), learning_rate=1e-3, warmup_ratio=0.0,
            lr_scheduler_type="constant", per_device_train_batch_size=1,
            gradient_accumulation_steps=2, num_train_epochs=2,
            save_strategy="no",
        )
        trainer = Trainer(
            loss_fn=lambda p, b, r: (jnp.float32(0), {}),  # unused
            grad_fn=grad_fn, params=params, mesh=data_mesh, config=tcfg,
            total_steps=4,
        )
        history = trainer.train(ds, coll)
        assert history[-1]["loss"] < history[0]["loss"]
        assert "accuracy" in history[0]
