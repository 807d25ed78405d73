"""LoRA adapter tests: identity at init, merge math, adapter-only training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankpo_tpu.data import ContrastiveCollator, ContrastiveDataset, HashTokenizer
from rankpo_tpu.models import embed, init_params, tiny_llama_config
from rankpo_tpu.models.lora import (
    LoraConfig,
    count_params,
    init_lora_params,
    make_lora_loss_fn,
    merge_lora,
)
from rankpo_tpu.train import TrainConfig, Trainer, make_contrastive_loss_fn


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_llama_config(vocab_size=128)
    params = init_params(jax.random.key(0), cfg)
    lcfg = LoraConfig(r=4, alpha=8.0)
    lora = init_lora_params(jax.random.key(1), params, lcfg)
    return cfg, params, lcfg, lora


class TestLora:
    def test_identity_at_init(self, setup):
        cfg, params, lcfg, lora = setup
        merged = merge_lora(params, lora, lcfg)
        ids = jax.random.randint(jax.random.key(2), (2, 8), 5, 128)
        mask = jnp.ones((2, 8), jnp.int32)
        a = embed(params, cfg, {"input_ids": ids, "attention_mask": mask},
                  compute_dtype=jnp.float32)
        b = embed(merged, cfg, {"input_ids": ids, "attention_mask": mask},
                  compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_merge_math(self, setup):
        cfg, params, lcfg, lora = setup
        lora = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 0.1, lora)
        merged = merge_lora(params, lora, lcfg)
        w0 = np.asarray(params["layers"]["q_proj"]["kernel"])
        a = np.asarray(lora["q_proj"]["lora_a"])
        b = np.asarray(lora["q_proj"]["lora_b"])
        expected = w0 + lcfg.scaling * np.einsum("lir,lro->lio", a, b)
        np.testing.assert_allclose(
            np.asarray(merged["layers"]["q_proj"]["kernel"]), expected, rtol=1e-5
        )

    def test_param_count_is_small(self, setup):
        cfg, params, lcfg, lora = setup
        assert count_params(lora) < 0.1 * count_params(params)

    def test_unknown_target_raises(self, setup):
        cfg, params, _, _ = setup
        with pytest.raises(ValueError):
            init_lora_params(
                jax.random.key(0), params,
                LoraConfig(target_modules=("nonexistent",)),
            )

    @pytest.mark.slow
    def test_adapter_only_training(self, setup, data_mesh, tmp_path):
        """Trainer over the adapter tree: loss decreases, base stays frozen."""
        cfg, params, lcfg, lora = setup
        inner = make_contrastive_loss_fn(cfg, temperature=0.05,
                                         compute_dtype=jnp.float32)
        loss_fn = make_lora_loss_fn(inner, params, lcfg)
        tok = HashTokenizer(vocab_size=128)
        rows = [
            {"query": f"topic {i}", "positives": [f"topic {i} doc"],
             "negatives": [f"other {j}" for j in range(4)]}
            for i in range(16)
        ]
        ds = ContrastiveDataset(rows, tok, 8, 8)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=2,
                                   max_query_length=8, max_passage_length=8)
        tcfg = TrainConfig(output_dir=str(tmp_path), learning_rate=5e-3,
                           warmup_ratio=0.0, lr_scheduler_type="constant",
                           per_device_train_batch_size=1, num_train_epochs=2,
                           save_strategy="no")
        trainer = Trainer(loss_fn=loss_fn, params=lora, mesh=data_mesh,
                          config=tcfg, total_steps=4)
        history = trainer.train(ds, coll)
        assert history[-1]["loss"] < history[0]["loss"]
        # trained tree is adapters only
        trained = jax.device_get(trainer.state.params)
        assert set(trained) == set(lora)
