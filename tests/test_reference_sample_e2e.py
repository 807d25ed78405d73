"""End-to-end smoke on the REFERENCE's own 10-row sample fixtures
(data/train_data-sample.jsonl, data/annotated_pair_data-sample.jsonl) — the
SURVEY.md §4 integration check: both training stages run on the real data
formats with a tiny randomly-initialized encoder on the 8-device mesh."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankpo_tpu.data import (
    ContrastiveCollator,
    ContrastiveDataset,
    HashTokenizer,
    PairPreferenceDataset,
    RankPOCollator,
)
from rankpo_tpu.models import init_params, tiny_llama_config
from rankpo_tpu.train import (
    TrainConfig,
    Trainer,
    make_contrastive_loss_fn,
    make_rankpo_loss_fn,
)

REF_TRAIN = "/root/reference/data/train_data-sample.jsonl"
REF_PAIRS = "/root/reference/data/annotated_pair_data-sample.jsonl"


@pytest.fixture(scope="module")
def tok():
    return HashTokenizer(vocab_size=512)


def test_contrastive_stage_on_reference_sample(data_mesh, tmp_path, tok):
    ds = ContrastiveDataset(REF_TRAIN, tok, max_query_length=32,
                            max_passage_length=48)
    assert len(ds) == 10
    model_cfg = tiny_llama_config(vocab_size=512)
    params = init_params(jax.random.key(0), model_cfg)
    loss_fn = make_contrastive_loss_fn(
        model_cfg, temperature=0.02, use_inbatch_neg=True,
        negatives_cross_device=True, compute_dtype=jnp.float32,
    )
    cfg = TrainConfig(
        output_dir=str(tmp_path), learning_rate=1e-3, warmup_ratio=0.0,
        lr_scheduler_type="constant", per_device_train_batch_size=1,
        num_train_epochs=3, save_strategy="no",
    )
    trainer = Trainer(loss_fn=loss_fn, params=params, mesh=data_mesh,
                      config=cfg, total_steps=3)
    coll = ContrastiveCollator(pad_token_id=0, num_negatives=5,
                               max_query_length=32, max_passage_length=48,
                               seed=0)
    history = trainer.train(ds, coll)
    assert len(history) == 3  # 10 rows // 8 global batch = 1 step x 3 epochs
    assert all(np.isfinite(h["loss"]) for h in history)


def test_rankpo_stage_on_reference_sample(data_mesh, tmp_path, tok):
    ds = PairPreferenceDataset(REF_PAIRS, tok, max_query_length=32,
                               max_passage_length=48)
    assert len(ds) == 100
    model_cfg = tiny_llama_config(vocab_size=512)
    params = init_params(jax.random.key(1), model_cfg)
    # paper recipe: reference-free sigmoid, beta=2.0, T=0.1 (README.md:157-164)
    loss_fn = make_rankpo_loss_fn(
        model_cfg, beta=2.0, temperature=0.1, loss_type="sigmoid",
        reference_free=True, compute_dtype=jnp.float32,
    )
    cfg = TrainConfig(
        output_dir=str(tmp_path), learning_rate=1e-3, warmup_ratio=0.0,
        lr_scheduler_type="constant", per_device_train_batch_size=1,
        num_train_epochs=1, save_strategy="no",
    )
    trainer = Trainer(loss_fn=loss_fn, params=params, mesh=data_mesh,
                      config=cfg, total_steps=12)
    coll = RankPOCollator(pad_token_id=0, max_query_length=32,
                          max_passage_length=48)
    history = trainer.train(ds, coll)
    assert len(history) == 12  # 100 // 8
    assert all(np.isfinite(h["loss"]) for h in history)
    assert history[-1]["loss"] < history[0]["loss"]
