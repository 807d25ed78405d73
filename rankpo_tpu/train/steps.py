"""Loss-function builders for the two training stages.

These produce pure ``loss_fn(params, batch, rng) -> (loss, metrics)`` closures
consumed by the generic Trainer; the pairing replaces the reference's two
Trainer forks (src/contrastive_trainer.py, src/rankpo_trainer.py) with one
train loop and two loss functions.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from rankpo_tpu.losses.contrastive import (
    info_nce_block_loss,
    info_nce_loss,
    validate_temperature,
)
from rankpo_tpu.losses.rankpo import rankpo_batch_loss
from rankpo_tpu.models import encoder as enc
from rankpo_tpu.models.config import EncoderConfig


def _embed_field(params, model_config, block, **kwargs):
    """Embed one batch field (query or passage block), packed or plain.

    Packed blocks (data/packing.py collators: 'segment_ids' + 'slot_index'
    + shape-carrier 'slots') run the block-diagonal packed forward, then
    scatter per-segment reps back to batch order — same values as the plain
    path on the same texts, minus the pad FLOPs.
    """
    if "segment_ids" in block:
        from rankpo_tpu.models.packing import scatter_packed_reps

        reps, _valid = enc.embed_packed(
            params, model_config, block,
            block["slot_index"].shape[1], **kwargs,
        )
        return scatter_packed_reps(
            reps, block["slot_index"], block["slots"].shape[0]
        )
    return enc.embed(params, model_config, block, **kwargs)


def make_contrastive_loss_fn(
    model_config: EncoderConfig,
    *,
    temperature: float = 0.02,
    use_inbatch_neg: bool = True,
    negatives_cross_device: bool = True,
    normalize_embeddings: bool = True,
    num_data_shards: int = 1,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    remat_policy: str = "full",
    attn_impl: str = "auto",
    mesh=None,
) -> Callable:
    """Contrastive stage (src/modeling.py:254-314 forward + run_contrastive.py).

    Runs on GLOBAL batch arrays under jit; ``negatives_cross_device`` selects
    full-batch InfoNCE (GSPMD all-gathers passages over the data axis) vs
    per-device-block InfoNCE (no collective). The reference's temperature
    guards (modeling.py:186-191) are applied at build time.
    """
    temperature = validate_temperature(normalize_embeddings, temperature)

    def _embed_block(params, block, drop, rng):
        return _embed_field(
            params,
            model_config,
            block,
            normalize=normalize_embeddings,
            compute_dtype=compute_dtype,
            remat=remat,
            remat_policy=remat_policy,
            deterministic=rng is None,
            dropout_key=drop,
            attn_impl=attn_impl,
            mesh=mesh,
        )

    def loss_fn(params, batch, rng):
        drop_q, drop_p = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        q_reps = _embed_block(params, batch["query"], drop_q, rng)
        p_reps = _embed_block(params, batch["passage"], drop_p, rng)
        b = q_reps.shape[0]
        group_size = p_reps.shape[0] // b
        row_valid = batch.get("row_valid")  # static-shape eval padding mask
        if use_inbatch_neg and not negatives_cross_device and num_data_shards > 1:
            loss, scores = info_nce_block_loss(
                q_reps,
                p_reps,
                num_blocks=num_data_shards,
                temperature=temperature,
                row_valid=row_valid,
            )
            bw = b // num_data_shards
            targets = (jnp.arange(b) % bw) * group_size
        else:
            loss, scores = info_nce_loss(
                q_reps,
                p_reps,
                temperature=temperature,
                use_inbatch_neg=use_inbatch_neg,
                row_valid=row_valid,
            )
            targets = (
                jnp.arange(b) * group_size
                if use_inbatch_neg
                else jnp.zeros(b, jnp.int32)
            )
        hits = (jnp.argmax(scores, axis=-1) == targets).astype(jnp.float32)
        if row_valid is None:
            accuracy = jnp.mean(hits)
        else:
            w = row_valid.astype(jnp.float32)
            accuracy = jnp.sum(hits * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, {"accuracy": accuracy}

    return loss_fn


def make_rankpo_loss_fn(
    model_config: EncoderConfig,
    *,
    beta: float = 1.0,
    gamma_beta_ratio: float = 0.0,
    temperature: float = 0.02,
    loss_type: str = "sigmoid",
    label_smoothing: float = 0.0,
    rankpo_weight: float = 1.0,
    sft_weight: float = 0.0,
    reference_free: bool = True,
    ref_params=None,
    disable_dropout: bool = True,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    remat_policy: str = "full",
    attn_impl: str = "auto",
    mesh=None,
) -> Callable:
    """RankPO stage (src/rankpo_trainer.py:447-568).

    Faithful quirk: the reference RankPO forward ALWAYS L2-normalizes
    (rankpo_trainer.py:417 ignores the normalize_embeddings flag), so scores are
    cosines regardless; we do the same. The frozen reference model, when given,
    is captured in the closure with stop_gradient (replaces the DeepSpeed
    stage-0/3 eval-mode engine of rankpo_trainer.py:295-324).
    """
    if loss_type == "hinge" and label_smoothing > 0:
        import warnings

        # reference behavior (rankpo_trainer.py:215-218): warn and ignore
        warnings.warn(
            "loss_type='hinge' does not support label smoothing; ignoring "
            "label_smoothing"
        )

    def _scores(params, batch, rng, deterministic):
        dq, dp = jax.random.split(rng) if rng is not None else (None, None)
        kwargs = dict(
            normalize=True,
            compute_dtype=compute_dtype,
            remat=remat,
            remat_policy=remat_policy,
            deterministic=deterministic,
            attn_impl=attn_impl,
            mesh=mesh,
        )
        q_reps = _embed_field(
            params, model_config, batch["query"], dropout_key=dq, **kwargs
        )
        p_reps = _embed_field(
            params, model_config, batch["passage"], dropout_key=dp, **kwargs
        )
        b = q_reps.shape[0]
        grouped = p_reps.reshape(b, 2, -1)  # [chosen, rejected] interleaved
        return jnp.einsum(
            "bh,bgh->bg", q_reps, grouped, preferred_element_type=jnp.float32
        )

    def loss_fn(params, batch, rng, frozen=None):
        step_rng = None if disable_dropout else rng
        scores = _scores(params, batch, step_rng, deterministic=disable_dropout)
        ref_scores = None
        ref = (frozen or {}).get("ref") if isinstance(frozen, dict) else None
        if ref is None:
            ref = ref_params  # closure fallback (library use)
        if not reference_free and ref is not None:
            ref_scores = jax.lax.stop_gradient(
                _scores(ref, batch, None, deterministic=True)
            )
        return rankpo_batch_loss(
            scores,
            ref_scores,
            beta=beta,
            gamma_beta_ratio=gamma_beta_ratio,
            temperature=temperature,
            loss_type=loss_type,
            label_smoothing=label_smoothing,
            rankpo_weight=rankpo_weight,
            sft_weight=sft_weight,
            row_valid=batch.get("row_valid"),
        )

    return loss_fn
