"""Dual-use text encoder: one apply path serves training and inference.

TPU-native analog of the reference's ``ModelForTraining.embed`` /
``ModelForInference.encode`` pair (src/modeling.py:206-238, 473-554): backbone
forward → pooling (last-token / CLS / mean) → optional L2 normalize. Both the
train step and the index/eval/mining paths call :func:`embed`, so there is a
single source of truth for the embedding semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from rankpo_tpu.models import llama, roberta
from rankpo_tpu.models.config import EncoderConfig
from rankpo_tpu.models.pooling import l2_normalize, pool


def init_params(key: jax.Array, config: EncoderConfig, dtype=jnp.float32) -> dict:
    if config.is_llama:
        return llama.init_params(key, config, dtype)
    return roberta.init_params(key, config, dtype)


def forward_hidden(
    params: dict,
    config: EncoderConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    *,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    remat_policy: str = "full",
    deterministic: bool = True,
    dropout_key: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    mesh=None,
    segment_ids: Optional[jax.Array] = None,
) -> jax.Array:
    if config.is_llama:
        return llama.apply(
            params,
            config,
            input_ids,
            attention_mask,
            compute_dtype=compute_dtype,
            remat=remat,
            remat_policy=remat_policy,
            attn_impl=attn_impl,
            mesh=mesh,
            segment_ids=segment_ids,
        )
    return roberta.apply(
        params,
        config,
        input_ids,
        attention_mask,
        compute_dtype=compute_dtype,
        remat=remat,
        remat_policy=remat_policy,
        deterministic=deterministic,
        dropout_key=dropout_key,
        attn_impl=attn_impl,
        mesh=mesh,
        segment_ids=segment_ids,
    )


def embed(
    params: dict,
    config: EncoderConfig,
    batch: Dict[str, jax.Array],
    *,
    normalize: Optional[bool] = None,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    remat_policy: str = "full",
    deterministic: bool = True,
    dropout_key: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    mesh=None,
    output_dtype=jnp.float32,
) -> jax.Array:
    """Sentence embeddings [B, H] for {'input_ids', 'attention_mask'} inputs.

    Pooling rule comes from config (reference dispatch src/modeling.py:224-232);
    normalize defaults to config.normalize (src/modeling.py:235-236).
    """
    if normalize is None:
        normalize = config.normalize
    hidden = forward_hidden(
        params,
        config,
        batch["input_ids"],
        batch["attention_mask"],
        compute_dtype=compute_dtype,
        remat=remat,
        remat_policy=remat_policy,
        deterministic=deterministic,
        dropout_key=dropout_key,
        attn_impl=attn_impl,
        mesh=mesh,
    )
    reps = pool(hidden, batch["attention_mask"], config.pooling)
    reps = reps.astype(output_dtype)
    if normalize:
        reps = l2_normalize(reps)
    return reps


def embed_packed(
    params: dict,
    config: EncoderConfig,
    batch: Dict[str, jax.Array],
    max_segments: int,
    *,
    normalize: Optional[bool] = None,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    remat_policy: str = "full",
    deterministic: bool = True,
    dropout_key: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    mesh=None,
    output_dtype=jnp.float32,
) -> tuple:
    """Sentence embeddings for SEQUENCE-PACKED inputs.

    ``batch``: {'input_ids' [B, S], 'segment_ids' [B, S]} with several texts
    per row as contiguous segments 1..n and a 0-id pad tail (see
    rankpo_tpu.data.packing). Returns ``(reps [B, max_segments, H],
    valid [B, max_segments])`` — slot j of row b is the embedding of
    segment j+1, bit-matching what :func:`embed` computes for that text
    alone. Invalid slots are zeros.
    """
    if normalize is None:
        normalize = config.normalize
    from rankpo_tpu.models.packing import packed_pool

    hidden = forward_hidden(
        params,
        config,
        batch["input_ids"],
        None,
        compute_dtype=compute_dtype,
        remat=remat,
        remat_policy=remat_policy,
        deterministic=deterministic,
        dropout_key=dropout_key,
        attn_impl=attn_impl,
        mesh=mesh,
        segment_ids=batch["segment_ids"],
    )
    reps, valid = packed_pool(
        hidden, batch["segment_ids"], max_segments, config.pooling
    )
    reps = reps.astype(output_dtype)
    if normalize:
        reps = l2_normalize(reps)
    reps = jnp.where(valid[..., None], reps, 0)
    return reps, valid


def resize_token_embeddings(
    params: dict, config: EncoderConfig, new_size: int, key: Optional[jax.Array] = None
) -> tuple:
    """Grow the vocabulary (reference: run_contrastive.py:132-143 adds 7 special
    tokens and resizes). New rows are initialized to the mean of existing rows
    (modern HF ``mean_resizing`` default) unless a PRNG key is given, in which
    case normal(0.02) init is used."""
    if config.is_llama:
        table = params["embed_tokens"]["weight"]
    else:
        table = params["embeddings"]["word_embeddings"]["weight"]
    old_size, h = table.shape
    if new_size <= old_size:
        new_cfg = dataclasses.replace(config, vocab_size=new_size)
        if new_size < old_size:
            table = table[:new_size]
        new_params = _set_embedding(params, config, table)
        return new_params, new_cfg
    n_new = new_size - old_size
    if key is None:
        new_rows = jnp.broadcast_to(
            jnp.mean(table.astype(jnp.float32), axis=0, keepdims=True), (n_new, h)
        ).astype(table.dtype)
    else:
        new_rows = (jax.random.normal(key, (n_new, h), jnp.float32) * 0.02).astype(
            table.dtype
        )
    table = jnp.concatenate([table, new_rows], axis=0)
    new_params = _set_embedding(params, config, table)
    return new_params, dataclasses.replace(config, vocab_size=new_size)


def _set_embedding(params: dict, config: EncoderConfig, table: jax.Array) -> dict:
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    if config.is_llama:
        params["embed_tokens"] = {"weight": table}
    else:
        params["embeddings"] = dict(params["embeddings"])
        params["embeddings"]["word_embeddings"] = {"weight": table}
    return params
