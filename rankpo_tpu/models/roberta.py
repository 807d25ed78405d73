"""XLM-Roberta / BGE-family encoder (functional JAX).

Parity target: the reference's non-Llama backbone path ("for BGE-M3/XLMRoberta,
use the first token which is the CLS token", src/modeling.py:231-232;
configs/ds_zero1_config_bge.json). Post-LayerNorm BERT architecture with
learned absolute positions using the Roberta padding-offset rule.

Layers are stacked on a leading axis and scanned (one compiled layer), same as
the llama module. Kernels stored [in, out]; HF import transposes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rankpo_tpu.models.config import EncoderConfig
from rankpo_tpu.ops.attention import multi_head_attention


def _dropout(y: jax.Array, rate: float, key) -> jax.Array:
    if rate == 0.0 or key is None:
        return y
    keep = jax.random.bernoulli(key, 1.0 - rate, y.shape)
    return jnp.where(keep, y / (1.0 - rate), 0.0).astype(y.dtype)


def _attn_dropout_args(config: EncoderConfig, dropout_key, deterministic: bool):
    """(attention-probs rate, attention key, post-block key) — one place so
    the plain and remat-'attn' layer paths cannot drift apart."""
    if dropout_key is None or deterministic:
        return 0.0, None, None
    attn_key, post_key = jax.random.split(dropout_key)
    return config.attention_dropout, attn_key, post_key


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf.astype(dtype) * weight + bias).astype(dtype)


def roberta_position_ids(input_ids: jax.Array, pad_token_id: int) -> jax.Array:
    """Roberta rule: positions count non-pad tokens, offset by padding_idx
    (mirrors transformers create_position_ids_from_input_ids)."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=-1) * mask + pad_token_id


def init_params(key: jax.Array, config: EncoderConfig, dtype=jnp.float32) -> dict:
    h = config.hidden_size
    f = config.intermediate_size
    L = config.num_hidden_layers
    keys = jax.random.split(key, 12)  # 9 consumed; 12 kept for key stability

    def norm(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    def dense_l(kk, shape):
        return {
            "kernel": norm(kk, shape),
            "bias": jnp.zeros((shape[0], shape[-1]), dtype),
        }

    return {
        "embeddings": {
            "word_embeddings": {"weight": norm(keys[0], (config.vocab_size, h))},
            "position_embeddings": {
                "weight": norm(keys[1], (config.max_position_embeddings, h))
            },
            "token_type_embeddings": {
                "weight": norm(keys[2], (config.type_vocab_size, h))
            },
            "layer_norm": {"weight": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
        },
        "layers": {
            "query": dense_l(keys[3], (L, h, h)),
            "key": dense_l(keys[4], (L, h, h)),
            "value": dense_l(keys[5], (L, h, h)),
            "attn_output": dense_l(keys[6], (L, h, h)),
            "attn_layer_norm": {
                "weight": jnp.ones((L, h), dtype),
                "bias": jnp.zeros((L, h), dtype),
            },
            "intermediate": dense_l(keys[7], (L, h, f)),
            "output": dense_l(keys[8], (L, f, h)),
            "output_layer_norm": {
                "weight": jnp.ones((L, h), dtype),
                "bias": jnp.zeros((L, h), dtype),
            },
        },
    }


def _layer_qkv(config: EncoderConfig, x: jax.Array, lp: dict) -> tuple:
    b, s, h = x.shape
    nh = config.num_attention_heads
    d = h // nh
    q = (x @ lp["query"]["kernel"] + lp["query"]["bias"]).reshape(b, s, nh, d)
    k = (x @ lp["key"]["kernel"] + lp["key"]["bias"]).reshape(b, s, nh, d)
    v = (x @ lp["value"]["kernel"] + lp["value"]["bias"]).reshape(b, s, nh, d)
    return q, k, v


def _layer_post(
    config: EncoderConfig,
    x: jax.Array,
    attn: jax.Array,
    lp: dict,
    dropout_key,
    deterministic: bool,
) -> jax.Array:
    b, s, h = x.shape
    eps = config.layer_norm_eps

    def dropout(y, key):
        if deterministic:
            return y
        return _dropout(y, config.hidden_dropout, key)

    k0 = k1 = None
    if dropout_key is not None:
        k0, k1 = jax.random.split(dropout_key)

    attn = attn.reshape(b, s, h) @ lp["attn_output"]["kernel"] + lp["attn_output"]["bias"]
    attn = dropout(attn, k0)
    x = layer_norm(
        x + attn, lp["attn_layer_norm"]["weight"], lp["attn_layer_norm"]["bias"], eps
    )

    pre = x @ lp["intermediate"]["kernel"] + lp["intermediate"]["bias"]
    if config.hidden_act == "gelu":
        inter = jax.nn.gelu(pre, approximate=False)  # HF 'gelu' is the exact erf form
    elif config.hidden_act in ("gelu_new", "gelu_pytorch_tanh"):
        inter = jax.nn.gelu(pre, approximate=True)
    else:
        inter = jax.nn.silu(pre)
    out = inter @ lp["output"]["kernel"] + lp["output"]["bias"]
    out = dropout(out, k1)
    return layer_norm(
        x + out, lp["output_layer_norm"]["weight"], lp["output_layer_norm"]["bias"], eps
    )


def _layer(
    config: EncoderConfig,
    x: jax.Array,
    lp: dict,
    mask: jax.Array,
    dropout_key: Optional[jax.Array],
    deterministic: bool,
    attn_impl: str,
    mesh=None,
    segment_ids=None,
) -> jax.Array:
    q, k, v = _layer_qkv(config, x, lp)
    attn_rate, attn_key, post_key = _attn_dropout_args(
        config, dropout_key, deterministic
    )
    # self-attention with everywhere-masked pad keys: pad q rows are skippable.
    # attention-probs dropout (HF attention_probs_dropout_prob) routes the
    # dispatcher to the XLA path when active
    attn = multi_head_attention(
        q, k, v, mask=mask, causal=False, impl=attn_impl, mesh=mesh,
        skip_pad_q=True, dropout_rate=attn_rate, dropout_key=attn_key,
        segment_ids=segment_ids,
    )
    return _layer_post(config, x, attn, lp, post_key, deterministic)


def apply(
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
    segment_ids=None,
    collect_hidden: bool = False,
) -> jax.Array:
    """Returns last_hidden_state [B, S, H] in compute_dtype.
    ``remat_policy``: see llama.apply; ``segment_ids`` (sequence packing,
    replaces ``attention_mask``): see llama.apply — here the learned
    absolute positions restart per segment (with the Roberta pad offset).
    ``collect_hidden=True`` additionally returns the stacked per-layer
    outputs [L, B, S, H] (here layer i's output == HF ``hidden_states[i+1]``
    exactly — no final norm in the Roberta body)."""
    b, s = input_ids.shape
    emb = params["embeddings"]
    if segment_ids is not None:
        from rankpo_tpu.models.packing import packed_positions

        within = packed_positions(segment_ids)
        if config.model_type == "bert":
            pos_ids = within
        else:
            # Roberta rule per packed text: non-pad token i gets
            # padding_idx + 1 + i (create_position_ids_from_input_ids)
            pad_id = (
                config.pad_token_id if config.pad_token_id is not None else 1
            )
            pos_ids = jnp.where(segment_ids != 0, within + pad_id + 1, pad_id)
    elif config.model_type == "bert":
        # BERT (BGE family): absolute positions are plain arange
        pos_ids = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
    else:
        # Roberta/XLM-R (BGE-M3 family): pad-offset cumulative positions
        pad_id = config.pad_token_id if config.pad_token_id is not None else 1
        pos_ids = roberta_position_ids(input_ids, pad_id)
    x = (
        emb["word_embeddings"]["weight"][input_ids]
        + emb["position_embeddings"]["weight"][pos_ids]
        + emb["token_type_embeddings"]["weight"][jnp.zeros_like(input_ids)]
    ).astype(compute_dtype)
    x = layer_norm(
        x,
        emb["layer_norm"]["weight"].astype(compute_dtype),
        emb["layer_norm"]["bias"].astype(compute_dtype),
        config.layer_norm_eps,
    )
    key_mask = None if segment_ids is not None else attention_mask.astype(bool)

    if dropout_key is not None and not deterministic:
        # HF applies hidden dropout to the embedding output too
        emb_key, dropout_key = jax.random.split(dropout_key)
        x = _dropout(x, config.hidden_dropout, emb_key)

    layer_params = jax.tree_util.tree_map(
        lambda p: p.astype(compute_dtype)
        if jnp.issubdtype(p.dtype, jnp.floating)
        else p,
        params["layers"],
    )

    L = config.num_hidden_layers
    if dropout_key is not None and not deterministic:
        layer_keys = jax.random.split(dropout_key, L)
    else:
        layer_keys = None

    def body(carry, inputs):
        if layer_keys is not None:
            lp, lk = inputs
        else:
            lp, lk = inputs, None
        fn = lambda c, p: _layer(
            config, c, p, key_mask, lk, deterministic, attn_impl, mesh,
            segment_ids,
        )
        if remat:
            if remat_policy not in ("full", "dots", "attn"):
                raise ValueError(
                    f"unknown remat_policy {remat_policy!r}; "
                    "one of ['full', 'dots', 'attn']"
                )
            if remat_policy == "attn":
                # attention outside the checkpointed regions: its VJP
                # residuals are saved, the attention fwd never re-runs
                qkv_fn = jax.checkpoint(lambda c, p: _layer_qkv(config, c, p))
                q, k, v = qkv_fn(carry, lp)
                attn_rate, attn_key, post_key = _attn_dropout_args(
                    config, lk, deterministic
                )
                attn = multi_head_attention(
                    q, k, v, mask=key_mask, causal=False, impl=attn_impl,
                    mesh=mesh, skip_pad_q=True,
                    dropout_rate=attn_rate, dropout_key=attn_key,
                    segment_ids=segment_ids,
                )
                post_fn = jax.checkpoint(
                    lambda c, a, p: _layer_post(
                        config, c, a, p, post_key, deterministic
                    )
                )
                new = post_fn(carry, attn, lp)
                return new, (new if collect_hidden else None)
            kwargs = {}
            if remat_policy == "dots":
                kwargs["policy"] = (
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                )
            fn = jax.checkpoint(fn, **kwargs)
        new = fn(carry, lp)
        return new, (new if collect_hidden else None)

    xs = (layer_params, layer_keys) if layer_keys is not None else layer_params
    x, hs = jax.lax.scan(body, x, xs)
    if collect_hidden:
        return x, hs
    return x
