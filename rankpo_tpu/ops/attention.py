"""Attention dispatch: XLA reference path + Pallas flash-attention fast path.

TPU-native replacement for the reference's flash-attn-2 CUDA dependency
(reference: src/modeling.py:145-146 ``attn_implementation='flash_attention_2'``,
README.md:81). The public signature is implementation-agnostic so the Pallas
kernel (rankpo_tpu/ops/flash_attention.py) can be swapped in without touching
model code; on CPU or for odd shapes we fall back to a fused-by-XLA einsum
path with fp32 softmax accumulation.

Shapes follow the JAX convention: q [B, Sq, Hq, D], k/v [B, Sk, Hkv, D] with
GQA when Hq > Hkv (Hq % Hkv == 0). ``mask`` is a [B, Sk] bool key-validity
(padding) mask; ``causal`` adds the autoregressive constraint (Llama).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-negative instead of -inf: keeps softmax NaN-free for fully-masked rows


def _xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    causal: bool,
    window: Optional[int] = None,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
) -> jax.Array:
    b, sq, hq, d = q.shape
    _, sk, hkv, _ = k.shape
    groups = hq // hkv

    scale = 1.0 / (d**0.5)
    qf = (q * scale).reshape(b, sq, hkv, groups, d)
    # logits in fp32 for numerical stability at long sequence lengths
    logits = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qf, k, preferred_element_type=jnp.float32
    )

    if segment_ids is not None:
        # sequence packing: tokens attend only within their own segment
        # (ids 1..n per packed text, 0 = pad); see flash_attention docstring
        seg = segment_ids
        pair = jnp.logical_and(
            seg[:, :, None] == seg[:, None, :], seg[:, None, :] != 0
        )  # [B, Sq, Sk]
        logits = jnp.where(pair[:, None, None, :, :], logits, NEG_INF)
    if mask is not None:
        key_mask = mask[:, None, None, None, :]  # [B,1,1,1,Sk]
        logits = jnp.where(key_mask, logits, NEG_INF)
    if causal:
        causal_mask = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=sk - sq)
        if window is not None:
            # sliding window (HF mistral rule): q attends keys with
            # q_pos - k_pos < window
            band = jnp.triu(
                jnp.ones((sq, sk), dtype=bool), k=sk - sq - window + 1
            )
            causal_mask = jnp.logical_and(causal_mask, band)
        logits = jnp.where(causal_mask[None, None, None, :, :], logits, NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    # rows with NO attendable key (fully pad-masked, or a sliding window past
    # every valid key) output zeros — softmax over all-NEG_INF logits is a
    # meaningless uniform average; the flash kernel uses the same convention
    any_valid = jnp.max(logits, axis=-1, keepdims=True) > NEG_INF * 0.5
    probs = jnp.where(any_valid, probs, 0.0).astype(v.dtype)
    if dropout_rate > 0.0 and dropout_key is not None:
        # attention-probs dropout (HF attention_probs_dropout_prob site)
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0).astype(v.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)
    return out.reshape(b, sq, hq, d)


def _use_flash(q: jax.Array) -> bool:
    if jax.default_backend() != "tpu":
        return False
    b, s, h, d = q.shape
    # the Pallas kernel wins clearly from ~1K sequence (5.3x vs XLA at 4K);
    # head_dim is always the full trailing block dim so any multiple of 8 tiles
    return d % 8 == 0 and d >= 64 and s >= 1024


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    impl: str = "auto",
    mesh=None,
    skip_pad_q: bool = False,
    window: Optional[int] = None,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Scaled dot-product attention with GQA, padding mask, optional causality.

    impl: "auto" (flash on TPU when profitable), "xla", or "flash".

    ``segment_ids`` [B, S] (self-attention only, replaces ``mask``): sequence
    packing — attention stays within each packed text's segment (0 = pad,
    1..n = texts); see rankpo_tpu.ops.flash_attention.

    ``mesh``: when given with a model axis > 1, the flash kernel is wrapped in
    a shard_map with heads sharded over the model axis (GSPMD cannot partition
    a pallas_call by itself) — batch stays sharded over the data axis. Falls
    back to XLA attention when shapes don't divide the mesh.
    """
    if segment_ids is not None and mask is not None:
        raise ValueError("pass segment_ids OR mask, not both")
    if dropout_rate > 0.0 and dropout_key is not None:
        # attention-probs dropout is training-only and not implemented in the
        # Pallas kernel; the XLA path handles it (GSPMD shards the einsums)
        return _xla_attention(
            q, k, v, mask, causal, window, dropout_rate, dropout_key,
            segment_ids,
        )
    if impl == "auto":
        impl = "flash" if _use_flash(q) else "xla"
    if impl == "flash":
        from rankpo_tpu.ops.flash_attention import flash_attention

        from rankpo_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

        mp = mesh.shape.get(MODEL_AXIS, 1) if mesh is not None else 1
        if mesh is not None and mp > 1:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            dp = mesh.shape.get(DATA_AXIS, 1)
            b, _, hq, _ = q.shape
            hkv = k.shape[2]
            if b % dp == 0 and hq % mp == 0 and hkv % mp == 0:
                packed = segment_ids is not None
                spec = P(DATA_AXIS, None, MODEL_AXIS, None)
                fn = shard_map(
                    lambda q_, k_, v_, m_: flash_attention(
                        q_, k_, v_,
                        mask=None if packed else m_,
                        segment_ids=m_ if packed else None,
                        causal=causal, skip_pad_q=skip_pad_q, window=window,
                    ),
                    mesh=mesh,
                    in_specs=(spec, spec, spec, P(DATA_AXIS, None)),
                    out_specs=spec,
                    # pallas_call outputs carry no varying-axis metadata yet
                    check_vma=False,
                )
                m_arg = segment_ids if packed else mask
                if m_arg is None:
                    m_arg = jnp.ones(
                        (q.shape[0], k.shape[1]), jnp.int32
                    )
                return fn(q, k, v, m_arg)
            return _xla_attention(
                q, k, v, mask, causal, window, segment_ids=segment_ids
            )
        return flash_attention(
            q, k, v, mask=mask, causal=causal, skip_pad_q=skip_pad_q,
            window=window, segment_ids=segment_ids,
        )
    return _xla_attention(q, k, v, mask, causal, window, segment_ids=segment_ids)
