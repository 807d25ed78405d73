"""Sentence pooling + L2 normalization.

Bit-compatible with the reference rules (src/modeling.py:224-236):
  - "last_token" (Llama family): position of the last non-pad token recovered via
    the ``attention_mask.argmin(-1) - 1`` trick with the ``% seq_len`` guard that
    maps a full-length row (argmin == 0) back to the final position
    (src/modeling.py:226-227). Assumes right padding, as produced by our collators
    and the reference's.
  - "cls" (XLM-Roberta/BGE family): first token (src/modeling.py:232).
  - "mean": mask-weighted mean over non-pad tokens (TPU-build extension; the
    reference does not implement it despite BASELINE.json's description).

Normalization: L2 over the last dim (src/modeling.py:235-236), computed in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def last_token_pool(last_hidden: jax.Array, attention_mask: jax.Array) -> jax.Array:
    """[B, S, H], [B, S] -> [B, H] at the last non-pad position per row."""
    seq_len = attention_mask.shape[-1]
    # argmin returns the first 0 (first pad) position; -1 steps back to the last
    # non-pad token; % seq_len maps the all-ones row (argmin=0 → -1) to seq_len-1.
    lengths = (jnp.argmin(attention_mask, axis=-1) - 1) % seq_len
    return jnp.take_along_axis(
        last_hidden, lengths[:, None, None], axis=1
    ).squeeze(1)


def cls_pool(last_hidden: jax.Array, attention_mask: jax.Array) -> jax.Array:
    del attention_mask
    return last_hidden[:, 0]


def mean_pool(last_hidden: jax.Array, attention_mask: jax.Array) -> jax.Array:
    # fp32 accumulation: a bf16-typed sequence-sum at S=4096 rounds to an
    # 8-bit mantissa (the repo's reductions are fp32 throughout, precision.py)
    m = attention_mask[..., None].astype(jnp.float32)
    summed = jnp.sum(last_hidden.astype(jnp.float32) * m, axis=1)
    counts = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return (summed / counts).astype(last_hidden.dtype)


_POOLERS = {
    "last_token": last_token_pool,
    "cls": cls_pool,
    "mean": mean_pool,
}


def pool(last_hidden: jax.Array, attention_mask: jax.Array, mode: str) -> jax.Array:
    try:
        return _POOLERS[mode](last_hidden, attention_mask)
    except KeyError:
        raise ValueError(f"Unknown pooling mode: {mode!r}; one of {list(_POOLERS)}")


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along the last axis in fp32 (matches F.normalize defaults)."""
    xf = x.astype(jnp.float32)
    norm = jnp.maximum(jnp.linalg.norm(xf, axis=-1, keepdims=True), eps)
    return (xf / norm).astype(x.dtype)
