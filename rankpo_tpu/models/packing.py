"""Sequence-packing model helpers: positions and per-segment pooling.

Packing puts several texts in one row as contiguous segments (ids 1..n,
0-id pad tail; see rankpo_tpu.ops.flash_attention ``segment_ids``). The
reference pads every text to the batch max (src/data_utils.py:62-71,
src/modeling.py:512-518) and burns FLOPs on pad tokens in every matmul;
packing is the TPU-native alternative — static shapes, near-zero waste.

These helpers keep the packed path numerically identical to running each
text alone:

  - :func:`packed_positions` restarts position indices at every segment
    start, so RoPE (llama family) and learned absolute embeddings
    (roberta/BERT family) see exactly the positions an unpacked batch
    would.
  - :func:`packed_pool` reduces per-segment instead of per-row: the
    last_token / cls / mean pooling rules (src/modeling.py:224-232)
    applied to each packed text's token span.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def packed_positions(segment_ids: jax.Array) -> jax.Array:
    """[B, S] segment ids -> [B, S] within-segment positions (0-based).

    Pad-tail positions restart at 0 too; they are masked out of attention
    and pooling so their value never matters.
    """
    b, s = segment_ids.shape
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
    prev = jnp.pad(
        segment_ids[:, :-1], ((0, 0), (1, 0)), constant_values=-1
    )
    is_start = segment_ids != prev
    seg_start = jax.lax.cummax(jnp.where(is_start, pos, 0), axis=1)
    return pos - seg_start


def packed_pool(
    hidden: jax.Array,
    segment_ids: jax.Array,
    max_segments: int,
    mode: str,
) -> tuple:
    """Per-segment pooling: [B, S, H], [B, S] -> ([B, M, H], [B, M] bool).

    Slot j of row b holds the pooled embedding of segment j+1 (the collator
    assigns ids 1..n in order); ``valid`` marks slots whose segment exists.
    Modes mirror rankpo_tpu.models.pooling: "last_token" (final token of the
    segment), "cls" (first token), "mean" (fp32 token mean).
    """
    b, s, h = hidden.shape
    # one-hot [B, M, S] of segment membership drives everything; the mean
    # path turns it into an MXU matmul, the gather paths into cumulative
    # counts (segments are contiguous and ordered)
    seg_range = jnp.arange(1, max_segments + 1, dtype=segment_ids.dtype)
    member = segment_ids[:, None, :] == seg_range[None, :, None]  # [B, M, S]
    counts = jnp.sum(member, axis=-1)  # [B, M]
    valid = counts > 0
    if mode == "mean":
        mf = member.astype(jnp.float32)
        summed = jnp.einsum(
            "bms,bsh->bmh", mf, hidden.astype(jnp.float32)
        )
        reps = summed / jnp.maximum(counts, 1)[..., None].astype(jnp.float32)
        return reps.astype(hidden.dtype), valid
    ends = jnp.cumsum(counts, axis=-1)  # tokens in segments 1..j
    if mode == "last_token":
        idx = ends - 1
    elif mode == "cls":
        idx = ends - counts
    else:
        raise ValueError(
            f"Unknown packed pooling mode: {mode!r}; "
            "one of ['last_token', 'cls', 'mean']"
        )
    idx = jnp.clip(idx, 0, s - 1)  # empty slots gather position 0, masked out
    reps = jnp.take_along_axis(hidden, idx[..., None], axis=1)
    return reps, valid


def scatter_packed_reps(
    reps: jax.Array, slot_index: jax.Array, num_slots: int
) -> jax.Array:
    """Restore batch order: [R, M, H] packed reps + [R, M] slot table
    (values in [0, num_slots) or -1 for empty) -> [num_slots, H].

    Differentiable (the transpose is the gather the packed layout implies),
    so the packed train step backprops exactly like the unpacked one.
    """
    h = reps.shape[-1]
    flat = reps.reshape(-1, h)
    idx = slot_index.reshape(-1)
    safe = jnp.where(idx >= 0, idx, num_slots)  # -1 -> dump row, sliced off
    out = jnp.zeros((num_slots + 1, h), flat.dtype).at[safe].set(flat)
    return out[:num_slots]
