"""InfoNCE contrastive loss with in-batch and cross-device negatives.

Exact semantics of the reference forward (src/modeling.py:281-314):

  - in-batch negatives ON (``use_inbatch_neg``):
      scores = (q @ pᵀ) / T of shape [B, B·G] where G = group size
      (1 positive + n negatives per query); target index for row i is i·G
      (src/modeling.py:300-302). Every other passage in the (global) batch is a
      negative.
  - in-batch negatives OFF: per-query scores [B, G] with target 0
      (src/modeling.py:305-311).
  - cross-device negatives (``negatives_cross_device``, src/modeling.py:287-290):
      q/p are all-gathered over the data axis first, so B above becomes the
      GLOBAL batch. On TPU we do this with ``jax.lax.all_gather`` inside the
      jitted step — JAX differentiates the collective exactly (its transpose is
      a reduce-scatter), which deletes the reference's three hand-rolled
      autograd workarounds (src/modeling.py:26-109, 331-404). When the step runs
      under plain ``jit`` + GSPMD (no shard_map), pass ``axis_name=None`` and
      compute on global arrays — the partitioner inserts the same collective.

  Loss = mean cross-entropy (src/modeling.py:179, 314), accumulated in fp32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def similarity_scores(q_reps: jax.Array, p_reps: jax.Array) -> jax.Array:
    """Inner-product similarity (cosine when embeddings are L2-normalized);
    reference: src/modeling.py:240-252."""
    return jnp.einsum(
        "bh,ph->bp", q_reps, p_reps, preferred_element_type=jnp.float32
    )


def _cross_entropy(
    logits: jax.Array,
    targets: jax.Array,
    row_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean CE over rows, fp32 log-softmax. ``row_valid`` [B] (0/1) restricts
    the mean to real rows (eval batches padded to static shape)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
    per_row = logz - picked
    if row_valid is None:
        return jnp.mean(per_row)
    w = row_valid.astype(jnp.float32)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def info_nce_loss(
    q_reps: jax.Array,
    p_reps: jax.Array,
    *,
    temperature: float = 0.02,
    use_inbatch_neg: bool = True,
    axis_name: Optional[str] = None,
    row_valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (mean loss, scores).

    ``row_valid`` [B] (0/1): rows marked 0 are static-shape eval padding —
    they are excluded from the loss mean AND their passages are masked out of
    the in-batch negative pool (scores -inf), so padded rows cannot perturb
    real rows' metrics (the analog of the reference's gather_for_metrics
    de-duplication, rankpo_trainer.py:508-520).

    q_reps: [B, H]; p_reps: [B*G, H]. When ``axis_name`` is set (inside
    shard_map/pmap over the data axis) this is the
    ``negatives_cross_device=True`` path: passages are all-gathered over the
    axis, each shard scores only ITS OWN query rows against the global passage
    block, and the mean CE is combined with ``pmean``. This is mathematically
    identical to the reference (which all-gathers q AND p and has every rank
    compute the full [W·B, W·B·G] matrix redundantly, src/modeling.py:287-302)
    but does 1/W of the matmul work per chip — queries never move.
    """
    b = q_reps.shape[0]
    group_size = p_reps.shape[0] // b

    if use_inbatch_neg:
        if axis_name is not None:
            p_global = _gather_concat(p_reps, axis_name)
            # local row i is global row (shard_index*B + i); its positive sits
            # at global passage index (shard_index*B + i) * G (modeling.py:301-302)
            offset = jax.lax.axis_index(axis_name) * b
            targets = (jnp.arange(b, dtype=jnp.int32) + offset) * group_size
            col_valid = (
                None
                if row_valid is None
                else _gather_concat(
                    jnp.repeat(row_valid.astype(jnp.float32), group_size), axis_name
                )
            )
        else:
            p_global = p_reps
            targets = jnp.arange(b, dtype=jnp.int32) * group_size
            col_valid = (
                None
                if row_valid is None
                else jnp.repeat(row_valid.astype(jnp.float32), group_size)
            )
        scores = similarity_scores(q_reps, p_global) / temperature  # [B, Bg*G]
        if col_valid is not None:
            # padded rows' passages must not act as negatives for real rows;
            # each row keeps its own target column so the (discarded) CE of
            # padded rows stays finite
            col = jnp.arange(scores.shape[1], dtype=jnp.int32)
            keep = (col_valid[None, :] > 0) | (col[None, :] == targets[:, None])
            scores = jnp.where(keep, scores, -jnp.inf)
    else:
        # grouped scores never cross shards (modeling.py:305-311)
        grouped = p_reps.reshape(b, group_size, -1)
        scores = (
            jnp.einsum(
                "bh,bgh->bg", q_reps, grouped, preferred_element_type=jnp.float32
            )
            / temperature
        )
        targets = jnp.zeros((b,), dtype=jnp.int32)

    if axis_name is not None and row_valid is not None:
        # shards may hold different valid counts: combine as a global
        # weighted mean (psum of sums), not a pmean of per-shard means
        logits = scores.astype(jnp.float32)
        per_row = jax.nn.logsumexp(logits, axis=-1) - jnp.take_along_axis(
            logits, targets[:, None], axis=-1
        )[:, 0]
        w = row_valid.astype(jnp.float32)
        num = jax.lax.psum(jnp.sum(per_row * w), axis_name)
        den = jax.lax.psum(jnp.sum(w), axis_name)
        return num / jnp.maximum(den, 1.0), scores

    loss = _cross_entropy(scores, targets, row_valid)
    if axis_name is not None:
        loss = jax.lax.pmean(loss, axis_name)
    return loss, scores


def info_nce_block_loss(
    q_reps: jax.Array,
    p_reps: jax.Array,
    *,
    num_blocks: int,
    temperature: float = 0.02,
    row_valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """In-batch InfoNCE restricted to per-device blocks — the
    ``negatives_cross_device=False`` + ``use_inbatch_neg=True`` semantics
    (src/modeling.py:293-302 without the :287-290 gather, where each rank
    scores only its local batch and DDP averages the per-rank losses).

    Computed on GLOBAL arrays under jit: q [B, H] reshaped to [W, B/W, H],
    p [B*G, H] to [W, B*G/W, H]; block-diagonal einsum; with the batch sharded
    over the data axis the partitioner keeps every block on its own device and
    inserts no collectives for the scores.
    """
    b = q_reps.shape[0]
    group_size = p_reps.shape[0] // b
    bw = b // num_blocks
    qb = q_reps.reshape(num_blocks, bw, -1)
    pb = p_reps.reshape(num_blocks, bw * group_size, -1)
    scores = (
        jnp.einsum("wbh,wph->wbp", qb, pb, preferred_element_type=jnp.float32)
        / temperature
    )  # [W, B/W, (B/W)*G]
    targets = jnp.arange(bw, dtype=jnp.int32) * group_size
    if row_valid is not None:
        # mask padded rows' passages out of each block's negative pool,
        # keeping every row's own target column (see info_nce_loss)
        col_valid = jnp.repeat(
            row_valid.astype(jnp.float32).reshape(num_blocks, bw), group_size, axis=1
        )  # [W, (B/W)*G]
        col = jnp.arange(bw * group_size, dtype=jnp.int32)
        keep = (col_valid[:, None, :] > 0) | (
            col[None, None, :] == targets[None, :, None]
        )
        scores = jnp.where(keep, scores, -jnp.inf)
    logits = scores.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)  # [W, B/W]
    picked = jnp.take_along_axis(
        logits, jnp.broadcast_to(targets[None, :, None], (num_blocks, bw, 1)), axis=-1
    )[..., 0]
    per_row = logz - picked
    if row_valid is None:
        loss = jnp.mean(per_row)
    else:
        w = row_valid.astype(jnp.float32).reshape(num_blocks, bw)
        loss = jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)
    return loss, scores.reshape(b, -1)


def _gather_concat(x: jax.Array, axis_name: str) -> jax.Array:
    """all_gather along the named mesh axis, concatenated on the batch dim.
    Unlike the reference's SimCLR trick (src/modeling.py:373-377) no gradient
    surgery is needed: the VJP of all_gather is reduce-scatter (psum of the
    per-shard slices), which IS the exact global gradient."""
    gathered = jax.lax.all_gather(x, axis_name)  # [W, B, H]
    return gathered.reshape((-1,) + x.shape[1:])


def validate_temperature(normalize_embeddings: bool, temperature: float) -> float:
    """Reference guards (src/modeling.py:186-191): without normalization the
    temperature is forced to 1.0; with cosine similarity T > 0.5 is rejected."""
    if not normalize_embeddings:
        return 1.0
    if temperature > 0.5:
        raise ValueError(
            "temperature should be <= 0.5 when using cosine similarity "
            "(normalize_embeddings=True); recommended range 0.01-0.1"
        )
    return temperature
