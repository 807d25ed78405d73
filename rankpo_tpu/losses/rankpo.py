"""RankPO preference loss over similarity scores.

Exact semantics of the reference (src/rankpo_trainer.py:525-568 rankpo_loss,
:499-505 auxiliary SFT branch, :447-522 metric construction). This is a
DPO/SimPO-style objective applied to cosine scores instead of log-probs:

    adv    = (s_chosen − s_rejected) − [ref margin if not reference_free]
    adv   /= temperature                       (rankpo_trainer.py:550)
    logits = adv − gamma_beta_ratio            (rankpo_trainer.py:554)
    sigmoid: −logσ(β·logits)·(1−ls) − logσ(−β·logits)·ls
    hinge:   relu(1 − β·logits)

The auxiliary SFT branch applies ITS OWN temperature to the raw scores
(rankpo_trainer.py:500) — the two temperature applications are distinct and
must not be conflated (SURVEY.md hard-part #5).

Decision record — why this is NOT a hand-written Pallas kernel (the
BASELINE.json north-star text floats one): the loss consumes a [B, 2]
score matrix — a few hundred scalars per step next to the ~1e11 FLOPs of
the encoder forwards that produce them. XLA already fuses this entire
elementwise chain (sub, div, logistic, mul, add, mean) into a single
fusion with the score einsum's epilogue; a Pallas kernel here would add a
dispatch boundary and (8, 128) tile-padding for tensors ~60x smaller than
one tile, saving nothing. The Pallas budget goes where the FLOPs are:
flash attention (ops/flash_attention.py) and the retrieval engine
(ops/topk.py, ops/pq_adc_pallas.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def rankpo_loss(
    chosen_scores: jax.Array,
    rejected_scores: jax.Array,
    ref_chosen_scores: Optional[jax.Array] = None,
    ref_rejected_scores: Optional[jax.Array] = None,
    *,
    beta: float = 1.0,
    gamma_beta_ratio: float = 0.0,
    temperature: float = 0.02,
    loss_type: str = "sigmoid",
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Per-example losses [B]."""
    adv = chosen_scores.astype(jnp.float32) - rejected_scores.astype(jnp.float32)
    if ref_chosen_scores is not None and ref_rejected_scores is not None:
        adv = adv - (
            ref_chosen_scores.astype(jnp.float32)
            - ref_rejected_scores.astype(jnp.float32)
        )
    adv = adv / temperature
    logits = adv - gamma_beta_ratio

    if loss_type == "sigmoid":
        return (
            -jax.nn.log_sigmoid(beta * logits) * (1.0 - label_smoothing)
            - jax.nn.log_sigmoid(-beta * logits) * label_smoothing
        )
    if loss_type == "hinge":
        return jax.nn.relu(1.0 - beta * logits)
    raise ValueError(f"Unknown loss_type: {loss_type}; one of ['sigmoid', 'hinge']")


def sft_loss(
    scores: jax.Array,
    temperature: float,
    row_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """2-way contrastive regularizer: CE([s_c, s_r]/T, target 0)
    (rankpo_trainer.py:499-505)."""
    logits = scores.astype(jnp.float32) / temperature
    logz = jax.nn.logsumexp(logits, axis=-1)
    return _masked_mean(logz - logits[:, 0], row_valid)


def _masked_mean(x: jax.Array, row_valid: Optional[jax.Array]) -> jax.Array:
    """Mean over rows, restricted to ``row_valid`` (0/1) rows when given —
    static-shape eval padding must not bias batch means (the analog of the
    reference's gather_for_metrics de-dup, rankpo_trainer.py:508-520)."""
    x = x.astype(jnp.float32)
    if row_valid is None:
        return jnp.mean(x)
    w = row_valid.astype(jnp.float32)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def rankpo_batch_loss(
    scores: jax.Array,
    ref_scores: Optional[jax.Array] = None,
    *,
    beta: float = 1.0,
    gamma_beta_ratio: float = 0.0,
    temperature: float = 0.02,
    loss_type: str = "sigmoid",
    label_smoothing: float = 0.0,
    rankpo_weight: float = 1.0,
    sft_weight: float = 0.0,
    row_valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Combined loss + metrics from a [B, 2] (chosen, rejected) score matrix.

    Mirrors get_batch_loss_metrics (rankpo_trainer.py:447-522): total loss is
    ``rankpo_weight·L_rankpo + sft_weight·L_sft``; metrics match the reference's
    rewards/* and scores/* families (means over the batch).
    """
    chosen = scores[:, 0]
    rejected = scores[:, 1]
    if ref_scores is not None:
        ref_chosen = ref_scores[:, 0]
        ref_rejected = ref_scores[:, 1]
    else:
        ref_chosen = ref_rejected = None

    metrics: Dict[str, jax.Array] = {}
    total = jnp.float32(0.0)

    if rankpo_weight > 0.0:
        per_example = rankpo_loss(
            chosen,
            rejected,
            ref_chosen,
            ref_rejected,
            beta=beta,
            gamma_beta_ratio=gamma_beta_ratio,
            temperature=temperature,
            loss_type=loss_type,
            label_smoothing=label_smoothing,
        )
        l_rankpo = _masked_mean(per_example, row_valid)
        total = total + rankpo_weight * l_rankpo
        metrics["rankpo_loss"] = l_rankpo

    if sft_weight > 0.0:
        l_sft = sft_loss(scores, temperature, row_valid)
        total = total + sft_weight * l_sft
        metrics["sft_loss"] = l_sft

    rc = jnp.float32(0.0) if ref_chosen is None else ref_chosen
    rr = jnp.float32(0.0) if ref_rejected is None else ref_rejected
    chosen_rewards = beta * (chosen - rc)
    rejected_rewards = beta * (rejected - rr)
    metrics["rewards/chosen"] = _masked_mean(chosen_rewards, row_valid)
    metrics["rewards/rejected"] = _masked_mean(rejected_rewards, row_valid)
    metrics["rewards/accuracies"] = _masked_mean(
        (chosen_rewards > rejected_rewards).astype(jnp.float32), row_valid
    )
    metrics["rewards/margins"] = _masked_mean(
        chosen_rewards - rejected_rewards, row_valid
    )
    metrics["scores/chosen"] = _masked_mean(chosen, row_valid)
    metrics["scores/rejected"] = _masked_mean(rejected, row_valid)
    metrics["scores/margins"] = _masked_mean(chosen - rejected, row_valid)

    return total, metrics
