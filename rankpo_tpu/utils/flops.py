"""Analytic FLOPs accounting for the training log (tokens/sec, MFU).

TPU-native analog of the HF trainer's ``current_flos``/``total_flos``
counters (reference src/contrastive_trainer.py:546,674-675, inherited from
``Trainer.floating_point_ops``): instead of instrumenting modules, the
per-step FLOPs follow analytically from the model config and the static
padded sequence lengths — the same shapes the TPU actually compiles.

Conventions (the standard "model FLOPs" of MFU reporting):

- a multiply-accumulate counts 2 FLOPs;
- backward = 2x forward, so a train step is 3x forward model FLOPs;
- rematerialization's extra forward is NOT counted (MFU measures useful
  model math against the hardware peak, not recompute);
- padded positions count: batches are padded to the static
  ``max_*_length`` and the MXU runs them (``skip_pad_q`` trims some of
  this on the flash path, which makes reported MFU a floor on achieved
  utilization of real tokens).
"""

from __future__ import annotations

import os
from typing import Optional


def _per_layer_matmul_flops(config) -> float:
    """Per-token forward FLOPs of one transformer layer's weight matmuls
    (attention projections + MLP), excluding the attention score/value
    matmuls (sequence-length dependent — see ``encoder_fwd_flops``)."""
    h = config.hidden_size
    head_dim = getattr(config, "head_dim", None) or (
        h // config.num_attention_heads
    )
    q_dim = config.num_attention_heads * head_dim
    kv_dim = config.num_key_value_heads * head_dim
    attn_proj = 2 * h * (q_dim + 2 * kv_dim) + 2 * q_dim * h
    gated = getattr(config, "hidden_act", "silu") in ("silu", "swish")
    f = config.intermediate_size
    mlp = (6 if gated else 4) * h * f
    return float(attn_proj + mlp)


def encoder_fwd_flops(config, seq_len: int, *, causal: bool = True) -> float:
    """Forward FLOPs for ONE sequence of ``seq_len`` (padded) tokens:
    per-layer projections/MLP plus the attention score+value matmuls
    (``4 * q_dim * s_kv`` per token; causal halves the average visible
    context)."""
    h = config.hidden_size
    head_dim = getattr(config, "head_dim", None) or (
        h // config.num_attention_heads
    )
    q_dim = config.num_attention_heads * head_dim
    s_kv = seq_len / 2.0 if causal else float(seq_len)
    per_token = _per_layer_matmul_flops(config) + 4.0 * q_dim * s_kv
    return config.num_hidden_layers * per_token * seq_len


def contrastive_sample_flops(
    config, *, query_len: int, passage_len: int, group_size: int,
    causal: bool = True,
) -> float:
    """Train-step model FLOPs per SAMPLE (one query + its ``group_size``
    passages, the unit ``samples_per_sec`` counts): 3x forward."""
    fwd = encoder_fwd_flops(config, query_len, causal=causal) + (
        group_size * encoder_fwd_flops(config, passage_len, causal=causal)
    )
    return 3.0 * fwd


def contrastive_sample_tokens(
    *, query_len: int, passage_len: int, group_size: int
) -> int:
    return query_len + group_size * passage_len


def rankpo_sample_flops(
    config, *, query_len: int, passage_len: int,
    reference_free: bool = True, causal: bool = True,
) -> float:
    """RankPO step FLOPs per sample (query + chosen + rejected through the
    policy fwd+bwd; the frozen reference model adds one forward)."""
    fwd = encoder_fwd_flops(config, query_len, causal=causal) + (
        2 * encoder_fwd_flops(config, passage_len, causal=causal)
    )
    return (3.0 + (0.0 if reference_free else 1.0)) * fwd


def rankpo_sample_tokens(*, query_len: int, passage_len: int) -> int:
    return query_len + 2 * passage_len


# bf16 peak FLOP/s per chip by device kind (public spec sheets); the MXU
# peak MFU is measured against. Substring match on jax device_kind —
# longest/most-specific first.
_PEAK_BY_KIND = (
    ("v6 lite", 918e12),
    ("v6e", 918e12),
    ("v5 lite", 197e12),
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v5", 459e12),
    ("v4", 275e12),
    ("v3", 123e12),
)


def peak_flops_per_chip() -> Optional[float]:
    """bf16 peak FLOP/s of one local accelerator chip, or None when
    unknown (CPU test meshes — MFU is then omitted from the log).
    ``RANKPO_PEAK_TFLOPS`` overrides (e.g. unlisted hardware)."""
    env = os.environ.get("RANKPO_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    import jax

    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover - backend init failure
        return None
    for sub, peak in _PEAK_BY_KIND:
        if sub in kind:
            return peak
    return None
