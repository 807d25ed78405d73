"""Train state pytree + optimizer construction.

One functional state replaces the reference's Trainer/DeepSpeedEngine/optimizer
object tangle (src/contrastive_trainer.py:250-341): params, optax state and the
step counter live in a single donated pytree that flows through the jitted
train step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rankpo_tpu.train.config import TrainConfig


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
        )


def make_schedule(config: TrainConfig, total_steps: int) -> optax.Schedule:
    """warmup + {cosine, linear, constant, constant_with_warmup, polynomial}
    — the TrainingArguments schedule surface (reference src/arguments.py:146-248
    inherits transformers SchedulerType; recipes use --lr_scheduler_type cosine
    --warmup_ratio 0.1). Matching HF semantics: plain "constant" has NO warmup
    (use constant_with_warmup for the warmed-up variant); "polynomial" decays
    peak -> lr_end with exponent lr_power."""
    warmup = config.warmup_steps or int(total_steps * config.warmup_ratio)
    peak = config.learning_rate
    kind = config.lr_scheduler_type
    if kind == "constant":
        return optax.constant_schedule(peak)
    if kind == "constant_with_warmup":
        if warmup == 0:
            return optax.constant_schedule(peak)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, peak, warmup), optax.constant_schedule(peak)],
            [warmup],
        )
    if kind == "inverse_sqrt":
        # HF: lr = peak / sqrt(max(step, warmup) / warmup) after linear warmup
        timescale = max(warmup, 1)

        def inv_sqrt(step):
            step = jnp.asarray(step, jnp.float32)
            warm = peak * step / timescale
            decay_v = peak / jnp.sqrt(jnp.maximum(step, timescale) / timescale)
            return jnp.where(step < timescale, warm, decay_v)

        return inv_sqrt
    decay_steps = max(total_steps - warmup, 1)
    if kind == "linear":
        decay = optax.linear_schedule(peak, 0.0, decay_steps)
    elif kind == "cosine":
        decay = optax.cosine_decay_schedule(peak, decay_steps)
    elif kind == "cosine_with_restarts":
        cycles = max(int(config.lr_num_cycles), 1)
        cycle_len = max(decay_steps // cycles, 1)
        decay = optax.join_schedules(
            [optax.cosine_decay_schedule(peak, cycle_len) for _ in range(cycles)],
            [cycle_len * (i + 1) for i in range(cycles - 1)],
        )
    elif kind == "cosine_with_min_lr":
        decay = optax.cosine_decay_schedule(
            peak, decay_steps, alpha=config.lr_end / peak if peak else 0.0
        )
    elif kind == "polynomial":
        decay = optax.polynomial_schedule(
            init_value=peak,
            end_value=config.lr_end,
            power=config.lr_power,
            transition_steps=decay_steps,
        )
    else:
        raise ValueError(f"unknown lr_scheduler_type {kind!r}")
    if warmup == 0:
        return decay
    return optax.join_schedules(
        [optax.linear_schedule(0.0, peak, warmup), decay], [warmup]
    )


def make_optimizer(config: TrainConfig, total_steps: int):
    """Optimizer + global-norm clipping. ``config.optim`` selects:

    - "adamw" (default): reference parity — clip at max_grad_norm, AdamW
      with TrainingArguments betas/eps;
    - "adamw8bit": identical math with blockwise-int8 moment storage
      (train/optim8bit.py) — ~half the moment HBM, what buys grad
      accumulation / batch 2 headroom at 1.24B on one chip;
    - "adafactor": optax Adafactor with first-moment momentum in bf16
      (factored second moment ≈ zero nu memory).
    """
    schedule = make_schedule(config, total_steps)
    components = []
    if config.max_grad_norm and config.max_grad_norm > 0:
        components.append(optax.clip_by_global_norm(config.max_grad_norm))
    if config.optim == "adamw":
        components.append(
            optax.adamw(
                schedule,
                b1=config.adam_beta1,
                b2=config.adam_beta2,
                eps=config.adam_epsilon,
                weight_decay=config.weight_decay,
            )
        )
    elif config.optim == "adamw8bit":
        from rankpo_tpu.train.optim8bit import adamw8bit

        components.append(
            adamw8bit(
                schedule,
                b1=config.adam_beta1,
                b2=config.adam_beta2,
                eps=config.adam_epsilon,
                weight_decay=config.weight_decay,
            )
        )
    elif config.optim == "adafactor":
        components.append(
            optax.adafactor(
                learning_rate=schedule,
                momentum=config.adam_beta1,
                dtype_momentum=jnp.bfloat16,
                weight_decay_rate=config.weight_decay or None,
                multiply_by_parameter_scale=False,
                clipping_threshold=None,
            )
        )
    else:
        raise ValueError(
            f"unknown optim {config.optim!r}; "
            "one of ['adamw', 'adamw8bit', 'adafactor']"
        )
    return optax.chain(*components), schedule
