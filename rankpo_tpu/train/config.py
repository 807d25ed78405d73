"""Training configuration.

Mirrors the reference's TrainingArguments surface that the published recipes
actually use (scripts/train/run_contrastive.sh, run_rankpo.sh;
src/arguments.py TrainArguments/RankPOArguments) minus DeepSpeed JSON — the
mesh/sharding fields replace it (SURVEY.md §2 L8).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass
class TrainConfig:
    output_dir: str = "outputs/run"
    overwrite_output_dir: bool = False

    # optimization
    learning_rate: float = 1e-5
    # cosine | linear | constant | constant_with_warmup | polynomial |
    # cosine_with_restarts | cosine_with_min_lr | inverse_sqrt
    # (the TrainingArguments schedule surface a reference user would reach
    # for, src/arguments.py:146-248 via transformers SchedulerType)
    lr_scheduler_type: str = "cosine"
    lr_end: float = 1e-7  # polynomial / cosine_with_min_lr floor
    lr_power: float = 1.0  # polynomial only (HF lr_scheduler_kwargs["power"])
    lr_num_cycles: int = 1  # cosine_with_restarts only
    warmup_ratio: float = 0.1
    warmup_steps: int = 0
    weight_decay: float = 0.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    # "adamw" (reference parity) | "adamw8bit" (blockwise int8 moments,
    # ~half the moment HBM — train/optim8bit.py) | "adafactor" (factored
    # second moment, optax). The memory-efficient variants are what make
    # grad accumulation / batch 2 fit at 1.24B on one 16 GB chip.
    optim: str = "adamw"

    # schedule
    num_train_epochs: int = 3
    max_steps: int = -1
    per_device_train_batch_size: int = 8
    # eval batch size; None falls back to the train batch size (HF default is
    # a separate field, TrainingArguments.per_device_eval_batch_size)
    per_device_eval_batch_size: Optional[int] = None
    gradient_accumulation_steps: int = 1
    dataloader_drop_last: bool = True
    seed: int = 42

    # precision / memory
    bf16: bool = True
    pure_bf16: bool = False
    gradient_checkpointing: bool = False
    # "full" (recompute everything, min memory) | "dots" (save matmul
    # outputs — skips the MXU recompute when the model still fits HBM) |
    # "attn" (save only attention outputs + flash lse stats — the attention
    # forward never re-runs in backward, at ~B·S·hidden·4 bytes/layer)
    gradient_checkpointing_policy: str = "full"

    # parallelism (replaces configs/*.json DeepSpeed ZeRO)
    model_parallel: int = 1
    zero1: bool = True  # shard optimizer state over the data axis
    # ZeRO-2 analog (reference configs/ds_zero2_config_llama.json): pins the
    # gradient-accumulation carry to data-axis shards (same
    # largest-divisible-dim rule as the moments). Measured (benchmarks/
    # zero2_memory.py): GSPMD already propagates zero1's moment shardings
    # back onto the grads through the accum scan, so this adds 0 bytes over
    # --zero1 — it exists to make the sharded-grad layout an explicit
    # guarantee rather than a propagation heuristic. Implies zero1 moments.
    zero2: bool = False
    # ZeRO-3/FSDP analog: PARAMETERS shard over the data axis too (largest
    # divisible dim); GSPMD all-gathers each weight at use and
    # reduce-scatters its grad. ~1/dp param memory per device — for models
    # whose replicated weights don't fit a chip. Implies sharded moments.
    fsdp: bool = False

    # robustness / observability (SURVEY.md §5 gaps the reference lacks)
    skip_nonfinite_updates: bool = True  # hold params when loss/grads go NaN/Inf
    profile_steps: int = 0  # trace this many steps with jax.profiler
    profile_start_step: int = 10
    # SIGTERM (pod preemption notice) -> checkpoint after the current step,
    # exit the loop cleanly. Multi-host: signal every process.
    save_on_preemption: bool = True
    debug_nans: bool = False  # jax_debug_nans: fail AT the op producing NaN

    # evaluation during training (reference: TrainingArguments eval surface)
    eval_strategy: str = "no"  # no | epoch | steps
    eval_steps: int = 0

    # logging / checkpointing
    logging_strategy: str = "steps"  # no | steps | epoch (TrainingArguments)
    logging_steps: int = 1
    save_strategy: str = "epoch"  # epoch | steps | no
    save_steps: int = 500
    save_total_limit: Optional[int] = None
    save_only_model: bool = True
    async_checkpointing: bool = False  # background orbax writes (pod preemption safety)
    resume_from_checkpoint: Optional[str] = None
    run_name: str = "auto"
    wandb_project: str = ""
    log_level: str = "info"

    def to_json_string(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    def global_batch_size(self, n_devices: int) -> int:
        return self.per_device_train_batch_size * n_devices
