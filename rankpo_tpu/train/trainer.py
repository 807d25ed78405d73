"""Generic functional trainer: one jit-compiled, mesh-sharded train step.

Replaces the reference's 1,096-line vendored fork of HF Trainer
(src/contrastive_trainer.py) and the stock-Trainer RankPO subclass
(src/rankpo_trainer.py) with a single loop:

  - the ENTIRE optimizer step (grad accumulation scan, global-norm clip, AdamW,
    param update) is one ``jit`` over the mesh with donated state;
  - ZeRO-1: optimizer moments are pinned to data-axis shards via out_shardings
    (rankpo_tpu/parallel/sharding.py) — XLA schedules the reduce-scatter /
    all-gather the way DeepSpeed stage 1 does by hand;
  - gradient accumulation is a ``lax.scan`` over a [accum, B, ...] microbatch
    stack (the reference loops in python over dataloader steps,
    contrastive_trainer.py:487-530);
  - checkpointing is HF-format safetensors (+ optional full-state orbax),
    per epoch or per N steps with rotation, and resume restores step/opt state
    (contrastive_trainer.py:358-414, 846-908 equivalents).
"""

from __future__ import annotations

import logging
import signal
import threading
import os
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from rankpo_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    place_global,
    shard_rows_to_mesh,
)
from rankpo_tpu.data.loader import DataLoader
from rankpo_tpu.parallel.sharding import (
    make_shardings,
    fsdp_partition_specs,
    param_partition_specs,
    zero1_partition_specs,
)
from rankpo_tpu.train import checkpoint as ckpt
from rankpo_tpu.train.config import TrainConfig
from rankpo_tpu.train.state import TrainState, make_optimizer
from rankpo_tpu.utils.seed import set_seed

logger = logging.getLogger(__name__)

def _pad_eval_batch(batch, rows: int, static_rows: int):
    """Pad a (possibly partial) host eval batch to the static per-process row
    count and attach a ``row_valid`` mask. Leaves whose leading dim is a
    multiple of ``rows`` (e.g. the passage block at rows*group_size) are padded
    proportionally by repeating their first row — valid model input whose
    outputs the mask discards."""

    def pad(x):
        ratio = x.shape[0] // rows
        target = ratio * static_rows
        if x.shape[0] == target:
            return x
        filler = np.broadcast_to(x[:1], (target - x.shape[0],) + x.shape[1:])
        return np.concatenate([x, filler], axis=0)

    out = jax.tree_util.tree_map(pad, dict(batch))
    valid = np.zeros((static_rows,), np.float32)
    valid[:rows] = 1.0
    out["row_valid"] = valid
    return out


# ordered log keys, matching the reference's log stream
# (contrastive_trainer.py:1059-1067)
_LOG_KEY_ORDER = [
    "global_step",
    "loss",
    "learning_rate",
    "grad_norm",
    "global_epoch",
    "epoch",
    "step",
]


class Trainer:
    # logging_strategy='epoch': fold buffered device metrics into host sums
    # every this-many steps (bounds live device buffers at O(fold), costs
    # one device sync per fold)
    _EPOCH_FOLD = 512

    def __init__(
        self,
        *,
        loss_fn: Callable,
        params,
        mesh,
        config: TrainConfig,
        total_steps: int,
        save_params_fn: Optional[Callable] = None,
        log_fn: Optional[Callable] = None,
        grad_fn: Optional[Callable] = None,
        frozen_params=None,
        sample_flops: Optional[float] = None,
        sample_tokens: Optional[float] = None,
    ):
        """loss_fn(params, batch, rng) -> (loss, metrics) on global arrays.

        frozen_params: an optional non-trainable pytree (frozen RankPO
        reference model, LoRA base weights) passed to the loss as a FOURTH
        argument — loss_fn(params, batch, rng, frozen). It must ride through
        jit as an argument: closed-over weight trees become HLO constants,
        which blow up remote compiles (CLAUDE.md) and bypass mesh sharding.

        save_params_fn(directory, params) writes the model in HF format (the
        caller owns model config/tokenizer); when None, checkpoint dirs contain
        only trainer state.

        grad_fn(params, batch[accum,...], rng) -> (loss, metrics, grads), when
        given, replaces the default per-microbatch value_and_grad + scan (used
        by the gradient-cache contrastive path, train/gradcache.py).

        sample_flops/sample_tokens: analytic per-sample model FLOPs and
        (padded) token counts from utils/flops.py — when given, the log
        stream carries ``tokens_per_sec`` and (when the chip's bf16 peak is
        known) ``mfu`` next to ``samples_per_sec``, the TPU analog of the
        reference's ``total_flos`` accounting
        (contrastive_trainer.py:546,674-675).
        """
        self.loss_fn = loss_fn
        self.grad_fn = grad_fn
        self.mesh = mesh
        self.config = config
        self.total_steps = total_steps
        self.save_params_fn = save_params_fn
        self.log_fn = log_fn
        # optional in-training retrieval eval hook: (params) -> metric dict,
        # called at eval points alongside (or instead of) the loss eval —
        # set post-construction (eval/in_training.py RetrievalEvalHook)
        self.retrieval_eval_fn: Optional[Callable] = None
        self.sample_flops = sample_flops
        self.sample_tokens = sample_tokens
        if sample_flops is not None:
            from rankpo_tpu.utils.flops import peak_flops_per_chip

            self._peak_flops = peak_flops_per_chip()
        else:
            self._peak_flops = None
        self.tx, self.schedule = make_optimizer(config, total_steps)

        dp = mesh.shape[DATA_AXIS]
        mp = mesh.shape.get(MODEL_AXIS, 1)

        if config.fsdp:
            # ZeRO-3/FSDP analog: params shard over data on their largest
            # divisible dim (parallel/sharding.py fsdp_partition_specs);
            # moments co-shard by the same rule
            param_specs = fsdp_partition_specs(params, dp, mp)
        else:
            param_specs = param_partition_specs(params, mp)
        opt_shapes = jax.eval_shape(self.tx.init, params)
        if config.zero1 or config.zero2 or config.fsdp:
            opt_specs = zero1_partition_specs(opt_shapes, dp, mp)
        else:
            opt_specs = jax.tree_util.tree_map(lambda _: P(), opt_shapes)
        self.state_specs = TrainState(step=P(), params=param_specs, opt_state=opt_specs)
        self.state_shardings = make_shardings(mesh, self.state_specs)

        # ZeRO-2: pin the gradient(-accumulation carry) layout to the same
        # data-axis shards as the moments, so microbatch grads
        # reduce-scatter into shards instead of living replicated across
        # the accumulation scan (config.py zero2). Under FSDP grads already
        # co-shard with the params — no extra constraint needed.
        self._grad_shardings = None
        if config.zero2 and not config.fsdp and dp > 1:
            grad_specs = zero1_partition_specs(params, dp, mp)
            self._grad_shardings = make_shardings(mesh, grad_specs)

        self.frozen_params = None
        self._frozen_shardings = None
        if frozen_params is not None:
            frozen_specs = param_partition_specs(frozen_params, mp)
            self._frozen_shardings = make_shardings(mesh, frozen_specs)
            self.frozen_params = place_global(
                frozen_params, self._frozen_shardings
            )

        # place params on the mesh, init optimizer state directly into its
        # shards (process-spanning placement handled by place_global)
        params = place_global(params, self.state_shardings.params)
        init_fn = jax.jit(
            lambda p: TrainState.create(p, self.tx),
            out_shardings=self.state_shardings,
        )
        self.state = init_fn(params)

        self._step_fn = self._build_step()
        self._eval_fn = None
        self._eval_data = None
        self._history: List[Dict] = []
        self._log_buffer: List[Dict] = []

    # ------------------------------------------------------------------
    def _build_step(self):
        accum = self.config.gradient_accumulation_steps
        loss_fn = self.loss_fn
        tx = self.tx

        grad_fn = self.grad_fn

        has_frozen = self.frozen_params is not None
        grad_shardings = self._grad_shardings

        def constrain_grads(grads):
            # ZeRO-2: each microbatch's grads reduce-scatter into data-axis
            # shards here; without the constraint the scan carry is a full
            # replicated f32 param-tree per device
            if grad_shardings is None:
                return grads
            return jax.lax.with_sharding_constraint(grads, grad_shardings)

        def step_fn(state: TrainState, batch, rng, frozen=None):
            params = state.params

            def micro(mb, r):
                if has_frozen:
                    (loss, metrics), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(params, mb, r, frozen)
                else:
                    (loss, metrics), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(params, mb, r)
                return loss, metrics, constrain_grads(grads)

            rngs = jax.random.split(jax.random.fold_in(rng, state.step), accum)

            if grad_fn is not None:
                loss, metrics, grads = grad_fn(
                    params, batch, jax.random.fold_in(rng, state.step)
                )
                grads = constrain_grads(grads)
            elif accum == 1:
                mb = jax.tree_util.tree_map(lambda x: x[0], batch)
                loss, metrics, grads = micro(mb, rngs[0])
            else:
                def body(carry, inp):
                    mb, r = inp
                    loss, metrics, grads = micro(mb, r)
                    c_loss, c_metrics, c_grads = carry
                    new = (
                        c_loss + loss,
                        jax.tree_util.tree_map(jnp.add, c_metrics, metrics),
                        constrain_grads(
                            jax.tree_util.tree_map(jnp.add, c_grads, grads)
                        ),
                    )
                    return new, None

                mb0 = jax.tree_util.tree_map(lambda x: x[0], batch)
                zero_shapes = jax.eval_shape(micro, mb0, rngs[0])
                init = jax.tree_util.tree_map(
                    lambda sd: jnp.zeros(sd.shape, sd.dtype), zero_shapes
                )
                init = (init[0], init[1], constrain_grads(init[2]))
                (loss, metrics, grads), _ = jax.lax.scan(
                    body, init, (batch, rngs)
                )
                inv = 1.0 / accum
                loss = loss * inv
                metrics = jax.tree_util.tree_map(lambda m: m * inv, metrics)
                grads = jax.tree_util.tree_map(lambda g: g * inv, grads)

            grad_norm = optax.global_norm(grads)
            updates, new_opt = tx.update(grads, state.opt_state, params)
            new_params = optax.apply_updates(params, updates)
            if self.config.skip_nonfinite_updates:
                # NaN/Inf guard: keep the old params/opt state for a bad step
                # (the reference only filters the LOGGED loss,
                # contrastive_trainer.py:532-544; this also protects training)
                ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
                new_params = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(ok, new, old), new_params, params
                )
                new_opt = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(ok, new, old),
                    new_opt,
                    state.opt_state,
                )
            new_state = TrainState(
                step=state.step + 1, params=new_params, opt_state=new_opt
            )
            out_metrics = dict(metrics)
            out_metrics["loss"] = loss
            out_metrics["grad_norm"] = grad_norm
            return new_state, out_metrics

        batch_sharding = NamedSharding(self.mesh, P(None, DATA_AXIS))
        rep = NamedSharding(self.mesh, P())
        in_shardings = [self.state_shardings, batch_sharding, rep]
        if has_frozen:
            in_shardings.append(self._frozen_shardings)
        return jax.jit(
            step_fn,
            in_shardings=tuple(in_shardings),
            out_shardings=(self.state_shardings, rep),
            donate_argnums=(0,),
        )

    # ------------------------------------------------------------------
    def evaluate(self, dataset, collator, *, batch_size: Optional[int] = None) -> Dict[str, float]:
        """Loss/metric evaluation pass without gradients (the analog of the
        reference RankPO prediction_step, rankpo_trainer.py:590-624). Returns
        eval_-prefixed means over the dataset."""
        if self._eval_fn is None:
            loss_fn = self.loss_fn
            rep = NamedSharding(self.mesh, P())
            batch_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
            has_frozen = self.frozen_params is not None

            def eval_step(params, batch, frozen=None):
                if has_frozen:
                    loss, metrics = loss_fn(params, batch, None, frozen)
                else:
                    loss, metrics = loss_fn(params, batch, None)
                out = dict(metrics)
                out["loss"] = loss
                return out

            eval_in = [self.state_shardings.params, batch_sharding]
            if has_frozen:
                eval_in.append(self._frozen_shardings)
            self._eval_fn = jax.jit(
                eval_step,
                in_shardings=tuple(eval_in),
                out_shardings=rep,
            )
        cfg = self.config
        per_device = cfg.per_device_eval_batch_size or cfg.per_device_train_batch_size
        micro_global = batch_size or (per_device * self.mesh.devices.size)
        # every process iterates the FULL eval set (process_count=1 split):
        # identical batches everywhere means (a) no process can end up with
        # zero rows on a partial final batch (the interleaved train split
        # can), and (b) the global placement below is a simple row-shard of
        # data every host already holds — the gather_for_metrics analog
        # (reference rankpo_trainer.py:508-520)
        loader = DataLoader(
            dataset,
            collator,
            batch_size=micro_global,
            shuffle=False,
            drop_last=False,
        )
        multiproc = jax.process_count() > 1
        sums: Dict[str, float] = {}
        n_rows = 0
        for batch in loader.epoch(0):
            rows = batch["query"]["input_ids"].shape[0]
            batch = _pad_eval_batch(batch, rows, micro_global)
            if multiproc:
                # jit in_shardings span all processes; numpy inputs only work
                # single-process (the train path uses _globalize likewise)
                batch = jax.tree_util.tree_map(
                    lambda x: shard_rows_to_mesh(x, self.mesh), batch
                )
            if self.frozen_params is not None:
                metrics = self._eval_fn(
                    self.state.params, batch, self.frozen_params
                )
            else:
                metrics = self._eval_fn(self.state.params, batch)
            # loss_fn means are over VALID rows only (row_valid mask); combine
            # batches as a row-weighted mean so a padded final batch cannot
            # bias the result (reference analog: gather_for_metrics de-dup,
            # rankpo_trainer.py:508-520). Fixes the round-1 defect where an
            # eval set smaller than the global batch returned {} silently.
            for key, value in metrics.items():
                sums[key] = sums.get(key, 0.0) + float(value) * rows
            n_rows += rows
        if n_rows == 0:
            return {}
        return {f"eval_{k}": v / n_rows for k, v in sums.items()}

    def _globalize(self, batch):
        """Multi-host: host-local [accum, B_local, ...] numpy arrays become
        global jax.Arrays sharded over the data axis (each process contributes
        its slice — the loader already shards rows per process)."""
        if jax.process_count() == 1:
            return batch
        sharding = NamedSharding(self.mesh, P(None, DATA_AXIS))

        def put(x):
            if isinstance(x, jax.Array):
                return x  # already staged as a global array (_stage)
            return jax.make_array_from_process_local_data(sharding, x)

        return jax.tree_util.tree_map(put, batch)

    def _stage(self, batch):
        """Start the H2D transfer for a host batch NOW (async device_put onto
        the step's input sharding). Called right after the previous step is
        dispatched, so the copy rides under device compute instead of on the
        next dispatch's critical path."""
        if batch is None:
            return None
        if jax.process_count() > 1:
            return self._globalize(batch)
        sharding = NamedSharding(self.mesh, P(None, DATA_AXIS))
        return jax.device_put(batch, sharding)

    def train_step(self, batch, rng) -> Dict[str, float]:
        """One optimizer step on a [accum, B_global, ...] microbatch stack."""
        if self.frozen_params is not None:
            self.state, metrics = self._step_fn(
                self.state, self._globalize(batch), rng, self.frozen_params
            )
        else:
            self.state, metrics = self._step_fn(
                self.state, self._globalize(batch), rng
            )
        return metrics

    def _maybe_evaluate(self, global_step: int, epoch: int) -> None:
        logs: Dict[str, float] = {}
        if self._eval_data is not None:
            eval_dataset, eval_collator = self._eval_data
            logs.update(self.evaluate(eval_dataset, eval_collator))
        if self.retrieval_eval_fn is not None:
            # in-training retrieval metrics on LIVE params (the paper's
            # nDCG-retention story measured during the run instead of
            # offline over checkpoints; eval/in_training.py). Collective:
            # every process calls it; logging stays rank-aware like _log.
            t0 = time.time()
            logs.update(self.retrieval_eval_fn(self.state.params))
            logs["retrieval_eval_runtime"] = round(time.time() - t0, 2)
        if not logs:
            return
        self._log({"global_step": global_step, "epoch": epoch, **logs})

    def train(
        self,
        dataset,
        collator,
        *,
        start_epoch: int = 0,
        eval_dataset=None,
        eval_collator=None,
    ) -> List[Dict]:
        """Full training loop over epochs (reference hot loop
        contrastive_trainer.py:456-620). Optional eval_dataset triggers
        no-grad evaluation per the config's eval_strategy/eval_steps."""
        cfg = self.config
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self._eval_data = (
            (eval_dataset, eval_collator or collator)
            if eval_dataset is not None
            else None
        )
        # preemption safety: on SIGTERM (the pod preemption notice), finish
        # the in-flight step, checkpoint, and return cleanly. Per-process —
        # a multi-host preemption signals every host's process anyway.
        self._preempted = False
        old_sigterm = None
        if cfg.save_on_preemption and threading.current_thread() is threading.main_thread():
            def _on_term(signum, frame):
                self._preempted = True
                logger.warning(
                    "SIGTERM received: checkpointing after the current step"
                )
            old_sigterm = signal.signal(signal.SIGTERM, _on_term)
        try:
            return self._train_loop(dataset, collator, start_epoch)
        finally:
            if old_sigterm is not None:
                signal.signal(signal.SIGTERM, old_sigterm)

    def _train_loop(self, dataset, collator, start_epoch: int) -> List[Dict]:
        cfg = self.config
        n_proc = jax.process_count()
        micro_global = cfg.per_device_train_batch_size * self.mesh.devices.size
        accum = cfg.gradient_accumulation_steps
        loader = DataLoader(
            dataset,
            collator,
            batch_size=micro_global,
            shuffle=True,
            drop_last=cfg.dataloader_drop_last,
            seed=cfg.seed,
            process_index=jax.process_index(),
            process_count=n_proc,
        )
        rng = set_seed(cfg.seed)
        steps_per_epoch = loader.steps_per_epoch() // accum
        if steps_per_epoch == 0:
            logger.warning(
                "dataset (%d rows) is smaller than one optimizer step "
                "(global batch %d x accum %d = %d rows): ZERO training steps "
                "will run. Shrink the batch/accum or add data.",
                len(dataset), micro_global, accum, micro_global * accum,
            )
        global_step = int(self.state.step)

        # resume: skip whole epochs already done
        resume_epoch = global_step // max(steps_per_epoch, 1)
        resume_step_in_epoch = global_step % max(steps_per_epoch, 1)

        t_start = time.time()
        logging_enabled = cfg.logging_strategy == "epoch" or (
            cfg.logging_strategy == "steps" and bool(cfg.logging_steps)
        )
        for epoch in range(max(start_epoch, resume_epoch), cfg.num_train_epochs):
            # the loader thread collates AND stacks whole [accum, B, ...]
            # groups; the loop keeps one staged (device_put in flight) ahead,
            # so host collation and H2D both overlap device compute
            batch_iter = loader.epoch(
                epoch,
                start_step=(resume_step_in_epoch * accum if epoch == resume_epoch else 0),
                stack=accum,
            )
            step_in_epoch = resume_step_in_epoch if epoch == resume_epoch else 0
            # interval accumulators (the reference's store_metrics analog,
            # rankpo_trainer.py:626-645): per-step metric dicts stay ON
            # DEVICE (tiny replicated scalars) between log steps — no sync —
            # and the flush logs their MEANS over the interval
            metric_buffer: List = []
            time_buffer: List[float] = []
            # 'epoch' strategy folds the buffer into host sums every
            # _EPOCH_FOLD steps: one sync per fold instead of retaining one
            # device dict per step across a possibly-100k-step epoch
            epoch_sums: Dict[str, float] = {}
            epoch_count = 0
            staged = self._stage(next(batch_iter, None))
            while staged is not None:
                batch = staged
                if (
                    cfg.profile_steps
                    and global_step == cfg.profile_start_step + cfg.profile_steps
                    and jax.process_index() == 0
                ):
                    # BEFORE this step's dispatch: the trace then spans
                    # exactly profile_steps steps (stopping after the
                    # post-step increment traced one extra)
                    jax.profiler.stop_trace()
                    logger.info(
                        "profiler trace written to %s/profile", cfg.output_dir
                    )
                if (
                    cfg.profile_steps
                    and global_step == cfg.profile_start_step
                    and jax.process_index() == 0
                ):
                    jax.profiler.start_trace(
                        os.path.join(cfg.output_dir, "profile")
                    )
                will_log = (
                    cfg.logging_strategy == "steps"
                    and bool(cfg.logging_steps)
                    and (global_step + 1) % cfg.logging_steps == 0
                )
                t_step = time.time()
                metrics = self.train_step(batch, rng)
                # stage the NEXT group while the device runs this step
                staged = self._stage(next(batch_iter, None))
                # buffered on device, un-fetched: at logging_steps > 1 the
                # host keeps collating while the device runs ahead (the flush
                # below is the interval's only sync point). Only buffer when
                # some flush will consume it — logging_strategy="no" would
                # otherwise retain every step's device scalars all epoch.
                if logging_enabled:
                    metric_buffer.append(metrics)
                    if (
                        cfg.logging_strategy == "epoch"
                        and len(metric_buffer) >= self._EPOCH_FOLD
                    ):
                        fold = self._mean_metrics(metric_buffer)
                        n = len(metric_buffer)
                        for key, val in fold.items():
                            epoch_sums[key] = (
                                epoch_sums.get(key, 0.0) + val * n
                            )
                        epoch_count += n
                        metric_buffer.clear()
                global_step += 1
                step_in_epoch += 1

                if will_log:
                    # fetch (syncing the device queue) BEFORE closing the
                    # interval's timer: non-logging steps record only their
                    # ~ms dispatch latency, so the flush step must absorb the
                    # queue drain for sum(time_buffer) to be true wall time —
                    # without this, samples_per_sec measured async dispatch
                    # (observed ~300x inflated)
                    means = self._mean_metrics(metric_buffer)
                time_buffer.append(time.time() - t_step)

                if will_log:
                    logs = {
                        "global_step": global_step,
                        # loss/grad_norm and every loss_fn metric (rewards/*
                        # families etc.) are MEANS over the logging interval,
                        # like the reference's store_metrics flush
                        "loss": means.pop("loss"),
                        "learning_rate": float(self.schedule(global_step - 1)),
                        "grad_norm": means.pop("grad_norm"),
                        "global_epoch": round(
                            epoch + step_in_epoch / max(steps_per_epoch, 1), 4
                        ),
                        "epoch": epoch,
                        "step": step_in_epoch,
                    }
                    logs.update(means)
                    logs["step_time"] = round(
                        sum(time_buffer) / len(time_buffer), 4
                    )
                    samples_per_sec = (
                        micro_global * accum * len(time_buffer)
                        / sum(time_buffer)
                    )
                    logs["samples_per_sec"] = round(samples_per_sec, 2)
                    if self.sample_tokens is not None:
                        logs["tokens_per_sec"] = round(
                            samples_per_sec * self.sample_tokens, 1
                        )
                    if self.sample_flops is not None and self._peak_flops:
                        # model FLOPs (3x fwd, padded shapes) vs the global
                        # bf16 peak — utils/flops.py conventions
                        logs["mfu"] = round(
                            samples_per_sec * self.sample_flops
                            / (self._peak_flops * jax.device_count()),
                            4,
                        )
                    metric_buffer.clear()
                    time_buffer.clear()
                    self._log(logs)

                if (
                    cfg.eval_strategy == "steps"
                    and cfg.eval_steps
                    and global_step % cfg.eval_steps == 0
                ):
                    self._maybe_evaluate(global_step, epoch)
                if (
                    cfg.save_strategy == "steps"
                    and cfg.save_steps
                    and global_step % cfg.save_steps == 0
                ):
                    self.save_checkpoint(global_step, epoch)
                if cfg.max_steps > 0 and global_step >= cfg.max_steps:
                    self.save_checkpoint(global_step, epoch)
                    return self._history
                if self._preempted:
                    self.save_checkpoint(global_step, epoch)
                    ckpt.wait_for_saves()
                    logger.warning(
                        "preempted: checkpoint-%d written, exiting training",
                        global_step,
                    )
                    return self._history

            if cfg.logging_strategy == "epoch" and (
                metric_buffer or epoch_count
            ):
                if metric_buffer:
                    fold = self._mean_metrics(metric_buffer)
                    n = len(metric_buffer)
                    for key, val in fold.items():
                        epoch_sums[key] = epoch_sums.get(key, 0.0) + val * n
                    epoch_count += n
                    metric_buffer.clear()
                means = {
                    key: val / epoch_count for key, val in epoch_sums.items()
                }
                logs = {
                    "global_step": global_step,
                    "loss": means.pop("loss"),
                    "learning_rate": float(self.schedule(global_step - 1)),
                    "grad_norm": means.pop("grad_norm"),
                    "global_epoch": epoch + 1,
                    "epoch": epoch,
                    "step": step_in_epoch,
                }
                logs.update(means)
                self._log(logs)
            if cfg.eval_strategy == "epoch":
                self._maybe_evaluate(global_step, epoch)
            if cfg.save_strategy == "epoch":
                self.save_checkpoint(global_step, epoch)

        ckpt.wait_for_saves()
        logger.info(
            "training done: %d steps in %.1fs", global_step, time.time() - t_start
        )
        return self._history

    # ------------------------------------------------------------------
    @staticmethod
    def _mean_metrics(buffer: List[Dict]) -> Dict[str, float]:
        """Fetch the buffered per-step device metrics and mean them per key
        (the only sync point of the logging interval). One batched
        device_get for the whole buffer: per-scalar float() would pay one
        host-device round trip each — through a remote tunnel that is
        ~25-30 ms PER SCALAR, seconds per flush at logging_steps=100."""
        host = jax.device_get(buffer)
        n = len(host)
        return {k: sum(float(m[k]) for m in host) / n for k in host[0]}

    def _log(self, logs: Dict) -> None:
        ordered = {k: logs[k] for k in _LOG_KEY_ORDER if k in logs}
        ordered.update({k: v for k, v in logs.items() if k not in ordered})
        self._history.append(ordered)
        logger.info("%s", ordered)
        if self.log_fn is not None:
            self.log_fn(ordered)

    def host_state(self, tree):
        """Fetch a (possibly cross-process-sharded) device pytree to the
        host. Multi-process this is a COLLECTIVE (process_allgather): every
        process must call it, even though only rank 0 writes artifacts —
        plain device_get raises on arrays whose shards live on other hosts
        (ZeRO-1 moments, TP params)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return multihost_utils.process_allgather(tree, tiled=True)
        return jax.device_get(tree)

    def save_checkpoint(self, global_step: int, epoch: int) -> Optional[str]:
        if self.config.save_strategy == "no":
            return None
        # host copies FIRST (collective — all processes), rank 0 writes after
        params_host = None
        if self.save_params_fn is not None:
            params_host = self.host_state(self.state.params)
        opt_host = None
        if not self.config.save_only_model:
            if self.config.async_checkpointing:
                # only the PREVIOUS in-flight write needs to finish (it
                # protects rotation below and directory reuse); waiting on
                # the current save here would make async a no-op
                ckpt.wait_for_saves()
            opt_host = self.host_state(self.state.opt_state)
        directory = os.path.join(
            self.config.output_dir, f"checkpoint-{global_step}"
        )
        if jax.process_index() == 0:
            os.makedirs(directory, exist_ok=True)
            if params_host is not None:
                self.save_params_fn(directory, params_host)
            trainer_state = {"global_step": global_step, "epoch": epoch}
            ckpt.save_trainer_state(directory, trainer_state, self.config)
        if opt_host is not None:
            # orbax saves are COLLECTIVE (internal cross-process sync):
            # every process calls, the primary writes
            ckpt.save_opt_state(
                directory, opt_host,
                async_save=self.config.async_checkpointing,
            )
        if jax.process_index() != 0:
            return None
        # the current checkpoint is the newest dir: rotation (oldest-first)
        # never touches it, and all older writes completed above
        ckpt.rotate_checkpoints(self.config.output_dir, self.config.save_total_limit)
        logger.info("saved checkpoint: %s", directory)
        return directory

    def resume_from(self, directory: str) -> None:
        """Restore step counter (and optimizer state when present). Params are
        the caller's responsibility (load via hf_io and rebuild the Trainer).

        When the checkpoint is model-only (``save_only_model=True``, the
        reference's published recipe), the optimizer moments are gone but the
        LR schedule must not restart: scalar integer counts inside the fresh
        optax state are fast-forwarded to the resumed step."""
        tstate = ckpt.load_trainer_state(directory)
        opt_state = ckpt.load_opt_state(directory, self.state.opt_state)
        step_value = int(tstate.get("global_step", 0))
        step = jnp.asarray(step_value, jnp.int32)
        if opt_state is not None:
            opt_state = place_global(opt_state, self.state_shardings.opt_state)
        else:
            def fast_forward(x):
                if x.ndim == 0 and jnp.issubdtype(x.dtype, jnp.integer):
                    return jnp.full_like(x, step_value)
                return x

            opt_state = jax.tree_util.tree_map(fast_forward, self.state.opt_state)
        self.state = TrainState(
            step=step, params=self.state.params, opt_state=opt_state
        )
