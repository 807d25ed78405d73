"""LoRA adapters for the functional encoders.

Capability parity with the reference's optional PEFT path
(src/rankpo_trainer.py:60-61, 127-165: peft_config → get_peft_model, bf16
casting, merge_and_unload). TPU-native form: adapters are a separate pytree of
(A, B) factors per targeted stacked kernel [L, in, out]; training optimizes
ONLY the adapter tree (the frozen base is a closure constant), and
:func:`merge_lora` folds ``W + (α/r)·A@B`` back into base weights for export —
the merge_and_unload analog. Works with both model families and the scanned
layer layout unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("q_proj", "v_proj")


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 8
    alpha: float = 16.0
    target_modules: Tuple[str, ...] = DEFAULT_TARGETS

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


def _target_kernels(params: dict, config: LoraConfig):
    """Yields (module_name, kernel) for targeted stacked kernels in layers."""
    layers = params.get("layers", {})
    for name in config.target_modules:
        module = layers.get(name)
        if module is None or "kernel" not in module:
            raise ValueError(
                f"LoRA target {name!r} not found; available: "
                f"{[k for k, v in layers.items() if isinstance(v, dict) and 'kernel' in v]}"
            )
        yield name, module["kernel"]


def init_lora_params(key: jax.Array, params: dict, config: LoraConfig) -> dict:
    """A ~ N(0, 1/d_in) (fan-in scaled, matching PEFT's kaiming-style init),
    B = 0 — adapters start as identity. A 1/r scale here would couple the
    effective adapter learning rate quadratically to the rank hyperparameter."""
    lora: Dict[str, dict] = {}
    targets = list(_target_kernels(params, config))
    keys = jax.random.split(key, len(targets))
    for k_i, (name, kernel) in zip(keys, targets):
        L, d_in, d_out = kernel.shape
        a = jax.random.normal(k_i, (L, d_in, config.r), jnp.float32) * (
            1.0 / float(d_in) ** 0.5
        )
        b = jnp.zeros((L, config.r, d_out), jnp.float32)
        lora[name] = {"lora_a": a.astype(kernel.dtype), "lora_b": b.astype(kernel.dtype)}
    return lora


def merge_lora(params: dict, lora_params: dict, config: LoraConfig) -> dict:
    """Effective params: targeted kernels become W + (α/r)·A@B."""
    layers = dict(params["layers"])
    for name, ab in lora_params.items():
        kernel = layers[name]["kernel"]
        delta = jnp.einsum(
            "lir,lro->lio", ab["lora_a"], ab["lora_b"],
            preferred_element_type=jnp.float32,
        ) * config.scaling
        layers[name] = {
            **layers[name],
            "kernel": (kernel.astype(jnp.float32) + delta).astype(kernel.dtype),
        }
    out = dict(params)
    out["layers"] = layers
    return out


def make_lora_loss_fn(inner_loss_fn, base_params, config: LoraConfig):
    """Wrap a loss_fn so the trainable tree is the adapter pytree.

    The frozen base should be passed at CALL time as ``frozen={"base": ...}``
    (the Trainer's frozen_params argument: closed-over weight trees become
    HLO constants); the ``base_params`` closure fallback remains for direct
    library use. Any further ``frozen`` entries (e.g. a RankPO "ref" model)
    are forwarded to the inner loss when it accepts a 4th argument."""
    import inspect

    inner_takes_frozen = len(
        inspect.signature(inner_loss_fn).parameters
    ) >= 4

    def loss_fn(lora_params, batch, rng, frozen=None):
        base = (frozen or {}).get("base") if isinstance(frozen, dict) else None
        if base is None:
            base = base_params  # closure fallback (library use)
        merged = merge_lora(base, lora_params, config)
        if inner_takes_frozen:
            return inner_loss_fn(merged, batch, rng, frozen)
        return inner_loss_fn(merged, batch, rng)

    return loss_fn


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
