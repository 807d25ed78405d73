"""Mixed-precision policy.

TPU-native replacement for the reference's AMP/bf16 plumbing (DeepSpeed
``bf16: "auto"`` in configs/*.json and ``--bf16`` in scripts/train/*.sh).
Params are kept in ``param_dtype`` (fp32 by default so the optimizer sees full
precision), compute runs in ``compute_dtype`` (bf16 on the MXU), and numerically
sensitive reductions (layernorm, softmax, loss) accumulate in fp32.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_param(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.param_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_output(self, x):
        return x.astype(self.output_dtype)


DEFAULT_POLICY = Policy()
BF16_POLICY = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
FP32_POLICY = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


def policy_from_flags(bf16: bool = True, pure_bf16: bool = False) -> Policy:
    if pure_bf16:
        return BF16_POLICY
    if bf16:
        return DEFAULT_POLICY
    return FP32_POLICY
