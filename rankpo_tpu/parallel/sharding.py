"""Parameter and optimizer-state sharding rules.

TPU-native replacement for the reference's DeepSpeed ZeRO configs
(configs/ds_zero1_config_llama.json etc., SURVEY.md §2.3):

  - Tensor parallelism (``model`` axis; a TPU-first extension — the reference
    has none): attention QKV and MLP up/gate kernels are sharded on their
    output dim, O/down kernels on their input dim, so each layer does
    sharded-matmul → psum exactly once per block (Megatron layout). Biases
    follow their kernel's output sharding.
  - ZeRO-1 (``data`` axis): parameters stay replicated across data-parallel
    devices, but optimizer moments are sharded over ``data`` on each leaf's
    largest divisible dimension. Under ``jit`` XLA then reduce-scatters grads
    into the moment shards and all-gathers the param update — the same
    communication schedule DeepSpeed stage 1 hand-implements.

All rules are expressed as PartitionSpec pytrees consumed by
``jax.jit(in_shardings=..., out_shardings=...)``; GSPMD inserts the collectives.
"""

from __future__ import annotations


import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rankpo_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

# Path-suffix → spec for stacked [L, in, out] kernels (llama) and
# [L, in, out]/[L, out] dense params (roberta). Matched on the last two
# path components joined with '.'.
_LLAMA_RULES = {
    "q_proj.kernel": P(None, None, MODEL_AXIS),
    "k_proj.kernel": P(None, None, MODEL_AXIS),
    "v_proj.kernel": P(None, None, MODEL_AXIS),
    "gate_proj.kernel": P(None, None, MODEL_AXIS),
    "up_proj.kernel": P(None, None, MODEL_AXIS),
    "o_proj.kernel": P(None, MODEL_AXIS, None),
    "down_proj.kernel": P(None, MODEL_AXIS, None),
}

_ROBERTA_RULES = {
    "query.kernel": P(None, None, MODEL_AXIS),
    "key.kernel": P(None, None, MODEL_AXIS),
    "value.kernel": P(None, None, MODEL_AXIS),
    "intermediate.kernel": P(None, None, MODEL_AXIS),
    "query.bias": P(None, MODEL_AXIS),
    "key.bias": P(None, MODEL_AXIS),
    "value.bias": P(None, MODEL_AXIS),
    "intermediate.bias": P(None, MODEL_AXIS),
    "attn_output.kernel": P(None, MODEL_AXIS, None),
    "output.kernel": P(None, MODEL_AXIS, None),
}

_RULES = {**_LLAMA_RULES, **_ROBERTA_RULES}


def _path_str(path) -> str:
    return ".".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def param_partition_specs(params, model_axis_size: int = 1):
    """PartitionSpec pytree for parameters: TP rules on the model axis,
    replicated over data. With model_axis_size == 1 everything is replicated."""

    def spec_for(path, leaf):
        if model_axis_size <= 1:
            return P()
        ps = _path_str(path)
        for suffix, spec in _RULES.items():
            if ps.endswith(suffix):
                # only shard if the sharded dim divides evenly
                dims = list(spec)
                for d, axis in enumerate(dims):
                    if axis == MODEL_AXIS and leaf.shape[d] % model_axis_size != 0:
                        return P()
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def zero1_partition_specs(tree, data_axis_size: int, model_axis_size: int = 1):
    """Specs for optimizer moments: like the params' TP spec, plus the largest
    remaining dimension sharded over ``data`` (ZeRO-1). Leaves with no
    dimension divisible by the data axis stay replicated over data."""
    param_specs = param_partition_specs(tree, model_axis_size)

    def shard_leaf(path, leaf, pspec):
        if data_axis_size <= 1:
            return pspec
        dims = list(pspec) + [None] * (leaf.ndim - len(pspec))
        # pick the largest dim not already taken by the model axis
        order = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
        changed = False
        for d in order:
            if dims[d] is None and leaf.shape[d] % data_axis_size == 0:
                dims[d] = DATA_AXIS
                changed = True
                break
        # secondary: leaves with no TP rule (embed table, norms) also give a
        # free dim to the model axis. Without this the backward hands GSPMD
        # model-sharded grads (e.g. the embed grad inherits the hidden dim's
        # model sharding from the first matmul's backward) whose transition
        # to a data-only-sharded target is unsolvable without replicating —
        # the "[SPMD] Involuntary full rematerialization" warning the r3
        # dryrun tail showed on the fsdp step. With the model axis in the
        # target layout the transition is a local slice. (More moment/param
        # sharding is also strictly less memory.) This pass runs even when
        # no dim divides the data axis — such a leaf's grad can still arrive
        # model-sharded and faces the same replicate transition.
        if model_axis_size > 1 and MODEL_AXIS not in dims:
            for d in order:
                if dims[d] is None and leaf.shape[d] % model_axis_size == 0:
                    dims[d] = MODEL_AXIS
                    changed = True
                    break
        return P(*dims) if changed else pspec

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf, ps: shard_leaf(path, leaf, ps), tree, param_specs
    )


def fsdp_partition_specs(params, data_axis_size: int, model_axis_size: int = 1):
    """ZeRO-3 / FSDP analog (the tier ABOVE the reference's DeepSpeed
    configs — it ships only stage 1/2, configs/ds_zero*_config_*.json, and
    a stage-3 path for the frozen RankPO ref model,
    rankpo_trainer.py:307-321): the PARAMETERS themselves shard over the
    data axis, on each leaf's largest divisible dim not already taken by
    tensor parallelism — the exact rule ZeRO-1 applies to the moments.
    Under ``jit`` GSPMD all-gathers each weight right before its matmul and
    reduce-scatters its gradient, the communication schedule FSDP
    hand-implements; with remat the backward re-gathers instead of keeping
    the full weight alive. Per-device param memory drops ~1/dp; the cost is
    an all-gather per weight per use."""
    return zero1_partition_specs(params, data_axis_size, model_axis_size)


def make_shardings(mesh: Mesh, specs):
    """PartitionSpec pytree → NamedSharding pytree."""
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
