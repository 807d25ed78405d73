"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's NCCL/torchrun bring-up
(reference: src/modeling.py:193-201 rank/world-size capture,
scripts/train/run_contrastive.sh torchrun spawn). Instead of per-process ranks we
build a single `jax.sharding.Mesh` whose axes map onto ICI (within a slice) and DCN
(across slices); `jit` + `NamedSharding` then place data/params and XLA inserts the
collectives (the analog of `dist.all_gather` in modeling.py:331-404, which is
differentiable by construction here).

Axes:
  - ``data``:  data parallelism — batch is sharded here; optimizer state is sharded
               here too (ZeRO-1 analog of configs/ds_zero1_config_llama.json).
  - ``model``: tensor parallelism — attention heads / MLP hidden dim sharded here
               (the reference has no TP; this is a TPU-first extension).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Declarative mesh shape. ``data_parallel=-1`` means "all remaining devices"."""

    data_parallel: int = -1
    model_parallel: int = 1
    axis_names: tuple = (DATA_AXIS, MODEL_AXIS)

    def resolve(self, n_devices: int) -> tuple:
        mp = max(1, self.model_parallel)
        dp = self.data_parallel
        if dp == -1:
            if n_devices % mp != 0:
                raise ValueError(
                    f"model_parallel={mp} does not divide device count {n_devices}"
                )
            dp = n_devices // mp
        if dp * mp != n_devices:
            raise ValueError(
                f"mesh {dp}x{mp} != available devices {n_devices}"
            )
        return (dp, mp)


def make_mesh(
    config: MeshConfig | None = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D (data, model) mesh over the given devices.

    Device ordering follows ``jax.devices()`` which on TPU enumerates devices so
    that adjacent ids are ICI neighbors; we put ``model`` innermost so tensor-
    parallel collectives ride the fastest links.
    """
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    dp, mp = config.resolve(len(devices))
    dev_array = np.array(devices).reshape(dp, mp)
    return Mesh(dev_array, config.axis_names)


def local_mesh() -> Mesh:
    """A pure-data-parallel mesh over all local devices (single-chip friendly)."""
    return make_mesh(MeshConfig(data_parallel=-1, model_parallel=1))


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up (analog of torchrun env init). No-op for single host."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host-side pytree of arrays on the mesh, batch-sharded on axis 0."""
    sharding = batch_sharding(mesh)

    def _put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, tree)


def replicate_to_mesh(tree, mesh: Mesh):
    """Place a host pytree fully replicated on the mesh. Single-process this is
    a plain device_put; multi-process (every host holds identical values, e.g.
    params loaded from the same checkpoint) it builds global arrays via
    make_array_from_callback — device_put cannot target shardings that span
    other processes' devices."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def _put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    return jax.tree_util.tree_map(_put, tree)


def place_global(tree, shardings):
    """Place a host pytree onto per-leaf shardings, working across processes
    (every host must hold the full value for each leaf). Single-process this
    is a plain device_put; multi-process, device_put cannot target shardings
    that span other hosts' devices, so global arrays are built from the
    identical host copies via make_array_from_callback."""
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(jax.device_put, tree, shardings)

    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree, shardings)


def shard_rows_to_mesh(array: np.ndarray, mesh: Mesh) -> jax.Array:
    """Place a host array on the mesh sharded over the data axis on dim 0,
    working across processes (every host holds the full array)."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    array = np.asarray(array)
    return jax.make_array_from_callback(
        array.shape, sharding, lambda idx: array[idx]
    )


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0
