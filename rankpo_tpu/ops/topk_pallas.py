"""Pallas TPU kernel for fused matmul + running top-k (placeholder gate).

The kernel streams corpus tiles HBM→VMEM with double buffering, does the
[Q_tile, D]x[D, N_tile] dot on the MXU and merges a running top-k in VMEM —
see rankpo_tpu/ops/topk.py for the contract it must satisfy. Until the kernel
lands, ``pallas_supported`` returns False and callers use the lax.scan path
(which XLA already pipelines well).
"""

from __future__ import annotations

from typing import Tuple

import jax


def pallas_supported(q_shape, c_shape, k: int) -> bool:
    return False


def pallas_matmul_topk(
    queries: jax.Array,
    corpus: jax.Array,
    *,
    k: int,
    n_valid=None,
    index_offset=0,
) -> Tuple[jax.Array, jax.Array]:
    raise NotImplementedError("pallas matmul_topk kernel not yet enabled")
