"""Pallas probed-cluster score kernel for the IVF search path.

XLA formulations of "gather the probed clusters' rows and dot them with
the query" top out at ~110 GB/s on v5e (row-level take; the whole-block
take is far worse at small query batches — benchmarks/gather_probe.py),
~7x below what the HBM streams through a matmul. The access pattern is
dynamic but perfectly block-structured: per (query, probe) ONE contiguous
``[capacity, D]`` cluster block. That is the classic scalar-prefetch +
double-buffered-DMA Pallas pattern (the corpus stays in HBM/ANY; the
kernel streams the probed blocks through two VMEM buffers and fuses the
score dot), which this module implements.

Contract: ``probe_scores(corpus, probe, queries)`` returns fp32 scores
``[Q, P, capacity]`` equal (to bf16-dot accumulation) to

    jnp.einsum("qd,qpcd->qpc", queries, corpus.reshape(K, cap, D)[probe])

Used by ``IVFIPIndex`` when enabled; every caller keeps the XLA row-take
fallback (CPU tests run the fallback — Mosaic is TPU-only).
Reference analog: the probed-list scan inside FAISS IndexIVFFlat's
``search_preassigned`` (the reference itself only builds IndexFlatIP,
src/utils.py:38-56).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


NBUF = 3  # TRIPLE buffering: with 2 buffers the async matmul can still be
# streaming buffer (p%2) when iteration p+1 starts the DMA overwriting it
# — Mosaic cannot see that a manual DMA aliases an in-flight matmul's
# operand (measured: ~3% stale score elements at 1M/Q=8 with 2 buffers);
# a slot is only rewritten NBUF iterations after its last consumer issued


def _kernel(probe_ref, q_ref, corpus_ref, out_ref, buf_ref, sem_ref, *,
            cap: int, p_probe: int, precision):
    """One grid step = one query: stream its ``p_probe`` cluster blocks
    HBM -> VMEM with triple buffering, fused dot per block."""
    qi = pl.program_id(0)

    def copy_in(p_idx, slot):
        blk = probe_ref[qi, p_idx]
        return pltpu.make_async_copy(
            corpus_ref.at[pl.dslice(blk * cap, cap), :],
            buf_ref.at[slot],
            sem_ref.at[slot],
        )

    copy_in(0, 0).start()

    def body(p_idx, carry):
        slot = lax.rem(p_idx, NBUF)

        @pl.when(p_idx + 1 < p_probe)
        def _():
            copy_in(p_idx + 1, lax.rem(p_idx + 1, NBUF)).start()

        copy_in(p_idx, slot).wait()
        # fp32 operands: Mosaic's transposed-rhs bf16 matmul rounds between
        # contraction passes (measured ~0.7% max score error vs the fp32-
        # accumulating XLA einsum); the dot is DMA-shadowed, so the fp32
        # pass cost is free. Inputs remain the bf16-rounded stored rows —
        # scores match the XLA path's fp32-accum contract.
        rows = buf_ref[slot].astype(jnp.float32)  # [cap, D]
        qv = q_ref[0, :, :].astype(jnp.float32)  # [1, D] (2-D: Mosaic's
        # matmul rejects 1-D operands)
        s = jax.lax.dot_general(
            qv, rows,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # [1, cap]
        out_ref[0, pl.dslice(p_idx, 1), :] = s
        return carry

    lax.fori_loop(0, p_probe, body, 0)


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def probe_scores(corpus, probe, queries, *, cap: int, interpret: bool = False):
    """fp32 scores [Q, P, cap] of ``queries`` against the probed clusters.

    corpus: [K_c * cap, D] cluster-major rows (bf16/fp32), resident in HBM
    probe:  [Q, P] int32 local cluster ids
    queries:[Q, D] fp32 (cast to the storage dtype for the dot, matching
            the XLA path's compute dtype)
    interpret: run the kernel in interpret mode (CPU tests)
    """
    q_n, p_probe = probe.shape
    d = corpus.shape[1]
    # fp32 storage: the DEFAULT matmul precision rounds fp32 inputs to
    # bf16 (measured 1.9e-4 score error); HIGHEST restores true-fp32
    # products, and the dot is DMA-shadowed so the multi-pass cost is
    # free. bf16 storage is exact already (bf16-valued fp32 operands).
    precision = (
        jax.lax.Precision.HIGHEST
        if corpus.dtype == jnp.float32 else None
    )
    kernel = functools.partial(
        _kernel, cap=cap, p_probe=p_probe, precision=precision
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(q_n,),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda qi, probe_ref: (qi, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # corpus stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, p_probe, cap), lambda qi, probe_ref: (qi, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((NBUF, cap, d), corpus.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q_n, p_probe, cap), jnp.float32),
        interpret=interpret,
    )(probe, queries.reshape(q_n, 1, d), corpus)
