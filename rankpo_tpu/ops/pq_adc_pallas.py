"""Pallas fused ADC kernel for the IVF+PQ search path.

The XLA decode formulations materialize per-row transients in HBM — the
one-hot decode streams a ``[chunk, m, 256]`` bf16 one-hot (64 B per stored
byte!) plus a ``[rows, D]`` bf16 reconstruction through HBM per search, so
a 1M-probed-row batch moves ~30 GB for ~0.3 TFLOP of useful work
(docs/BENCHMARKS.md, IVF+PQ caveat b). But ADC never needs the rows: with
a per-query lookup table ``lut[q, m, k] = q_sub[m] . codebook[m, k]`` the
score of a stored code row is ``sum_m lut[m, codes[m]]`` — the only HBM
traffic a search NEEDS is the probed CODES (m bytes/row) and the scores.

This kernel keeps it that way. Grid = (query, probe, capacity-block): the
probed ``[cblk, m]`` uint8 code block is fetched by the automatic pipeline
through a scalar-prefetch index_map (manual DMA was tried first and
rejected by Mosaic — it cannot slice a (4,1)-sublane-packed int8 memref at
a dynamic offset; the pipeline's own DMA machinery has no such limit and
double-buffers across grid steps for free), the query's ``[m, 256]`` LUT
block stays resident across its probe steps (consecutive-index fetch
elision), and the one-hot mask + select + reduce happens entirely in
VMEM/registers:

    mask [cblk, mch, 256] = (codes[:, mc:mc+mch, None] == iota_256)
    part [cblk, mch]      = sum_lanes(where(mask, lut[mc:mc+mch], 0))
    out  [1, cblk]        = ones[1, mch] . acc[cblk, mch]   (MXU matvec)

Two tilings bound the scoped-VMEM stack (Mosaic keeps every PYTHON-
unrolled iteration's mask transient live simultaneously — measured:
cap=1592, m=64 blew the 16 MB limit with "Scoped allocation with size
50.00M"; in-kernel fori_loop/dynamic_slice alternatives do not lower —
lane-dim dynamic slicing is unimplemented in Mosaic):
- m is processed in ``_MCH``-sized statically-unrolled chunks, and
- the capacity dimension is split into ``cblk``-row grid blocks
  (``_cap_block``: the largest x64 divisor of cap whose unrolled mask
  stack fits ``_STACK_BUDGET``). ``IVFIPIndex`` rounds PQ capacities up
  to x64 at build so a valid cblk always exists; loaded legacy indexes
  with unfriendly capacities fall back to the XLA decode (``supported``).

The output is written as ``[Q, P, cap/cblk, cblk]`` blocks and reshaped
to ``[Q, P, cap]`` by the caller (same memory order — free).

Contract: ``pq_probe_scores(codes, probe, lut, cap=...)`` returns fp32
scores ``[Q, P, capacity]`` equal (fp32 sums of fp32 LUT entries; the XLA
paths round the reconstruction to bf16 first, so near-ties may reorder)
to

    lut_flat = lut.reshape(Q, m * 256)
    idx = codes.reshape(K, cap, m)[probe] + iota(m) * 256
    scores = take_along_axis(lut_flat, idx).sum(-1)

Used by ``IVFIPIndex`` for pq_m searches on TPU; every caller keeps the
XLA one-hot/take fallback (CPU tests run the fallback — Mosaic is
TPU-only). Reference analog: FAISS IndexIVFPQ's ``scan_codes`` ADC loop
(the reference itself only builds IndexFlatIP, src/utils.py:38-56).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


PQ_K = 256  # 8-bit codes

_MCH = 8  # m-chunk: the [cblk, _MCH, 256] mask transient is cblk*8 KB fp32

# scoped-VMEM stack budget for the unrolled mask transients: the full
# m-unroll keeps ~cblk * m * 256 * 2 B live (measured from the cap=1592
# OOM: 50 MB = 8 chunks x cap*2048*2 B); 10 MB leaves margin under the
# 16 MB scoped limit. cap=320 (the 1M regime) stays a single block.
_STACK_BUDGET = 10 * (1 << 20)

# CPU tests monkeypatch this to route the IVF+PQ search path through the
# kernel in interpret mode (the TPU gate in index/ivf.py honors it)
FORCE_INTERPRET = False


def _cap_block(cap: int, m: int) -> Optional[int]:
    """Largest divisor of ``cap`` whose unrolled mask stack fits the
    budget: cap itself when small (x8 for the sublane rule), else the
    largest x64 divisor under the budget. None = no legal tiling (the
    caller falls back to the XLA decode)."""
    limit = max(1, _STACK_BUDGET // (m * PQ_K * 2))
    if cap <= limit and cap % 8 == 0:
        return cap
    best = None
    for blk in range(64, min(cap, limit) + 1, 64):
        if cap % blk == 0:
            best = blk
    return best


def supported(cap: int, m: int) -> bool:
    """Whether the kernel has a legal, budget-fitting tiling at this
    (capacity, pq_m) — the ``IVFIPIndex`` dispatch gate."""
    return m % _MCH == 0 and _cap_block(cap, m) is not None


def _cap_block_t(cap: int, m: int) -> Optional[int]:
    """Capacity block for the TRANSPOSED kernel: blocks slice the LANE
    dimension of ``codes_t [m, slots]``, so they must be x128 (int8 tile
    boundaries) — the largest x128 divisor of cap under the stack budget.
    ``IVFIPIndex`` rounds transposed-layout capacities to x128 at build,
    so 128 always divides."""
    limit = max(1, _STACK_BUDGET // (m * PQ_K * 2))
    best = None
    for blk in range(128, min(cap, max(limit, 128)) + 1, 128):
        if cap % blk == 0:
            best = blk
    return best


def supported_t(cap: int, m: int) -> bool:
    """Transposed-kernel dispatch gate: m must chunk (x8) AND pack the
    int8 SUBLANE dim without padding (x32 — below that the transposed
    layout itself would pad sublanes up to 32, costing more memory than
    the row layout's lane padding saves), and cap must tile x128."""
    return m % _MCH == 0 and m % 32 == 0 and _cap_block_t(cap, m) is not None


def _kernel(probe_ref, lut_ref, codes_ref, out_ref, *, cblk: int, m: int,
            mxu: bool):
    """One grid step = one (query, probe, cap-block) triple."""
    # & 255 keeps the value range right whether the codes arrive as uint8
    # or as an int8 bitcast (sign-extension fixup)
    codes = codes_ref[...].astype(jnp.int32) & 255  # [cblk, m]

    acc = jnp.zeros((cblk, _MCH), jnp.float32)
    for mc in range(0, m, _MCH):  # static unroll, m/_MCH iterations
        sub = codes[:, mc:mc + _MCH]  # [cblk, mch]
        lut_sub = lut_ref[0, pl.dslice(mc, _MCH), :]  # [mch, 256] fp32
        if mxu:
            # the select+lane-reduce as ONE 2-D matmul: one-hot mask
            # [cblk, mch*256] bf16 x block-diagonal LUT [mch*256, mch] —
            # the compare is the only elementwise pass over the big
            # transient; the 2048-deep reduction rides the MXU. (A
            # batched [mch, cblk, 256] x [mch, 256, 1] matvec was tried
            # first: Mosaic rejects minor-dim insertion on bf16.)
            iota = lax.broadcasted_iota(
                jnp.int32, (cblk, _MCH, PQ_K), dimension=2
            )
            mask = (sub[:, :, None] == iota).astype(jnp.bfloat16).reshape(
                cblk, _MCH * PQ_K
            )
            t_row = lax.broadcasted_iota(
                jnp.int32, (_MCH, PQ_K, _MCH), dimension=0
            )
            t_col = lax.broadcasted_iota(
                jnp.int32, (_MCH, PQ_K, _MCH), dimension=2
            )
            lutblk = jnp.where(
                t_row == t_col, lut_sub[:, :, None], 0.0
            ).reshape(_MCH * PQ_K, _MCH).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                mask, lutblk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            iota = lax.broadcasted_iota(
                jnp.int32, (cblk, _MCH, PQ_K), dimension=2
            )
            mask = sub[:, :, None] == iota
            part = jnp.where(mask, lut_sub[None, :, :], 0.0)
            acc = acc + jnp.sum(part, axis=2)  # lane reduce -> [cblk, mch]

    # cross-chunk reduce AND the [cblk]-as-lanes relayout in one matvec
    ones = jnp.ones((1, _MCH), jnp.float32)
    s = jax.lax.dot_general(
        ones, acc,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST: the default rounds the fp32 partials to bf16 on the MXU
        # (measured 0.022 abs score error); the matvec is tiny, exact fp32
        # costs nothing
        precision=jax.lax.Precision.HIGHEST,
    )  # [1, cblk]
    out_ref[0, 0, 0] = s


def _kernel_t(probe_ref, lut_ref, codes_ref, out_ref, *, cblk: int, m: int,
              via_transpose: bool):
    """Transposed-layout grid step: the code block arrives [m, cblk]
    (natural slices of ``codes_t [m, slots]`` — no relayout copy at any m,
    the whole point of the layout). Two compute orientations:

    - native (via_transpose=False): one-hot select/reduce with the roles
      of the two non-256 dims swapped vs ``_kernel``; the cross-chunk
      matvec contracts the m-chunk dim directly into the [1, cblk] output
      row (cblk is already the lane dim — no relayout-by-matmul needed).
    - via_transpose=True: transpose the small [m, cblk] int block in VMEM
      once and run EXACTLY the row kernel's mask orientation
      ([cblk, mch, 256] transients) — measured A/B on v5e decides the
      default (the mask build is the kernel's bound, so its vector
      orientation matters more than the one extra block transpose)."""
    codes = codes_ref[...].astype(jnp.int32) & 255  # [m, cblk]

    if via_transpose:
        codes = codes.T  # [cblk, m] — one VMEM relayout per grid step
        acc = jnp.zeros((cblk, _MCH), jnp.float32)
        for mc in range(0, m, _MCH):
            sub = codes[:, mc:mc + _MCH]  # [cblk, mch]
            lut_sub = lut_ref[0, pl.dslice(mc, _MCH), :]  # [mch, 256]
            iota = lax.broadcasted_iota(
                jnp.int32, (cblk, _MCH, PQ_K), dimension=2
            )
            mask = sub[:, :, None] == iota
            part = jnp.where(mask, lut_sub[None, :, :], 0.0)
            acc = acc + jnp.sum(part, axis=2)  # [cblk, mch]
        ones = jnp.ones((1, _MCH), jnp.float32)
        s = jax.lax.dot_general(
            ones, acc,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [1, cblk] — reduce + lanes relayout in one matvec (cf. _kernel)
        out_ref[0, 0, 0] = s
        return

    acc = jnp.zeros((_MCH, cblk), jnp.float32)
    for mc in range(0, m, _MCH):  # static unroll, m/_MCH iterations
        sub = codes[mc:mc + _MCH, :]  # [mch, cblk]
        lut_sub = lut_ref[0, pl.dslice(mc, _MCH), :]  # [mch, 256] fp32
        iota = lax.broadcasted_iota(
            jnp.int32, (_MCH, cblk, PQ_K), dimension=2
        )
        mask = sub[:, :, None] == iota
        part = jnp.where(mask, lut_sub[:, None, :], 0.0)
        acc = acc + jnp.sum(part, axis=2)  # lane reduce -> [mch, cblk]

    ones = jnp.ones((1, _MCH), jnp.float32)
    s = jax.lax.dot_general(
        ones, acc,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # cf. _kernel
    )  # [1, cblk]
    out_ref[0, 0, 0] = s


@functools.partial(
    jax.jit, static_argnames=("cap", "interpret", "via_transpose")
)
def pq_probe_scores_t(codes_t, probe, lut, *, cap: int,
                      interpret: bool = False,
                      via_transpose: bool = True):
    """fp32 ADC scores [Q, P, cap] against TRANSPOSED codes.

    codes_t: [m, K_c * cap] uint8 — subvector-major PQ codes. The row
        layout's (8/32, 128) tile pads m < 128 up to 128 lanes, which at
        the 100M x m=64 tier materialized a 15.5 GB relayout copy per
        search call (docs/BENCHMARKS.md round 4) and ~6% hidden copy tax
        on smaller tiers; [m, slots] puts the huge dim on the lanes and
        tiles padding-free at any m x32.
    probe: [Q, P] int32 local cluster ids
    lut:   [Q, m, 256] fp32 per-query tables

    Same contract as ``pq_probe_scores`` (fp32 sums of fp32 LUT entries).
    """
    q_n, p_probe = probe.shape
    m = codes_t.shape[0]
    if m % _MCH != 0:
        raise ValueError(f"pq_m must be a multiple of {_MCH}, got {m}")
    cblk = _cap_block_t(cap, m)
    if cblk is None:
        raise ValueError(
            f"no legal transposed capacity tiling for cap={cap}, m={m} — "
            "gate the dispatch on pq_adc_pallas.supported_t()"
        )
    n_cblk = cap // cblk
    kernel = functools.partial(
        _kernel_t, cblk=cblk, m=m, via_transpose=via_transpose
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(q_n, p_probe, n_cblk),
        in_specs=[
            pl.BlockSpec(
                (1, m, PQ_K), lambda qi, pi, ci, probe_ref: (qi, 0, 0)
            ),
            # the probed code sub-block, in units of cblk LANES: cluster
            # probe[qi, pi] starts at block probe * n_cblk of the
            # [m, K_c * n_cblk x cblk]-viewed codes
            pl.BlockSpec(
                (m, cblk),
                lambda qi, pi, ci, probe_ref: (
                    0, probe_ref[qi, pi] * n_cblk + ci
                ),
            ),
        ],
        out_specs=pl.BlockSpec(  # cf. pq_probe_scores' 5-D out spec
            (1, 1, 1, 1, cblk),
            lambda qi, pi, ci, probe_ref: (qi, pi, ci, 0, 0),
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (q_n, p_probe, n_cblk, 1, cblk), jnp.float32
        ),
        interpret=interpret,
    )(probe, lut.astype(jnp.float32), codes_t)
    return out.reshape(q_n, p_probe, cap)


@functools.partial(jax.jit, static_argnames=("cap", "interpret", "mxu"))
def pq_probe_scores(codes, probe, lut, *, cap: int, interpret: bool = False,
                    mxu: bool = False):
    """fp32 ADC scores [Q, P, cap] of per-query LUTs against probed codes.

    codes: [K_c * cap, m] uint8 cluster-major PQ codes
    probe: [Q, P] int32 local cluster ids
    lut:   [Q, m, 256] fp32 per-query tables (q_sub . codebook entries)
    interpret: run the kernel in interpret mode (CPU tests)
    mxu: route the one-hot select+reduce through the MXU as one
        [cblk, m_ch*256] x block-diag-LUT matmul (rounds LUT entries to
        bf16). Measured on v5e at [1.31M slots, m=64, p=8]: wins only at
        Q=8 (1.69 vs 2.31 ms) where the search path dispatches
        take-reconstruct anyway (1.17 ms), and LOSES at the kernel's
        actual shapes (Q=64: 13.9 vs 12.2 ms; Q=256: 33.1 vs 28.5 ms) —
        building the one-hot mask is the bound either way, and the MXU
        path pays an extra mask relayout plus the block-diagonal LUT
        materialization per m-chunk. Kept as a measured variant; the
        search path uses the VPU default.
    """
    q_n, p_probe = probe.shape
    m = codes.shape[1]
    if m % _MCH != 0:
        raise ValueError(f"pq_m must be a multiple of {_MCH}, got {m}")
    cblk = _cap_block(cap, m)
    if cblk is None:
        raise ValueError(
            f"no legal capacity tiling for cap={cap}, m={m} — gate the "
            "dispatch on pq_adc_pallas.supported()"
        )
    n_cblk = cap // cblk
    kernel = functools.partial(_kernel, cblk=cblk, m=m, mxu=mxu)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(q_n, p_probe, n_cblk),
        in_specs=[
            pl.BlockSpec(
                (1, m, PQ_K), lambda qi, pi, ci, probe_ref: (qi, 0, 0)
            ),
            # the probed code sub-block, in units of cblk rows: cluster
            # probe[qi, pi] starts at block probe * n_cblk of the
            # [K_c * n_cblk, cblk, m]-viewed codes
            pl.BlockSpec(
                (cblk, m),
                lambda qi, pi, ci, probe_ref: (
                    probe_ref[qi, pi] * n_cblk + ci, 0
                ),
            ),
        ],
        # 5-D output: [Q, P, n_cblk, 1, cblk] blocks, reshaped to
        # [Q, P, cap] by the caller (identical memory order). The size-1
        # fourth dim exists for the same reason the old 4-D spec had one:
        # a block's last two dims must tile the array exactly (or be
        # x8/x128), and (1, cblk) against array dims (1, cblk) satisfies
        # that for any cblk — against (n_cblk, cblk) it would not.
        out_specs=pl.BlockSpec(
            (1, 1, 1, 1, cblk),
            lambda qi, pi, ci, probe_ref: (qi, pi, ci, 0, 0),
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (q_n, p_probe, n_cblk, 1, cblk), jnp.float32
        ),
        interpret=interpret,
    )(probe, lut.astype(jnp.float32), codes)
    return out.reshape(q_n, p_probe, cap)
