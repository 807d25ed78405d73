"""Pallas TPU flash attention (forward + backward), FlashAttention-2 style.

Replaces the reference's flash-attn-2 CUDA dependency (src/modeling.py:145-146,
README.md:81) for the encoder hot loop at seq 1280/4096. Design:

  - grid (batch·heads, q_blocks), q-blocks innermost; one q tile in VMEM per
    step, K/V for the (batch, head) pinned in VMEM across q-block steps (the
    index map repeats, so the pipeline doesn't re-DMA); key blocks are looped
    INSIDE the kernel with online softmax (running max/sum + rescaled
    accumulator, all fp32).
  - GQA is zero-copy: the K/V BlockSpec index map divides the head index by the
    group count instead of materializing repeated heads.
  - padding: a per-row key-validity mask (the collators right-pad); causal
    masking for the Llama decoder-as-encoder path with whole-block skipping
    above the diagonal.
  - backward: standard FA2 two-kernel scheme — dq over q blocks, dkv over key
    blocks — recomputing probabilities from the saved logsumexp.

TPU tiling notes: the last two dims of every block must be (multiple of 8,
multiple of 128) or equal the full array dims. Row-vector stats therefore
use: 8-sublane shared blocks for read-only inputs (mask/lse/delta as
[ceil8(BH), S] with block (8, S), the kernel picking row ``bh % 8``), and a
128-lane broadcast layout for the lse OUTPUT ([BH, Sq, 128], lane 0 sliced off
afterwards) — the same layout jax's shipped TPU kernel uses for l/m.

The XLA fallback in rankpo_tpu/ops/attention.py remains the correctness oracle;
tests run this kernel in interpret mode on CPU against it (values and grads).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30
LANES = 128
SUBLANES = 8

# profiled on v5e at B4 S4096 H16/KV8 D128 causal: q512/k1024 = 6.3ms vs
# XLA 33.3ms (5.3x) and jax's shipped TPU kernel 23.4ms (3.7x, zero-copy GQA)
DEFAULT_Q_BLOCK = 512
DEFAULT_K_BLOCK = 1024


def _row(ref):
    """The kernel's row inside an 8-sublane shared stats block."""
    return pl.program_id(0) % SUBLANES


def _fwd_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, scale, causal, k_block,
    skip_pad_q, window, q_shift, packed,
):
    q = q_ref[0]  # [Bq, D] in input dtype — keep dots on the bf16 MXU path
    bq, d = q.shape
    sk = k_ref.shape[1]
    n_kb = sk // k_block
    qi = pl.program_id(1)
    # bottom-right causal alignment for sq != sk (matches the XLA fallback's
    # tril(k=sk-sq) and HF): query row r has global position r + q_shift
    q_offset = qi * bq + q_shift
    mask_row = _row(mask_ref)
    if packed:
        # mask carries per-position SEGMENT IDS (0 = pad, 1..n = packed texts,
        # contiguous, pad tail); sq == sk enforced by the wrapper
        seg_q = mask_ref[mask_row, pl.ds(qi * bq, bq)]  # [Bq]

    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)

    def body(kb, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(kb * k_block, k_block), :]
        v_blk = v_ref[0, pl.ds(kb * k_block, k_block), :]
        s = scale * jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Bq, Bk] fp32 accumulation off the bf16 MXU
        key_valid = mask_ref[mask_row, pl.ds(kb * k_block, k_block)]  # [Bk]
        valid = jnp.broadcast_to(key_valid[None, :] != 0, s.shape)
        if packed:
            valid = jnp.logical_and(
                valid, key_valid[None, :] == seg_q[:, None]
            )
        if causal:
            q_pos = q_offset + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, dimension=0
            )
            k_pos = kb * k_block + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, dimension=1
            )
            valid = jnp.logical_and(valid, k_pos <= q_pos)
            if window is not None:
                # sliding window (HF mistral rule): q attends keys with
                # q_pos - k_pos < window
                valid = jnp.logical_and(valid, k_pos > q_pos - window)
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        # rows where every key is masked have m_new == NEG_INF and would get
        # p == exp(0) == 1 uniformly; force masked entries to 0 so such rows
        # keep l == 0 and fall into the zeros path
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    # skip fully-masked key blocks: collators right-pad, so the valid key
    # count bounds the loop (huge win when texts are far shorter than the
    # static max length)
    seg_row = mask_ref[mask_row, :]
    key_len = jnp.sum((seg_row != 0).astype(jnp.int32))
    n_iter = jnp.minimum((key_len + k_block - 1) // k_block, n_kb)
    start = 0
    if causal:
        # also skip blocks entirely above the diagonal
        last_kb = (q_offset + bq - 1) // k_block + 1
        n_iter = jnp.minimum(n_iter, last_kb)
        if window is not None:
            # blocks entirely below the window see no valid keys
            start = jnp.maximum(0, q_offset - window + 1) // k_block
    if packed:
        # band bounds from the segment layout: keys of segments < the block's
        # first segment (or > its last) are invisible to every row here, so the
        # loop covers only key blocks whose segments intersect the q block's.
        # A fully-pad q block has seg_last == 0 -> zero iterations (zeros path)
        seg_first = seg_q[0]
        seg_last = jnp.max(seg_q)
        start = jnp.maximum(
            start,
            jnp.sum(((seg_row != 0) & (seg_row < seg_first)).astype(jnp.int32))
            // k_block,
        )
        end_keys = jnp.sum(
            ((seg_row != 0) & (seg_row <= seg_last)).astype(jnp.int32)
        )
        n_iter = jnp.minimum(n_iter, (end_keys + k_block - 1) // k_block)
    if skip_pad_q:
        # self-attention opt-in: a q block past the valid length runs zero
        # iterations — its rows output zeros, which masked keys make invisible
        # to every valid row downstream
        n_iter = jnp.where(q_offset < key_len, n_iter, 0)
    m, l, acc = jax.lax.fori_loop(start, n_iter, body, (m, l, acc))

    l_safe = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows -> zeros, not NaN
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse = m + jnp.log(l_safe)  # [Bq, 1]
    lse_ref[0] = jnp.broadcast_to(lse, (bq, LANES))


def _dq_kernel(
    q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale, causal, k_block, skip_pad_q, window, q_shift, packed,
):
    q = q_ref[0]
    do = do_ref[0]
    bq, d = q.shape
    sk = k_ref.shape[1]
    n_kb = sk // k_block
    qi = pl.program_id(1)
    q_offset = qi * bq + q_shift  # bottom-right causal alignment (see fwd)
    lse_offset = qi * bq  # stats are indexed by LOCAL query row
    row = _row(lse_ref)
    lse = lse_ref[row, pl.ds(lse_offset, bq)][:, None]
    delta = delta_ref[row, pl.ds(lse_offset, bq)][:, None]
    mask_row = _row(mask_ref)
    if packed:
        seg_q = mask_ref[mask_row, pl.ds(qi * bq, bq)]  # see _fwd_kernel

    def body(kb, dq):
        k_blk = k_ref[0, pl.ds(kb * k_block, k_block), :]
        v_blk = v_ref[0, pl.ds(kb * k_block, k_block), :]
        s = scale * jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        key_valid = mask_ref[mask_row, pl.ds(kb * k_block, k_block)]
        valid = jnp.broadcast_to(key_valid[None, :] != 0, s.shape)
        if packed:
            valid = jnp.logical_and(
                valid, key_valid[None, :] == seg_q[:, None]
            )
        if causal:
            q_pos = q_offset + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            k_pos = kb * k_block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            valid = jnp.logical_and(valid, k_pos <= q_pos)
            if window is not None:
                valid = jnp.logical_and(valid, k_pos > q_pos - window)
        s = jnp.where(valid, s, NEG_INF)
        # masked entries stay exactly 0 (rows with no valid key have
        # lse == NEG_INF, where exp(s - lse) would be 1)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)  # [Bq, Bk]
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        return dq + jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    seg_row = mask_ref[mask_row, :]
    key_len = jnp.sum((seg_row != 0).astype(jnp.int32))
    n_iter = jnp.minimum((key_len + k_block - 1) // k_block, n_kb)
    start = 0
    if causal:
        last_kb = (q_offset + bq - 1) // k_block + 1
        n_iter = jnp.minimum(n_iter, last_kb)
        if window is not None:
            start = jnp.maximum(0, q_offset - window + 1) // k_block
    if packed:
        seg_first = seg_q[0]
        seg_last = jnp.max(seg_q)
        start = jnp.maximum(
            start,
            jnp.sum(((seg_row != 0) & (seg_row < seg_first)).astype(jnp.int32))
            // k_block,
        )
        end_keys = jnp.sum(
            ((seg_row != 0) & (seg_row <= seg_last)).astype(jnp.int32)
        )
        n_iter = jnp.minimum(n_iter, (end_keys + k_block - 1) // k_block)
    if skip_pad_q:
        n_iter = jnp.where(q_offset < key_len, n_iter, 0)
    dq = jax.lax.fori_loop(start, n_iter, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale, causal, q_block, skip_pad_q, window, q_shift, packed,
):
    k = k_ref[0]  # [Bk, D]
    v = v_ref[0]
    bk, d = k.shape
    sq = q_ref.shape[1]
    n_qb = sq // q_block
    ki = pl.program_id(1)
    k_offset = ki * bk
    key_valid = mask_ref[_row(mask_ref), pl.ds(k_offset, bk)]
    stats_row = _row(lse_ref)
    mask_row = _row(mask_ref)

    def body(qb, carry):
        dk, dv = carry
        q_blk = q_ref[0, pl.ds(qb * q_block, q_block), :]
        do_blk = do_ref[0, pl.ds(qb * q_block, q_block), :]
        lse = lse_ref[stats_row, pl.ds(qb * q_block, q_block)][:, None]
        delta = delta_ref[stats_row, pl.ds(qb * q_block, q_block)][:, None]
        s = scale * jax.lax.dot_general(
            q_blk, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Bq, Bk]
        valid = jnp.broadcast_to(key_valid[None, :] != 0, s.shape)
        if packed:
            # sq == sk in packed mode, so the q block's segment ids live in
            # the same mask row at the q-block offset
            seg_q = mask_ref[mask_row, pl.ds(qb * q_block, q_block)]
            valid = jnp.logical_and(
                valid, key_valid[None, :] == seg_q[:, None]
            )
        if causal:
            q_pos = (
                qb * q_block + q_shift
                + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            )
            k_pos = k_offset + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            valid = jnp.logical_and(valid, k_pos <= q_pos)
            if window is not None:
                valid = jnp.logical_and(valid, k_pos > q_pos - window)
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dv_new = dv + jax.lax.dot_general(
            p.astype(do_blk.dtype), do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_blk, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        dk_new = dk + jax.lax.dot_general(
            ds.astype(q_blk.dtype), q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_new, dv_new

    if causal:
        # q blocks strictly above the (shifted) diagonal see no keys here
        start = jnp.maximum(0, k_offset - q_shift) // q_block
    else:
        start = 0
    # a key block entirely beyond the valid key length contributes nothing
    seg_row = mask_ref[mask_row, :]
    key_len = jnp.sum((seg_row != 0).astype(jnp.int32))
    end_q = n_qb
    if causal and window is not None:
        # q rows beyond k_pos + window - 1 cannot see this key block
        end_q = jnp.minimum(
            jnp.maximum(k_offset + bk + window - 2 - q_shift, 0) // q_block + 1,
            n_qb,
        )
    if packed:
        # only q blocks whose segments intersect this key block's contribute
        seg_k_first = key_valid[0]
        seg_k_last = jnp.max(key_valid)
        start = jnp.maximum(
            start,
            jnp.sum(
                ((seg_row != 0) & (seg_row < seg_k_first)).astype(jnp.int32)
            )
            // q_block,
        )
        end_rows = jnp.sum(
            ((seg_row != 0) & (seg_row <= seg_k_last)).astype(jnp.int32)
        )
        end_q = jnp.minimum(end_q, (end_rows + q_block - 1) // q_block)
    if skip_pad_q:
        # pad q rows carry zero cotangents in self-attention use; skip them
        end_q = jnp.minimum((key_len + q_block - 1) // q_block, end_q)
    end = jnp.where(k_offset < key_len, end_q, start)
    dk, dv = jax.lax.fori_loop(
        start, end, body,
        (jnp.zeros((bk, d), jnp.float32), jnp.zeros((bk, d), jnp.float32)),
    )
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_fused_kernel(
    q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref,
    *, scale, causal, q_block, skip_pad_q, window, q_shift, packed,
):
    """One-pass backward: grid (BH, k_blocks) like _dkv_kernel, but dq
    accumulates IN VMEM across the k-block grid steps (dq_ref's index map is
    constant in the k axis, so Pallas keeps the block resident and flushes
    once per head). s and dp are computed ONCE per (q,k) tile — 5 tile
    matmuls total instead of the split passes' 3 (dq) + 4 (dkv)."""
    k = k_ref[0]  # [Bk, D]
    v = v_ref[0]
    bk, d = k.shape
    sq = q_ref.shape[1]
    n_qb = sq // q_block
    ki = pl.program_id(1)
    k_offset = ki * bk
    key_valid = mask_ref[_row(mask_ref), pl.ds(k_offset, bk)]
    stats_row = _row(lse_ref)
    mask_row = _row(mask_ref)

    @pl.when(ki == 0)
    def _init_dq():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    def body(qb, carry):
        dk, dv = carry
        q_blk = q_ref[0, pl.ds(qb * q_block, q_block), :]
        do_blk = do_ref[0, pl.ds(qb * q_block, q_block), :]
        lse = lse_ref[stats_row, pl.ds(qb * q_block, q_block)][:, None]
        delta = delta_ref[stats_row, pl.ds(qb * q_block, q_block)][:, None]
        s = scale * jax.lax.dot_general(
            q_blk, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Bq, Bk]
        valid = jnp.broadcast_to(key_valid[None, :] != 0, s.shape)
        if packed:
            seg_q = mask_ref[mask_row, pl.ds(qb * q_block, q_block)]
            valid = jnp.logical_and(
                valid, key_valid[None, :] == seg_q[:, None]
            )
        if causal:
            q_pos = (
                qb * q_block + q_shift
                + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            )
            k_pos = k_offset + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            valid = jnp.logical_and(valid, k_pos <= q_pos)
            if window is not None:
                valid = jnp.logical_and(valid, k_pos > q_pos - window)
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dv_new = dv + jax.lax.dot_general(
            p.astype(do_blk.dtype), do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_blk, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta) * scale).astype(q_blk.dtype)
        dk_new = dk + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dq contribution of this key block (the split _dq_kernel's third
        # matmul, on the SAME s/p/dp — the whole point of the fusion)
        dq_blk = dq_ref[0, pl.ds(qb * q_block, q_block), :]
        dq_ref[0, pl.ds(qb * q_block, q_block), :] = (
            dq_blk + jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        return dk_new, dv_new

    if causal:
        start = jnp.maximum(0, k_offset - q_shift) // q_block
    else:
        start = 0
    seg_row = mask_ref[mask_row, :]
    key_len = jnp.sum((seg_row != 0).astype(jnp.int32))
    end_q = n_qb
    if causal and window is not None:
        end_q = jnp.minimum(
            jnp.maximum(k_offset + bk + window - 2 - q_shift, 0) // q_block + 1,
            n_qb,
        )
    if packed:
        seg_k_first = key_valid[0]
        seg_k_last = jnp.max(key_valid)
        start = jnp.maximum(
            start,
            jnp.sum(
                ((seg_row != 0) & (seg_row < seg_k_first)).astype(jnp.int32)
            )
            // q_block,
        )
        end_rows = jnp.sum(
            ((seg_row != 0) & (seg_row <= seg_k_last)).astype(jnp.int32)
        )
        end_q = jnp.minimum(end_q, (end_rows + q_block - 1) // q_block)
    if skip_pad_q:
        end_q = jnp.minimum((key_len + q_block - 1) // q_block, end_q)
    end = jnp.where(k_offset < key_len, end_q, start)
    dk, dv = jax.lax.fori_loop(
        start, end, body,
        (jnp.zeros((bk, d), jnp.float32), jnp.zeros((bk, d), jnp.float32)),
    )
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def _flatten_heads(x):
    # [B, S, H, D] -> [B*H, S, D]
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _unflatten_heads(x, b, h):
    bh, s, d = x.shape
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def fit_blocks(sq: int, sk: int, q_block: int = DEFAULT_Q_BLOCK,
               k_block: int = DEFAULT_K_BLOCK):
    """Shrink requested block sizes until they divide the sequence lengths
    (static shapes). Shared by flash_attention and the ring-attention tier."""
    q_block = min(q_block, sq)
    k_block = min(k_block, sk)
    while sq % q_block:
        q_block //= 2
    while sk % k_block:
        k_block //= 2
    return q_block, k_block


def _pad_rows8(x):
    """Pad dim 0 to a multiple of 8 (sublane requirement for shared stats)."""
    pad = (-x.shape[0]) % SUBLANES
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths)


def _stats_spec(s):
    """Read-only stats BlockSpec: [ceil8(BH), S] with 8-sublane shared blocks;
    the kernel picks row program_id(0) % 8."""
    return pl.BlockSpec((SUBLANES, s), lambda bhi, i: (bhi // SUBLANES, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def _flash(q, k, v, mask, causal, q_block, k_block, interpret, skip_pad_q,
           window, packed, bwd_impl="split"):
    out, _lse = _flash_fwd_impl(
        q, k, v, mask, causal, q_block, k_block, interpret, skip_pad_q, window,
        packed,
    )
    return out


def _flash_fwd_impl(q, k, v, mask, causal, q_block, k_block, interpret,
                    skip_pad_q, window, packed=False):
    bh, sq, d = q.shape
    bhkv, sk, _ = k.shape
    groups = bh // bhkv
    scale = 1.0 / (d**0.5)
    n_qb = sq // q_block

    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, k_block=k_block,
        skip_pad_q=skip_pad_q, window=window, q_shift=sk - sq, packed=packed,
    )
    out, lse3 = pl.pallas_call(
        kernel,
        grid=(bh, n_qb),
        in_specs=[
            pl.BlockSpec((1, q_block, d), lambda bhi, qi: (bhi, qi, 0)),
            pl.BlockSpec((1, sk, d), lambda bhi, qi, g=groups: (bhi // g, 0, 0)),
            pl.BlockSpec((1, sk, d), lambda bhi, qi, g=groups: (bhi // g, 0, 0)),
            _stats_spec(sk),
        ],
        out_specs=[
            pl.BlockSpec((1, q_block, d), lambda bhi, qi: (bhi, qi, 0)),
            pl.BlockSpec((1, q_block, LANES), lambda bhi, qi: (bhi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, _pad_rows8(mask))
    return out, lse3[:, :, 0]


def _flash_fwd(q, k, v, mask, causal, q_block, k_block, interpret, skip_pad_q,
               window, packed, bwd_impl="split"):
    out, lse = _flash_fwd_impl(
        q, k, v, mask, causal, q_block, k_block, interpret, skip_pad_q, window,
        packed,
    )
    return out, (q, k, v, mask, out, lse)


def flash_dq(q, k, v, mask, g, lse, delta, *, causal, q_block, k_block,
             interpret, skip_pad_q, window=None, packed=False):
    """dq for flattened [BH, S, D] inputs given upstream g and the forward's
    lse/delta stats [BH, S]. Reused by both the custom_vjp below and the ring
    attention backward (parallel/ring_attention.py)."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    groups = bh // k.shape[0]
    scale = 1.0 / (d**0.5)
    return pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, causal=causal,
                          k_block=k_block, skip_pad_q=skip_pad_q,
                          window=window, q_shift=sk - sq, packed=packed),
        grid=(bh, sq // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, d), lambda bhi, qi: (bhi, qi, 0)),
            pl.BlockSpec((1, sk, d), lambda bhi, qi, g_=groups: (bhi // g_, 0, 0)),
            pl.BlockSpec((1, sk, d), lambda bhi, qi, g_=groups: (bhi // g_, 0, 0)),
            _stats_spec(sk),
            pl.BlockSpec((1, q_block, d), lambda bhi, qi: (bhi, qi, 0)),
            _stats_spec(sq),
            _stats_spec(sq),
        ],
        out_specs=pl.BlockSpec((1, q_block, d), lambda bhi, qi: (bhi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        interpret=interpret,
    )(q, k, v, _pad_rows8(mask), g, _pad_rows8(lse), _pad_rows8(delta))


def flash_dkv(q, k, v, mask, g, lse, delta, *, causal, q_block, k_block,
              interpret, skip_pad_q, window=None, packed=False):
    """dk/dv (fp32, GQA-summed to [BHKV, S, D]) for flattened inputs; see
    flash_dq. dk/dv are computed per (query head, key block) and summed over
    each GQA group."""
    bh, sq, d = q.shape
    bhkv, sk, _ = k.shape
    groups = bh // bhkv
    scale = 1.0 / (d**0.5)
    dk_per_head, dv_per_head = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, causal=causal,
                          q_block=q_block, skip_pad_q=skip_pad_q,
                          window=window, q_shift=sk - sq, packed=packed),
        grid=(bh, sk // k_block),
        in_specs=[
            pl.BlockSpec((1, sq, d), lambda bhi, ki: (bhi, 0, 0)),
            pl.BlockSpec((1, k_block, d), lambda bhi, ki, g_=groups: (bhi // g_, ki, 0)),
            pl.BlockSpec((1, k_block, d), lambda bhi, ki, g_=groups: (bhi // g_, ki, 0)),
            _stats_spec(sk),
            pl.BlockSpec((1, sq, d), lambda bhi, ki: (bhi, 0, 0)),
            _stats_spec(sq),
            _stats_spec(sq),
        ],
        out_specs=[
            pl.BlockSpec((1, k_block, d), lambda bhi, ki: (bhi, ki, 0)),
            pl.BlockSpec((1, k_block, d), lambda bhi, ki: (bhi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, sk, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, _pad_rows8(mask), g, _pad_rows8(lse), _pad_rows8(delta))

    if groups > 1:
        dk = dk_per_head.reshape(bhkv, groups, sk, d).sum(axis=1)
        dv = dv_per_head.reshape(bhkv, groups, sk, d).sum(axis=1)
    else:
        dk, dv = dk_per_head, dv_per_head
    return dk, dv


def flash_bwd_fused(q, k, v, mask, g, lse, delta, *, causal, q_block, k_block,
                    interpret, skip_pad_q, window=None, packed=False):
    """One-pass dq+dk+dv (see _bwd_fused_kernel). dq comes back fp32 (the
    VMEM accumulator's dtype); dk/dv are fp32 per q-head, GQA-summed here
    like flash_dkv."""
    bh, sq, d = q.shape
    bhkv, sk, _ = k.shape
    groups = bh // bhkv
    scale = 1.0 / (d**0.5)
    dq, dk_per_head, dv_per_head = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, scale=scale, causal=causal,
                          q_block=q_block, skip_pad_q=skip_pad_q,
                          window=window, q_shift=sk - sq, packed=packed),
        grid=(bh, sk // k_block),
        in_specs=[
            pl.BlockSpec((1, sq, d), lambda bhi, ki: (bhi, 0, 0)),
            pl.BlockSpec((1, k_block, d), lambda bhi, ki, g_=groups: (bhi // g_, ki, 0)),
            pl.BlockSpec((1, k_block, d), lambda bhi, ki, g_=groups: (bhi // g_, ki, 0)),
            _stats_spec(sk),
            pl.BlockSpec((1, sq, d), lambda bhi, ki: (bhi, 0, 0)),
            _stats_spec(sq),
            _stats_spec(sq),
        ],
        out_specs=[
            # constant in ki -> revisited across the k-block axis: the
            # accumulator lives in VMEM for the whole head, one HBM flush
            pl.BlockSpec((1, sq, d), lambda bhi, ki: (bhi, 0, 0)),
            pl.BlockSpec((1, k_block, d), lambda bhi, ki: (bhi, ki, 0)),
            pl.BlockSpec((1, k_block, d), lambda bhi, ki: (bhi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, sk, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, sk, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, _pad_rows8(mask), g, _pad_rows8(lse), _pad_rows8(delta))
    if groups > 1:
        dk = dk_per_head.reshape(bhkv, groups, sk, d).sum(axis=1)
        dv = dv_per_head.reshape(bhkv, groups, sk, d).sum(axis=1)
    else:
        dk, dv = dk_per_head, dv_per_head
    return dq, dk, dv


def _flash_bwd(causal, q_block, k_block, interpret, skip_pad_q, window, packed,
               bwd_impl, res, g):
    q, k, v, mask, out, lse = res
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    kwargs = dict(causal=causal, q_block=q_block, k_block=k_block,
                  interpret=interpret, skip_pad_q=skip_pad_q, window=window,
                  packed=packed)
    if bwd_impl == "fused":
        dq, dk, dv = flash_bwd_fused(q, k, v, mask, g, lse, delta, **kwargs)
        return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
                None)
    dq = flash_dq(q, k, v, mask, g, lse, delta, **kwargs)
    dk, dv = flash_dkv(q, k, v, mask, g, lse, delta, **kwargs)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    q_block: int = DEFAULT_Q_BLOCK,
    k_block: int = DEFAULT_K_BLOCK,
    interpret: Optional[bool] = None,
    skip_pad_q: bool = False,
    window: Optional[int] = None,
    segment_ids: Optional[jax.Array] = None,
    bwd_impl: str = "auto",
) -> jax.Array:
    """q [B, Sq, Hq, D]; k/v [B, Sk, Hkv, D]; mask [B, Sk] key validity.
    Returns [B, Sq, Hq, D] in q.dtype.

    ``segment_ids`` [B, S] (requires Sq == Sk, replaces ``mask``): sequence
    PACKING — multiple texts per row as contiguous segments with ids 1..n and
    a 0-id pad tail. Attention is block-diagonal (tokens attend only within
    their segment; with ``causal`` also only backwards). Whole key blocks
    outside a q block's segment span are skipped, so cost is O(Σ lenᵢ²) per
    row instead of O(S²) — the TPU answer to padding waste on variable-length
    corpora.

    ``window`` (requires ``causal``): sliding-window attention, the HF
    mistral/qwen2 rule — row q attends keys with q_pos - k_pos < window.
    Whole key blocks outside the band are skipped in fwd/dq (and the
    symmetric q-block bound in dkv), so cost is O(S·window) not O(S²).

    ``skip_pad_q`` (self-attention opt-in): query blocks entirely past the
    row's valid length are skipped — their outputs/gradients become zeros.
    Safe whenever pad positions are masked as keys everywhere (then their
    hidden states can never influence valid rows) and the loss ignores pad
    outputs (our pooling reads one valid position). Big win for heavily
    right-padded static-shape batches."""
    if window is not None and not causal:
        raise ValueError("window requires causal attention (HF SWA rule)")
    if window is not None and window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, sq, hq, d = q.shape
    _, sk, hkv, _ = k.shape

    packed = segment_ids is not None
    if packed:
        if sq != sk:
            raise ValueError(
                f"segment_ids requires self-attention shapes (sq == sk), "
                f"got sq={sq} sk={sk}"
            )
        if mask is not None:
            raise ValueError("pass segment_ids OR mask, not both "
                             "(key validity is segment_ids != 0)")
        mask = segment_ids
    if mask is None:
        mask = jnp.ones((b, sk), jnp.int32)
    mask = mask.astype(jnp.int32)

    # windowed runs want key blocks ~window/2: block-granular skipping can't
    # act inside a block (measured v5e S4096: window 1024 @ k_block 1024 =
    # 7.9 ms vs @512 = 6.1 ms; window 512: 6.6 -> 5.9 ms @256)
    if window is not None:
        kb = 256
        while kb * 2 <= window // 2:
            kb *= 2
        k_block = min(k_block, kb)

    q_block, k_block = fit_blocks(sq, sk, q_block, k_block)

    qf = _flatten_heads(q)
    kf = _flatten_heads(k)
    vf = _flatten_heads(v)
    # per-(batch·query-head) mask rows so stats indexing stays trivial
    mask_bh = jnp.repeat(mask, hq, axis=0)

    # benchmarking override (same-day A/B without threading a flag through
    # every caller): RANKPO_FLASH_BWD=split|fused|auto
    bwd_impl = os.environ.get("RANKPO_FLASH_BWD", bwd_impl)
    if bwd_impl not in ("auto", "split", "fused"):
        raise ValueError(
            f"bwd_impl must be 'auto', 'split' or 'fused', got {bwd_impl!r}"
        )
    if bwd_impl == "auto":
        # fused one-pass bwd holds full (1, Sq, D) q/do rows + the fp32 dq
        # accumulator in VMEM (~8·Sq·D bytes + k/v blocks). Measured v5e
        # B4/S4096/H16-KV8/D128 causal: fused 13.0 ms vs split 16.0 ms
        # fwd+bwd (bwd alone -30%: s and dp computed once per tile, 5 tile
        # matmuls instead of 7). Past the VMEM budget fall back to split,
        # whose dq pass streams q blocks.
        bwd_impl = "fused" if sq * d * 8 <= 2**22 else "split"
    out = _flash(
        qf, kf, vf, mask_bh, causal, q_block, k_block, interpret, skip_pad_q,
        window, packed, bwd_impl,
    )
    return _unflatten_heads(out, b, hq)
