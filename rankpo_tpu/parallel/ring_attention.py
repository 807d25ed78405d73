"""Ring attention: context parallelism over a mesh axis.

The reference has NO sequence/context parallelism (SURVEY.md §2.3 — sequences
up to 4096 fit one device with flash attention); this is the TPU-first seam
for longer contexts (>32K): the SEQUENCE axis is sharded over a mesh axis and
K/V shards rotate around the ring via ``lax.ppermute`` while each device
accumulates attention for its local queries with an online softmax — peak
memory per device is O(S/W) activations and one in-flight K/V shard, and the
collective rides ICI neighbor links (the ppermute ring), never materializing
the full sequence anywhere.

Blockwise-exact (not approximate): the online (m, l, acc) merge is the same
math as flash attention's inner loop, applied across ring steps. All ops are
differentiable — ppermute's transpose is the reverse-direction ppermute, so
``jax.grad`` through a ring step is itself a ring.

Layout contract (inside ``shard_map``): q/k/v are the LOCAL sequence shards
[B, S/W, H, D]; ``mask`` is the local key-validity shard [B, S/W]. GQA is
supported (H_kv dividing H_q). Use :func:`context_parallel_attention` to call
on GLOBAL arrays under jit.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30  # large-negative: keeps fully-masked rows NaN-free


def ring_attention_local(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    *,
    axis_name: str,
    axis_size: int,
    causal: bool = False,
) -> jax.Array:
    """Inside shard_map over ``axis_name`` (size ``axis_size``): local shards
    q/k/v [B, S_loc, H, D] (k/v may have fewer heads — GQA), mask [B, S_loc].
    Returns the local output shard [B, S_loc, Hq, D]."""
    b, s_loc, hq, d = q.shape
    hkv = k.shape[2]
    groups = hq // hkv
    scale = 1.0 / (d**0.5)
    my = jax.lax.axis_index(axis_name)
    if mask is None:
        mask = jnp.ones((b, s_loc), jnp.int32)

    qf = q.astype(jnp.float32)
    m = jnp.full((b, hq, s_loc), NEG_INF, jnp.float32)
    l = jnp.zeros((b, hq, s_loc), jnp.float32)
    acc = jnp.zeros((b, hq, s_loc, d), jnp.float32)

    perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]
    q_pos = my * s_loc + jnp.arange(s_loc, dtype=jnp.int32)  # [S_loc] global

    for step in range(axis_size):  # static unroll: axis_size is a mesh dim
        src = (my - step) % axis_size  # whose K/V shard we hold this step
        if groups > 1:
            k_full = jnp.repeat(k, groups, axis=2)
            v_full = jnp.repeat(v, groups, axis=2)
        else:
            k_full, v_full = k, v
        s = scale * jnp.einsum(
            "bqhd,bkhd->bhqk", qf, k_full.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )  # [B, Hq, S_loc, S_loc]
        k_pos = src * s_loc + jnp.arange(s_loc, dtype=jnp.int32)
        valid = (mask != 0)[:, None, None, :]  # key validity
        if causal:
            valid = jnp.logical_and(
                valid, (k_pos[None, :] <= q_pos[:, None])[None, None, :, :]
            )
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        # rows that have seen NO valid key keep m_new == NEG_INF, where
        # exp(s - m_new) == 1 uniformly — force masked entries to 0 so such
        # rows keep l == 0 and output zeros (same convention as the flash
        # kernel and the XLA oracle)
        p = jnp.where(valid, jnp.exp(s - m_new[..., None]), 0.0)
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v_full.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        m = m_new
        if step + 1 < axis_size:  # rotate K/V/mask one hop around the ring
            k = jax.lax.ppermute(k, axis_name, perm)
            v = jax.lax.ppermute(v, axis_name, perm)
            mask = jax.lax.ppermute(mask, axis_name, perm)

    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = (acc / l_safe[..., None]).transpose(0, 2, 1, 3)  # [B, S_loc, Hq, D]
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Flash-kernel ring: O(S/W) activations per device — the Pallas flash kernel
# computes each (q shard, kv shard) block pair with its logsumexp, ring steps
# merge online, and a custom VJP runs the FA2 backward around the same ring
# (partial dk/dv accumulators travel WITH their K/V shard and arrive home
# after a full revolution).
# ---------------------------------------------------------------------------


# layout/tiling helpers shared with the flash kernel (single source of truth)
from rankpo_tpu.ops.flash_attention import (  # noqa: E402
    _flatten_heads as _flatten,
    _unflatten_heads as _unflatten,
    fit_blocks,
)


def _blocks(s, q_block=512, k_block=1024):
    return fit_blocks(s, s, q_block, k_block)


def _merge(out_acc, lse_acc, o_i, lse_i):
    """Online-softmax merge of two normalized partials with their lse."""
    lse_new = jnp.logaddexp(lse_acc, lse_i)
    w_old = jnp.exp(lse_acc - lse_new)
    w_new = jnp.exp(lse_i - lse_new)
    out = out_acc * w_old[..., None] + o_i.astype(jnp.float32) * w_new[..., None]
    return out, lse_new


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _ring_flash(qf, kf, vf, mask_bh, axis_name, axis_size, causal, interpret):
    out, _ = _ring_flash_fwd(
        qf, kf, vf, mask_bh, axis_name, axis_size, causal, interpret
    )
    return out


def _ring_flash_fwd(qf, kf, vf, mask_bh, axis_name, axis_size, causal, interpret):
    from rankpo_tpu.ops.flash_attention import _flash_fwd_impl

    bh, s_loc, d = qf.shape
    qb, kb = _blocks(s_loc)
    my = jax.lax.axis_index(axis_name)
    perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]

    out_acc = jnp.zeros((bh, s_loc, d), jnp.float32)
    lse_acc = jnp.full((bh, s_loc), NEG_INF, jnp.float32)
    k_rot, v_rot, m_rot = kf, vf, mask_bh

    for i in range(axis_size):  # static unroll over the mesh axis
        if i == 0:
            # diagonal block: standard (local-position) causal masking
            o_i, lse_i = _flash_fwd_impl(
                qf, k_rot, v_rot, m_rot, causal, qb, kb, interpret, False, None
            )
        else:
            def live(ops):
                q_, k_, v_, m_ = ops
                return _flash_fwd_impl(
                    q_, k_, v_, m_, False, qb, kb, interpret, False, None
                )

            def dead(ops):
                return (
                    jnp.zeros((bh, s_loc, d), qf.dtype),
                    jnp.full((bh, s_loc), NEG_INF, jnp.float32),
                )

            if causal:
                # src = my - i (mod W): visible iff src <= my, i.e. no wrap
                o_i, lse_i = jax.lax.cond(
                    my >= i, live, dead, (qf, k_rot, v_rot, m_rot)
                )
            else:
                o_i, lse_i = live((qf, k_rot, v_rot, m_rot))
        out_acc, lse_acc = _merge(out_acc, lse_acc, o_i, lse_i)
        if i + 1 < axis_size:
            k_rot = jax.lax.ppermute(k_rot, axis_name, perm)
            v_rot = jax.lax.ppermute(v_rot, axis_name, perm)
            m_rot = jax.lax.ppermute(m_rot, axis_name, perm)

    out = out_acc.astype(qf.dtype)
    return out, (qf, kf, vf, mask_bh, out, lse_acc)


def _ring_flash_bwd(axis_name, axis_size, causal, interpret, res, g):
    from rankpo_tpu.ops.flash_attention import flash_dq, flash_dkv

    qf, kf, vf, mask_bh, out, lse = res
    bh, s_loc, d = qf.shape
    qb, kb = _blocks(s_loc)
    my = jax.lax.axis_index(axis_name)
    perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    dq_acc = jnp.zeros((bh, s_loc, d), jnp.float32)
    # (k, v, mask, dk_partial, dv_partial) travel the ring together; after a
    # full revolution each shard's accumulated dk/dv is back at its home
    bundle = (
        kf, vf, mask_bh,
        jnp.zeros(kf.shape, jnp.float32),
        jnp.zeros(vf.shape, jnp.float32),
    )

    kwargs = dict(q_block=qb, k_block=kb, interpret=interpret, skip_pad_q=False)

    for i in range(axis_size):
        k_i, v_i, m_i, dk_i, dv_i = bundle
        if i == 0:
            # diagonal (own-shard) block: local-position causal masking iff
            # the ring itself is causal — matching _ring_flash_fwd's i==0 step
            dq_c = flash_dq(qf, k_i, v_i, m_i, g, lse, delta,
                            causal=causal, **kwargs)
            dk_c, dv_c = flash_dkv(qf, k_i, v_i, m_i, g, lse, delta,
                                   causal=causal, **kwargs)
        else:
            def live(ops):
                q_, k_, v_, m_, g_, lse_, delta_ = ops
                dq_ = flash_dq(q_, k_, v_, m_, g_, lse_, delta_,
                               causal=False, **kwargs)
                dk_, dv_ = flash_dkv(q_, k_, v_, m_, g_, lse_, delta_,
                                     causal=False, **kwargs)
                return dq_, dk_, dv_

            def dead(ops):
                return (
                    jnp.zeros((bh, s_loc, d), qf.dtype),
                    jnp.zeros(kf.shape, jnp.float32),
                    jnp.zeros(vf.shape, jnp.float32),
                )

            ops = (qf, k_i, v_i, m_i, g, lse, delta)
            if causal:
                dq_c, dk_c, dv_c = jax.lax.cond(my >= i, live, dead, ops)
            else:
                dq_c, dk_c, dv_c = live(ops)
        dq_acc = dq_acc + dq_c.astype(jnp.float32)
        bundle = (k_i, v_i, m_i, dk_i + dk_c, dv_i + dv_c)
        # rotate after EVERY step: W hops returns each bundle to its home
        bundle = jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), bundle
        )

    _, _, _, dk_home, dv_home = bundle
    return (
        dq_acc.astype(qf.dtype),
        dk_home.astype(kf.dtype),
        dv_home.astype(vf.dtype),
        None,
    )


_ring_flash.defvjp(_ring_flash_fwd, _ring_flash_bwd)


def ring_flash_attention_local(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    *,
    axis_name: str,
    axis_size: int,
    causal: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash-kernel ring attention on LOCAL shards (inside shard_map):
    q/k/v [B, S_loc, H, D] (GQA ok), mask [B, S_loc] key validity."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, s_loc, hq, d = q.shape
    if mask is None:
        mask = jnp.ones((b, s_loc), jnp.int32)
    qf, kf, vf = _flatten(q), _flatten(k), _flatten(v)
    mask_bh = jnp.repeat(mask.astype(jnp.int32), hq, axis=0)
    out = _ring_flash(qf, kf, vf, mask_bh, axis_name, axis_size, causal, interpret)
    return _unflatten(out, b, hq)


def context_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    impl: str = "xla",
) -> jax.Array:
    """GLOBAL-array entry point: q/k/v [B, S, H, D] with S divisible by the
    mesh axis; shards the sequence, runs the ring, returns the global output.

    ``impl``: "xla" (blockwise einsum ring, portable) or "flash" (Pallas
    flash kernel per block pair + custom ring VJP — O(S/W) memory, the
    long-context serving/training path).
    """
    w = mesh.shape[axis]
    s = q.shape[1]
    if s % w:
        raise ValueError(f"sequence {s} not divisible by mesh axis {axis}={w}")

    def body(q_l, k_l, v_l, mask_l):
        if impl == "flash":
            return ring_flash_attention_local(
                q_l, k_l, v_l, mask_l, axis_name=axis, axis_size=w,
                causal=causal,
            )
        return ring_attention_local(
            q_l, k_l, v_l, mask_l, axis_name=axis, axis_size=w, causal=causal
        )

    if mask is None:
        mask = jnp.ones(q.shape[:2], jnp.int32)
    seq_spec = P(None, axis, None, None)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, P(None, axis)),
        out_specs=seq_spec,
        # the Pallas calls' out_shapes carry no varying-mesh-axes metadata;
        # skip the vma check for the flash path (shardings are still enforced)
        check_vma=(impl != "flash"),
    )
    return fn(q, k, v, mask)
