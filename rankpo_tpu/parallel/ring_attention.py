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
        p = jnp.exp(s - m_new[..., None])
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


def context_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
) -> jax.Array:
    """GLOBAL-array entry point: q/k/v [B, S, H, D] with S divisible by the
    mesh axis; shards the sequence, runs the ring, returns the global output.
    """
    w = mesh.shape[axis]
    s = q.shape[1]
    if s % w:
        raise ValueError(f"sequence {s} not divisible by mesh axis {axis}={w}")

    def body(q_l, k_l, v_l, mask_l):
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
    )
    return fn(q, k, v, mask)
