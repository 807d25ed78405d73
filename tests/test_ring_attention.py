"""Context-parallel ring attention vs the single-device oracle: values AND
gradients must match full attention bit-closely, with causal masking, key
padding, and GQA, on the 8-device virtual mesh."""


import pytest

pytestmark = pytest.mark.slow  # see pyproject: fast tier = -m 'not slow'

import numpy as np

import jax
import jax.numpy as jnp

from rankpo_tpu.parallel.ring_attention import context_parallel_attention


def _oracle(q, k, v, mask, causal):
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    if hkv != hq:
        k = jnp.repeat(k, hq // hkv, axis=2)
        v = jnp.repeat(v, hq // hkv, axis=2)
    scale = 1.0 / (d**0.5)
    s_mat = scale * jnp.einsum("bqhd,bkhd->bhqk", q, k)
    valid = (mask != 0)[:, None, None, :]
    if causal:
        pos = jnp.arange(s)
        valid = jnp.logical_and(valid, (pos[None, :] <= pos[:, None])[None, None])
    s_mat = jnp.where(valid, s_mat, -1e30)
    p = jax.nn.softmax(s_mat, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def _data(seed, b=2, s=64, hq=4, hkv=4, d=16, pad=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, s, hq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, hkv, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, hkv, d).astype(np.float32))
    mask = np.ones((b, s), np.int32)
    if pad:
        mask[:, -pad:] = 0
    return q, k, v, jnp.asarray(mask)


@pytest.mark.parametrize("causal,pad,hkv", [
    (False, 0, 4), (True, 0, 4), (False, 17, 4), (True, 9, 4), (True, 0, 2),
])
def test_ring_matches_full_attention(data_mesh, causal, pad, hkv):
    q, k, v, mask = _data(0, hkv=hkv, pad=pad)
    got = context_parallel_attention(
        q, k, v, mesh=data_mesh, axis="data", mask=mask, causal=causal
    )
    want = _oracle(q, k, v, mask, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_ring_gradients_match(data_mesh):
    q, k, v, mask = _data(1, pad=5)

    def loss_ring(q, k, v):
        out = context_parallel_attention(
            q, k, v, mesh=data_mesh, axis="data", mask=mask, causal=True
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_full(q, k, v):
        return jnp.sum(_oracle(q, k, v, mask, True).astype(jnp.float32) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=5e-4)


def test_ring_memory_contract(data_mesh):
    # the global [S, S] score matrix must never exist: jaxpr of the sharded fn
    # only contains [*, S/W, S/W] score blocks
    q, k, v, mask = _data(2, s=128)

    def fn(q, k, v):
        return context_parallel_attention(
            q, k, v, mesh=data_mesh, axis="data", mask=mask, causal=False
        )

    jaxpr = str(jax.make_jaxpr(fn)(q, k, v))
    assert "128,128" not in jaxpr.replace(" ", ""), "full score matrix materialized"


def test_rejects_indivisible_sequence(data_mesh):
    q, k, v, mask = _data(3, s=60)
    with pytest.raises(ValueError, match="not divisible"):
        context_parallel_attention(
            q, k, v, mesh=data_mesh, axis="data", mask=mask
        )


class TestRingFlash:
    """Flash-kernel ring (Pallas per block pair + custom ring VJP), interpret
    mode on the CPU mesh."""

    @pytest.mark.parametrize("causal,pad,hkv", [
        (False, 0, 4), (True, 0, 4), (True, 13, 2),
    ])
    def test_values_match_oracle(self, data_mesh, causal, pad, hkv):
        q, k, v, mask = _data(4, hkv=hkv, pad=pad)
        got = context_parallel_attention(
            q, k, v, mesh=data_mesh, axis="data", mask=mask, causal=causal,
            impl="flash",
        )
        want = _oracle(q, k, v, mask, causal)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("causal", [True, False])
    def test_gradients_match_oracle(self, data_mesh, causal):
        # causal=False regression: the bwd's diagonal (i==0) ring step once
        # hardcoded causal=True, silently masking within-shard grad pairs
        q, k, v, mask = _data(5, pad=7, hkv=2)

        def loss_ring(q, k, v):
            out = context_parallel_attention(
                q, k, v, mesh=data_mesh, axis="data", mask=mask, causal=causal,
                impl="flash",
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def loss_full(q, k, v):
            return jnp.sum(_oracle(q, k, v, mask, causal).astype(jnp.float32) ** 2)

        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
        for name, a, b_ in zip("qkv", g_ring, g_full):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-4, rtol=5e-4, err_msg=f"d{name}")

    def test_flash_and_xla_rings_agree(self, data_mesh):
        q, k, v, mask = _data(6, pad=3)
        a = context_parallel_attention(q, k, v, mesh=data_mesh, axis="data",
                                       mask=mask, causal=True, impl="flash")
        b_ = context_parallel_attention(q, k, v, mesh=data_mesh, axis="data",
                                        mask=mask, causal=True, impl="xla")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=2e-5)
