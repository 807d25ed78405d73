"""Flash-attention kernel numerics vs the XLA oracle (interpret mode on CPU):
values and gradients, with padding masks, causal mode, GQA, odd lengths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankpo_tpu.ops.attention import _xla_attention
from rankpo_tpu.ops.flash_attention import flash_attention


def _inputs(b=2, sq=64, sk=64, hq=4, hkv=4, d=16, seed=0, mask_lens=None):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, sq, hq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, sk, hkv, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, sk, hkv, d).astype(np.float32))
    if mask_lens is None:
        mask = jnp.ones((b, sk), jnp.int32)
    else:
        mask = jnp.asarray(
            np.stack([
                np.concatenate([np.ones(m, np.int32), np.zeros(sk - m, np.int32)])
                for m in mask_lens
            ])
        )
    return q, k, v, mask


@pytest.mark.parametrize("causal", [False, True])
def test_forward_matches_xla(causal):
    q, k, v, mask = _inputs(mask_lens=[64, 40])
    ref = _xla_attention(q, k, v, mask, causal)
    out = flash_attention(q, k, v, mask=mask, causal=causal,
                          q_block=16, k_block=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_gqa():
    q, k, v, mask = _inputs(hq=8, hkv=2, mask_lens=[64, 30])
    ref = _xla_attention(q, k, v, mask, True)
    out = flash_attention(q, k, v, mask=mask, causal=True,
                          q_block=32, k_block=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_non_divisible_lengths():
    # seq lengths not multiples of the requested blocks: wrapper shrinks blocks
    q, k, v, mask = _inputs(sq=48, sk=80, mask_lens=[80, 52])
    ref = _xla_attention(q, k, v, mask, False)
    out = flash_attention(q, k, v, mask=mask, causal=False,
                          q_block=32, k_block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("causal,hq,hkv", [(False, 4, 4), (True, 4, 4), (True, 4, 2)])
def test_gradients_match_xla(causal, hq, hkv):
    q, k, v, mask = _inputs(b=2, sq=32, sk=32, hq=hq, hkv=hkv, d=8,
                            mask_lens=[32, 20])

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, mask=mask, causal=causal,
                              q_block=16, k_block=16, interpret=True)
        return jnp.sum(jnp.square(out))

    def loss_ref(q, k, v):
        out = _xla_attention(q, k, v, mask, causal)
        return jnp.sum(jnp.square(out))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4,
            err_msg=f"grad mismatch for {name}",
        )


@pytest.mark.parametrize("causal,hq,hkv,window", [
    (False, 4, 4, None), (True, 4, 4, None), (True, 4, 2, None),
    (True, 4, 2, 12),
])
def test_fused_bwd_matches_split(causal, hq, hkv, window):
    """bwd_impl='fused' (one-pass dq+dkv, VMEM-accumulated dq) must produce
    the same gradients as the split kernels and the XLA oracle."""
    q, k, v, mask = _inputs(b=2, sq=32, sk=32, hq=hq, hkv=hkv, d=8,
                            mask_lens=[32, 20])

    def loss(impl):
        def f(q, k, v):
            out = flash_attention(q, k, v, mask=mask, causal=causal,
                                  window=window, q_block=16, k_block=16,
                                  interpret=True, bwd_impl=impl)
            return jnp.sum(jnp.square(out))
        return f

    def loss_ref(q, k, v):
        out = _xla_attention(q, k, v, mask, causal, window=window)
        return jnp.sum(jnp.square(out))

    g_fused = jax.grad(loss("fused"), argnums=(0, 1, 2))(q, k, v)
    g_split = jax.grad(loss("split"), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, c, name in zip(g_fused, g_split, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=f"fused vs split: {name}")
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=3e-4,
                                   err_msg=f"fused vs oracle: {name}")


def test_fused_bwd_skip_pad_q_and_packed():
    """Fused bwd under the two masking extensions: skip_pad_q zeros pad-row
    dq like the split path; packed segment ids give split-identical grads."""
    q, k, v, mask = _inputs(b=2, sq=32, sk=32, hq=4, hkv=2, d=8,
                            mask_lens=[32, 20])

    def grads(impl, **kw):
        def f(q, k, v):
            out = flash_attention(q, k, v, causal=True, q_block=16,
                                  k_block=16, interpret=True, bwd_impl=impl,
                                  **kw)
            return jnp.sum(jnp.square(out))
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    for kw in (dict(mask=mask, skip_pad_q=True),
               dict(segment_ids=jnp.asarray(
                   np.repeat([[1] * 12 + [2] * 14 + [0] * 6], 2, axis=0)))):
        gf = grads("fused", **kw)
        gs = grads("split", **kw)
        for a, b, name in zip(gf, gs, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5,
                err_msg=f"fused vs split ({list(kw)[0]}): {name}",
            )


def test_fully_masked_row_is_finite():
    q, k, v, mask = _inputs(b=1, sq=16, sk=16, mask_lens=[0])
    out = flash_attention(q, k, v, mask=mask, causal=False,
                          q_block=16, k_block=16, interpret=True)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_encoder_integration():
    """multi_head_attention(impl='flash') path through the llama encoder."""
    from rankpo_tpu.models import init_params, tiny_llama_config
    from rankpo_tpu.models import encoder as enc

    cfg = tiny_llama_config(vocab_size=64)
    params = init_params(jax.random.key(0), cfg)
    ids = jax.random.randint(jax.random.key(1), (2, 32), 5, 64)
    mask = jnp.ones((2, 32), jnp.int32).at[1, 20:].set(0)
    a = enc.embed(params, cfg, {"input_ids": ids, "attention_mask": mask},
                  compute_dtype=jnp.float32, attn_impl="xla")
    b = enc.embed(params, cfg, {"input_ids": ids, "attention_mask": mask},
                  compute_dtype=jnp.float32, attn_impl="flash")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_tensor_parallel_shard_map(mesh8):
    """Flash under TP: heads sharded over the model axis via shard_map must
    match the XLA oracle on global arrays (dp=4 x mp=2 virtual mesh)."""
    from rankpo_tpu.ops.attention import multi_head_attention

    q, k, v, mask = _inputs(b=4, sq=32, sk=32, hq=4, hkv=2, d=8,
                            mask_lens=[32, 20, 32, 16])
    ref = _xla_attention(q, k, v, mask, True)
    out = multi_head_attention(q, k, v, mask=mask, causal=True, impl="flash",
                               mesh=mesh8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_tensor_parallel_gradients(mesh8):
    from rankpo_tpu.ops.attention import multi_head_attention

    q, k, v, mask = _inputs(b=4, sq=16, sk=16, hq=4, hkv=2, d=8,
                            mask_lens=[16, 10, 16, 12])

    def loss_tp(q, k, v):
        out = multi_head_attention(q, k, v, mask=mask, causal=True,
                                   impl="flash", mesh=mesh8)
        return jnp.sum(jnp.square(out))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(_xla_attention(q, k, v, mask, True)))

    gt = jax.grad(loss_tp, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(gt, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   err_msg=f"TP grad mismatch for {n}")


def test_skip_pad_q_valid_rows_match_pad_rows_zero():
    """skip_pad_q: valid rows bit-match the default path; pad q rows are zeros."""
    q, k, v, mask = _inputs(b=2, sq=64, sk=64, mask_lens=[64, 24])
    full = flash_attention(q, k, v, mask=mask, causal=True,
                           q_block=16, k_block=16, interpret=True)
    skipped = flash_attention(q, k, v, mask=mask, causal=True,
                              q_block=16, k_block=16, interpret=True,
                              skip_pad_q=True)
    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(skipped)[valid], np.asarray(full)[valid], atol=1e-6
    )
    # whole q blocks past the length are zero (row 1: blocks from 32 on)
    np.testing.assert_array_equal(np.asarray(skipped)[1, 32:], 0.0)


def test_skip_pad_q_encoder_embeddings_unchanged():
    """Through the llama encoder (which opts in), embeddings of padded batches
    must equal the XLA path — pooling only reads valid positions."""
    from rankpo_tpu.models import init_params, tiny_llama_config
    from rankpo_tpu.models import encoder as enc

    cfg = tiny_llama_config(vocab_size=64)
    params = init_params(jax.random.key(0), cfg)
    ids = jax.random.randint(jax.random.key(1), (3, 48), 5, 64)
    mask = jnp.ones((3, 48), jnp.int32).at[1, 12:].set(0).at[2, 30:].set(0)
    a = enc.embed(params, cfg, {"input_ids": ids, "attention_mask": mask},
                  compute_dtype=jnp.float32, attn_impl="xla")
    b = enc.embed(params, cfg, {"input_ids": ids, "attention_mask": mask},
                  compute_dtype=jnp.float32, attn_impl="flash")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


class TestSlidingWindow:
    """Sliding-window (HF mistral rule: q_pos - k_pos < window) vs the XLA
    oracle — values and grads, windows crossing/straddling block boundaries."""

    @pytest.mark.parametrize("window", [1, 5, 16, 33, 64])
    def test_forward_matches_xla(self, window):
        q, k, v, mask = _inputs(mask_lens=[64, 40])
        ref = _xla_attention(q, k, v, mask, True, window)
        out = flash_attention(q, k, v, mask=mask, causal=True, window=window,
                              q_block=16, k_block=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_forward_gqa_window(self):
        q, k, v, mask = _inputs(hq=8, hkv=2, mask_lens=[64, 30])
        ref = _xla_attention(q, k, v, mask, True, 20)
        out = flash_attention(q, k, v, mask=mask, causal=True, window=20,
                              q_block=32, k_block=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("window", [7, 32])
    def test_gradients_match_xla(self, window):
        q, k, v, mask = _inputs(mask_lens=[64, 45])

        def loss_flash(q, k, v):
            out = flash_attention(q, k, v, mask=mask, causal=True,
                                  window=window, q_block=16, k_block=32,
                                  interpret=True)
            return jnp.sum(out * out)

        def loss_ref(q, k, v):
            out = _xla_attention(q, k, v, mask, True, window)
            return jnp.sum(out * out)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)

    def test_window_larger_than_seq_is_full_causal(self):
        q, k, v, mask = _inputs(mask_lens=[64, 40])
        full = flash_attention(q, k, v, mask=mask, causal=True,
                               q_block=16, k_block=32, interpret=True)
        windowed = flash_attention(q, k, v, mask=mask, causal=True,
                                   window=500, q_block=16, k_block=32,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(windowed), np.asarray(full),
                                   atol=1e-6)

    def test_window_requires_causal(self):
        q, k, v, mask = _inputs()
        with pytest.raises(ValueError, match="causal"):
            flash_attention(q, k, v, mask=mask, causal=False, window=8,
                            interpret=True)

    def test_mistral_model_uses_window(self):
        """End-to-end: a mistral-family config routes the window through
        multi_head_attention and changes the hidden states."""
        from rankpo_tpu.models import EncoderConfig, forward_hidden, init_params

        cfg = EncoderConfig(
            model_type="mistral", vocab_size=64, hidden_size=32,
            intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rope_theta=10000.0, pad_token_id=0,
            architectures=("MistralModel",), pooling="last_token",
            sliding_window=4,
        )
        params = init_params(jax.random.key(0), cfg)
        ids = jax.random.randint(jax.random.key(1), (1, 16), 5, 64)
        mask = jnp.ones_like(ids)
        windowed = forward_hidden(params, cfg, ids, mask,
                                  compute_dtype=jnp.float32)
        import dataclasses
        cfg_full = dataclasses.replace(cfg, sliding_window=None)
        full = forward_hidden(params, cfg_full, ids, mask,
                              compute_dtype=jnp.float32)
        assert float(jnp.abs(windowed - full).max()) > 1e-4


class TestCrossLengthCausal:
    """sq != sk with causal=True: both impls must use bottom-right diagonal
    alignment (XLA tril(k=sk-sq) / HF convention) — the kernel once used
    top-left, silently diverging from the fallback."""

    @pytest.mark.parametrize("sq,sk", [(32, 64), (16, 80), (64, 64)])
    def test_forward_matches_xla(self, sq, sk):
        q, k, v, mask = _inputs(sq=sq, sk=sk, mask_lens=[sk, sk - 10])
        ref = _xla_attention(q, k, v, mask, True)
        out = flash_attention(q, k, v, mask=mask, causal=True,
                              q_block=16, k_block=16, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_gradients_match_xla(self):
        q, k, v, mask = _inputs(sq=32, sk=64, mask_lens=[64, 50])

        def loss_flash(q, k, v):
            out = flash_attention(q, k, v, mask=mask, causal=True,
                                  q_block=16, k_block=16, interpret=True)
            return jnp.sum(out * out)

        def loss_ref(q, k, v):
            return jnp.sum(_xla_attention(q, k, v, mask, True) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)

    def test_window_with_cross_length(self):
        q, k, v, mask = _inputs(sq=32, sk=64, mask_lens=[64, 64])
        ref = _xla_attention(q, k, v, mask, True, 8)
        out = flash_attention(q, k, v, mask=mask, causal=True, window=8,
                              q_block=16, k_block=16, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def _segment_ids(seg_lens, s):
    """[[len, len, ...] per row] -> [B, S] int32 ids 1..n with a 0 pad tail."""
    rows = []
    for lens in seg_lens:
        row = []
        for i, L in enumerate(lens):
            row += [i + 1] * L
        row += [0] * (s - len(row))
        rows.append(row)
    return jnp.asarray(rows, jnp.int32)


class TestPacked:
    """Sequence packing (segment_ids): the packed kernel must equal running
    every packed text alone — per-segment slices through the unmasked oracle —
    and the packed XLA fallback, values and grads, causal and bidirectional."""

    SEG_LENS = [[20, 30, 10], [5, 39]]  # pads: 4 and 20 of S=64

    @pytest.mark.parametrize("causal", [False, True])
    def test_forward_matches_per_segment_oracle(self, causal):
        q, k, v, _ = _inputs()
        seg = _segment_ids(self.SEG_LENS, 64)
        out = flash_attention(q, k, v, segment_ids=seg, causal=causal,
                              q_block=16, k_block=16, interpret=True)
        for b, lens in enumerate(self.SEG_LENS):
            off = 0
            for L in lens:
                sl = slice(off, off + L)
                ref = _xla_attention(
                    q[b:b + 1, sl], k[b:b + 1, sl], v[b:b + 1, sl],
                    None, causal,
                )
                np.testing.assert_allclose(
                    np.asarray(out[b:b + 1, sl]), np.asarray(ref), atol=2e-5,
                    err_msg=f"row {b} segment at {off}:{off + L}",
                )
                off += L
            # pad tail outputs zeros (no attendable key)
            assert float(jnp.abs(out[b, off:]).max()) == 0.0

    @pytest.mark.parametrize("causal", [False, True])
    def test_forward_matches_packed_xla(self, causal):
        q, k, v, _ = _inputs(hq=8, hkv=2)  # GQA
        seg = _segment_ids(self.SEG_LENS, 64)
        ref = _xla_attention(q, k, v, None, causal, segment_ids=seg)
        out = flash_attention(q, k, v, segment_ids=seg, causal=causal,
                              q_block=16, k_block=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("causal", [False, True])
    def test_gradients_match_packed_xla(self, causal):
        q, k, v, _ = _inputs(b=2, sq=32, sk=32, d=8)
        seg = _segment_ids([[10, 14], [6, 20, 6]], 32)

        def loss_flash(q, k, v):
            out = flash_attention(q, k, v, segment_ids=seg, causal=causal,
                                  q_block=8, k_block=8, interpret=True)
            return jnp.sum(jnp.square(out))

        def loss_ref(q, k, v):
            out = _xla_attention(q, k, v, None, causal, segment_ids=seg)
            return jnp.sum(jnp.square(out))

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4,
                err_msg=f"grad mismatch for {name}",
            )

    def test_segment_not_block_aligned(self):
        # segments straddling block boundaries + a segment smaller than a block
        q, k, v, _ = _inputs(b=1, sq=64, sk=64)
        seg = _segment_ids([[3, 45, 13]], 64)
        ref = _xla_attention(q, k, v, None, True, segment_ids=seg)
        out = flash_attention(q, k, v, segment_ids=seg, causal=True,
                              q_block=16, k_block=16, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_single_segment_equals_plain_mask(self):
        # one segment per row == the ordinary padding-mask semantics at every
        # VALID position (the packed path additionally zeroes pad q rows
        # inside partially-valid blocks, which skip_pad_q leaves as garbage)
        q, k, v, mask = _inputs(mask_lens=[64, 40])
        seg = _segment_ids([[64], [40]], 64)
        a = flash_attention(q, k, v, segment_ids=seg, causal=True,
                            q_block=16, k_block=16, interpret=True)
        b = flash_attention(q, k, v, mask=mask, causal=True, skip_pad_q=True,
                            q_block=16, k_block=16, interpret=True)
        m = np.asarray(mask)[:, :, None, None].astype(bool)
        np.testing.assert_allclose(
            np.asarray(a) * m, np.asarray(b) * m, atol=2e-5
        )
        assert float(jnp.abs(a[1, 40:]).max()) == 0.0  # packed pads are zeros

    def test_rejects_cross_length_and_double_mask(self):
        q, k, v, mask = _inputs(sq=32, sk=64)
        seg = _segment_ids([[32], [32]], 64)
        with pytest.raises(ValueError, match="sq == sk"):
            flash_attention(q, k, v, segment_ids=seg, interpret=True)
        q, k, v, mask = _inputs()
        seg = _segment_ids([[64], [64]], 64)
        with pytest.raises(ValueError, match="not both"):
            flash_attention(q, k, v, mask=mask, segment_ids=seg,
                            interpret=True)
