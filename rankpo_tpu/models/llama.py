"""Llama-3.x style decoder used as a text encoder (functional JAX).

Capability parity with the reference's ``AutoModel.from_pretrained('meta-llama/
Llama-3.2-1B')`` backbone (src/modeling.py:175-178, src/run_contrastive.py:86-98)
but built TPU-first. One body serves the whole decoder family the reference's
``AutoModel`` would accept as a retrieval backbone: llama (optional
attention_bias), qwen2 (q/k/v biases — gte-Qwen2-style embedders), mistral
(e5-mistral-style embedders; real sliding-window attention), and gemma
((1+w) RMSNorm, sqrt(hidden)-scaled embeddings, GeGLU):

  - Parameters are a plain pytree with layers STACKED on a leading axis and the
    transformer body run with ``lax.scan`` — one compiled layer regardless of
    depth, with optional ``jax.checkpoint`` rematerialization per layer (the
    analog of ``--gradient_checkpointing``, scripts/train/run_contrastive.sh).
  - Attention goes through rankpo_tpu.ops.attention (Pallas flash kernel on TPU,
    XLA elsewhere) instead of flash-attn-2 CUDA kernels.
  - RoPE implements the HF non-interleaved rotate-half layout including the
    llama3 frequency-scaling rule so HF Llama-3.2 safetensors import bit-matches.

Kernels are stored [in, out] (JAX convention); the HF import transposes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rankpo_tpu.models.config import EncoderConfig
from rankpo_tpu.ops.attention import multi_head_attention


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_inv_freq(config: EncoderConfig) -> jnp.ndarray:
    """Per-dim inverse frequencies, with llama3 wavelength-dependent scaling."""
    d = config.head_dim
    inv_freq = 1.0 / (
        config.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    )
    rs = config.rope_scaling
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        factor = rs["factor"]
        low = rs["low_freq_factor"]
        high = rs["high_freq_factor"]
        orig = rs["original_max_position_embeddings"]
        low_wavelen = orig / low
        high_wavelen = orig / high
        wavelen = 2 * jnp.pi / inv_freq
        scaled = jnp.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
        smooth = (orig / wavelen - low) / (high - low)
        smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
        is_medium = (wavelen >= high_wavelen) & (wavelen <= low_wavelen)
        inv_freq = jnp.where(is_medium, smoothed, scaled)
    return inv_freq


def rope_cos_sin(config: EncoderConfig, positions: jax.Array) -> tuple:
    """cos/sin tables [B, S, head_dim] in the HF duplicated-half layout."""
    inv_freq = rope_inv_freq(config)
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [B, S, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, S, H, D]; cos/sin: [B, S, D]."""
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    return x * cos + _rotate_half(x) * sin


# ---------------------------------------------------------------------------
# Norm / MLP
# ---------------------------------------------------------------------------

def rms_norm(
    x: jax.Array, weight: jax.Array, eps: float, *, gemma: bool = False
) -> jax.Array:
    """fp32 accumulation. Llama applies the weight in the input dtype (HF
    LlamaRMSNorm); Gemma stores weight-1 and applies (1+w) in fp32 before
    casting back (HF GemmaRMSNorm) — both matched exactly."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    if gemma:
        return ((1.0 + weight.astype(jnp.float32)) * xf).astype(dtype)
    return weight * xf.astype(dtype)


_ACTS = {
    "silu": jax.nn.silu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    # gemma GeGLU: HF PytorchGELUTanh
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
}


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_params(key: jax.Array, config: EncoderConfig, dtype=jnp.float32) -> dict:
    """Random init (normal 0.02 like HF). Layer params stacked on axis 0."""
    h = config.hidden_size
    d = config.head_dim
    hq = config.num_attention_heads
    hkv = config.num_key_value_heads
    f = config.intermediate_size
    L = config.num_hidden_layers

    keys = jax.random.split(key, 8)

    def norm(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    # gemma stores RMSNorm weights as offsets from 1 -> identity init is zeros
    ln_init = jnp.zeros if config.is_gemma else jnp.ones
    params = {
        "embed_tokens": {"weight": norm(keys[0], (config.vocab_size, h))},
        "layers": {
            "input_layernorm": {"weight": ln_init((L, h), dtype)},
            "post_attention_layernorm": {"weight": ln_init((L, h), dtype)},
            "q_proj": {"kernel": norm(keys[1], (L, h, hq * d))},
            "k_proj": {"kernel": norm(keys[2], (L, h, hkv * d))},
            "v_proj": {"kernel": norm(keys[3], (L, h, hkv * d))},
            "o_proj": {"kernel": norm(keys[4], (L, hq * d, h))},
            "gate_proj": {"kernel": norm(keys[5], (L, h, f))},
            "up_proj": {"kernel": norm(keys[6], (L, h, f))},
            "down_proj": {"kernel": norm(keys[7], (L, f, h))},
        },
        "norm": {"weight": ln_init((h,), dtype)},
    }
    if config.attention_qkv_bias:  # qwen2 (always) / llama attention_bias
        params["layers"]["q_proj"]["bias"] = jnp.zeros((L, hq * d), dtype)
        params["layers"]["k_proj"]["bias"] = jnp.zeros((L, hkv * d), dtype)
        params["layers"]["v_proj"]["bias"] = jnp.zeros((L, hkv * d), dtype)
    if config.attention_o_bias:
        params["layers"]["o_proj"]["bias"] = jnp.zeros((L, h), dtype)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layer_qkv(
    config: EncoderConfig,
    x: jax.Array,
    lp: dict,
    cos: jax.Array,
    sin: jax.Array,
) -> tuple:
    b, s, h = x.shape
    d = config.head_dim
    hq = config.num_attention_heads
    hkv = config.num_key_value_heads
    y = rms_norm(
        x, lp["input_layernorm"]["weight"], config.rms_norm_eps,
        gemma=config.is_gemma,
    )

    def proj(name):
        out = y @ lp[name]["kernel"]
        if "bias" in lp[name]:  # qwen2 q/k/v biases, llama attention_bias
            out = out + lp[name]["bias"]
        return out

    q = proj("q_proj").reshape(b, s, hq, d)
    k = proj("k_proj").reshape(b, s, hkv, d)
    v = proj("v_proj").reshape(b, s, hkv, d)
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin), v


def _layer_post(config: EncoderConfig, x: jax.Array, attn: jax.Array, lp: dict):
    b, s, h = x.shape
    o = attn.reshape(b, s, -1) @ lp["o_proj"]["kernel"]
    if "bias" in lp["o_proj"]:
        o = o + lp["o_proj"]["bias"]
    x = x + o
    residual = x
    y = rms_norm(
        x, lp["post_attention_layernorm"]["weight"], config.rms_norm_eps,
        gemma=config.is_gemma,
    )
    act = _ACTS[config.hidden_act]
    mlp = (act(y @ lp["gate_proj"]["kernel"]) * (y @ lp["up_proj"]["kernel"])) @ lp[
        "down_proj"
    ]["kernel"]
    return residual + mlp


def _layer(
    config: EncoderConfig,
    x: jax.Array,
    lp: dict,
    cos: jax.Array,
    sin: jax.Array,
    mask: jax.Array,
    attn_impl: str,
    mesh=None,
    segment_ids=None,
) -> jax.Array:
    q, k, v = _layer_qkv(config, x, lp, cos, sin)
    # self-attention with everywhere-masked pad keys: pad q rows are skippable
    attn = multi_head_attention(
        q, k, v, mask=mask, causal=True, impl=attn_impl, mesh=mesh,
        skip_pad_q=True, window=config.sliding_window,
        segment_ids=segment_ids,
    )
    return _layer_post(config, x, attn, lp)


def apply(
    params: dict,
    config: EncoderConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    *,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    remat_policy: str = "full",
    attn_impl: str = "auto",
    mesh=None,
    segment_ids=None,
    collect_hidden: bool = False,
) -> jax.Array:
    """Returns last_hidden_state [B, S, H] in compute_dtype.

    ``collect_hidden=True`` additionally returns the stacked PRE-final-norm
    per-layer outputs [L, B, S, H] (HF ``output_hidden_states`` analog:
    layer i's output == HF ``hidden_states[i+1]`` for i < L-1) — the
    per-layer parity probe for real-checkpoint imports
    (tests/test_real_checkpoint.py).

    ``remat_policy``: "full" recomputes everything in the layer on the
    backward pass (min memory); "dots" saves matmul outputs
    (jax dots_with_no_batch_dims_saveable) — trades HBM for skipping the
    MXU-heavy recompute, worth it when the model still fits; "attn" keeps
    only the attention call outside the rematted regions, so the flash
    kernel's VJP residuals (q, k, v, out, lse) are saved and the attention
    forward — the single most expensive recompute — never re-runs, at
    ~B·S·(2·Hq+2·Hkv)·D bytes/layer (far below "dots", which also saves the
    4x-wide MLP intermediates).

    Positions are ``arange`` regardless of padding (HF LlamaModel default when
    position_ids is None); with right padding + causal attention pad positions
    never influence non-pad tokens, so this matches the reference numerics.

    ``segment_ids`` [B, S] (sequence packing, replaces ``attention_mask``):
    several texts per row as contiguous segments 1..n with a 0-id pad tail.
    Attention is block-diagonal and RoPE positions restart per segment, so
    every packed text computes exactly what it would alone.
    """
    b, s = input_ids.shape
    x = params["embed_tokens"]["weight"][input_ids].astype(compute_dtype)
    if config.is_gemma:
        # HF GemmaModel scales embeddings by sqrt(hidden), with the
        # normalizer rounded to the compute dtype first
        x = x * jnp.asarray(config.hidden_size**0.5, compute_dtype)
    if segment_ids is not None:
        from rankpo_tpu.models.packing import packed_positions

        positions = packed_positions(segment_ids)
        key_mask = None
    else:
        positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        key_mask = attention_mask.astype(bool)
    cos, sin = rope_cos_sin(config, positions)

    layer_params = jax.tree_util.tree_map(
        lambda p: p.astype(compute_dtype)
        if jnp.issubdtype(p.dtype, jnp.floating)
        else p,
        params["layers"],
    )

    def body(carry, lp):
        if remat:
            if remat_policy not in ("full", "dots", "attn"):
                raise ValueError(
                    f"unknown remat_policy {remat_policy!r}; "
                    "one of ['full', 'dots', 'attn']"
                )
            if remat_policy == "attn":
                # attention stays OUTSIDE the checkpointed regions: its VJP
                # residuals (incl. the flash kernel's out/lse stats) are saved,
                # so the backward pass never re-runs the attention forward
                qkv_fn = jax.checkpoint(
                    lambda c, p: _layer_qkv(config, c, p, cos, sin)
                )
                q, k, v = qkv_fn(carry, lp)
                attn = multi_head_attention(
                    q, k, v, mask=key_mask, causal=True, impl=attn_impl,
                    mesh=mesh, skip_pad_q=True, window=config.sliding_window,
                    segment_ids=segment_ids,
                )
                post_fn = jax.checkpoint(
                    lambda c, a, p: _layer_post(config, c, a, p)
                )
                new = post_fn(carry, attn, lp)
            else:
                kwargs = {}
                if remat_policy == "dots":
                    kwargs["policy"] = (
                        jax.checkpoint_policies
                        .dots_with_no_batch_dims_saveable
                    )
                fn = jax.checkpoint(
                    lambda c, p: _layer(
                        config, c, p, cos, sin, key_mask, attn_impl, mesh,
                        segment_ids,
                    ),
                    **kwargs,
                )
                new = fn(carry, lp)
        else:
            new = _layer(
                config, carry, lp, cos, sin, key_mask, attn_impl, mesh,
                segment_ids,
            )
        return new, (new if collect_hidden else None)

    x, hs = jax.lax.scan(body, x, layer_params)
    x = rms_norm(
        x, params["norm"]["weight"].astype(compute_dtype), config.rms_norm_eps,
        gemma=config.is_gemma,
    )
    if collect_hidden:
        return x, hs
    return x
