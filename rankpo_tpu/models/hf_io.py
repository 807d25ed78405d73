"""HuggingFace checkpoint interop: safetensors import/export.

Parity requirement from the reference: models are loaded with
``AutoModel.from_pretrained`` (src/modeling.py:175-178) and checkpoints are
saved back in HF format so ``from_pretrained`` works on them
(src/contrastive_trainer.py:970-974). This module maps HF tensor names to our
stacked-layer pytrees (and back), transposing Linear weights from torch's
[out, in] to JAX's [in, out].
"""

from __future__ import annotations

import glob
import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from rankpo_tpu.models.config import EncoderConfig

try:
    from safetensors.numpy import load_file as _st_load, save_file as _st_save

    _HAS_SAFETENSORS = True
except ImportError:  # pragma: no cover
    _HAS_SAFETENSORS = False


def _load_raw_state(path: str) -> Dict[str, np.ndarray]:
    if not _HAS_SAFETENSORS:
        raise RuntimeError("safetensors is required for HF checkpoint import")
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    state: Dict[str, np.ndarray] = {}
    for f in files:
        state.update(_st_load(f))
    return state


def _strip_prefix(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Saved LlamaForCausalLM uses 'model.' prefix, XLMRobertaForX uses
    'roberta.'; bare AutoModel saves have none. Normalize to none."""
    for prefix in ("model.", "roberta.", "bert."):
        if any(k.startswith(prefix) for k in state):
            state = {
                (k[len(prefix):] if k.startswith(prefix) else k): v
                for k, v in state.items()
            }
    return state


def _stack(state: Dict[str, np.ndarray], template: str, n_layers: int, transpose: bool):
    arrs = [state[template.format(i)] for i in range(n_layers)]
    out = np.stack(arrs, axis=0)
    if transpose:
        out = np.swapaxes(out, -1, -2)
    return jnp.asarray(out)


def load_llama_params(path: str, config: EncoderConfig) -> dict:
    state = _strip_prefix(_load_raw_state(path))
    L = config.num_hidden_layers
    lyr = "layers.{}."
    params = {
        "embed_tokens": {"weight": jnp.asarray(state["embed_tokens.weight"])},
        "layers": {
            "input_layernorm": {
                "weight": _stack(state, lyr + "input_layernorm.weight", L, False)
            },
            "post_attention_layernorm": {
                "weight": _stack(
                    state, lyr + "post_attention_layernorm.weight", L, False
                )
            },
            "q_proj": {"kernel": _stack(state, lyr + "self_attn.q_proj.weight", L, True)},
            "k_proj": {"kernel": _stack(state, lyr + "self_attn.k_proj.weight", L, True)},
            "v_proj": {"kernel": _stack(state, lyr + "self_attn.v_proj.weight", L, True)},
            "o_proj": {"kernel": _stack(state, lyr + "self_attn.o_proj.weight", L, True)},
            "gate_proj": {"kernel": _stack(state, lyr + "mlp.gate_proj.weight", L, True)},
            "up_proj": {"kernel": _stack(state, lyr + "mlp.up_proj.weight", L, True)},
            "down_proj": {"kernel": _stack(state, lyr + "mlp.down_proj.weight", L, True)},
        },
        "norm": {"weight": jnp.asarray(state["norm.weight"])},
    }
    if config.attention_qkv_bias:  # qwen2 / llama attention_bias checkpoints
        for p in ("q_proj", "k_proj", "v_proj"):
            params["layers"][p]["bias"] = _stack(
                state, lyr + f"self_attn.{p}.bias", L, False
            )
    if config.attention_o_bias:
        params["layers"]["o_proj"]["bias"] = _stack(
            state, lyr + "self_attn.o_proj.bias", L, False
        )
    return params


def load_roberta_params(path: str, config: EncoderConfig) -> dict:
    state = _strip_prefix(_load_raw_state(path))
    L = config.num_hidden_layers
    lyr = "encoder.layer.{}."

    def dense(tmpl):
        return {
            "kernel": _stack(state, tmpl + ".weight", L, True),
            "bias": _stack(state, tmpl + ".bias", L, False),
        }

    def ln(tmpl):
        return {
            "weight": _stack(state, tmpl + ".weight", L, False),
            "bias": _stack(state, tmpl + ".bias", L, False),
        }

    return {
        "embeddings": {
            "word_embeddings": {
                "weight": jnp.asarray(state["embeddings.word_embeddings.weight"])
            },
            "position_embeddings": {
                "weight": jnp.asarray(state["embeddings.position_embeddings.weight"])
            },
            "token_type_embeddings": {
                "weight": jnp.asarray(state["embeddings.token_type_embeddings.weight"])
            },
            "layer_norm": {
                "weight": jnp.asarray(state["embeddings.LayerNorm.weight"]),
                "bias": jnp.asarray(state["embeddings.LayerNorm.bias"]),
            },
        },
        "layers": {
            "query": dense(lyr + "attention.self.query"),
            "key": dense(lyr + "attention.self.key"),
            "value": dense(lyr + "attention.self.value"),
            "attn_output": dense(lyr + "attention.output.dense"),
            "attn_layer_norm": ln(lyr + "attention.output.LayerNorm"),
            "intermediate": dense(lyr + "intermediate.dense"),
            "output": dense(lyr + "output.dense"),
            "output_layer_norm": ln(lyr + "output.LayerNorm"),
        },
    }


def load_pretrained(path: str):
    """(config, params) from an HF-format checkpoint directory."""
    config = EncoderConfig.from_pretrained(path)
    if config.is_llama:
        return config, load_llama_params(path, config)
    return config, load_roberta_params(path, config)


# ---------------------------------------------------------------------------
# Export (HF-format save, so downstream HF tooling can from_pretrained our
# checkpoints — analog of contrastive_trainer.py:970-974)
# ---------------------------------------------------------------------------

def _unstack(arr, transpose: bool):
    arr = np.asarray(jnp.astype(arr, jnp.float32)) if str(arr.dtype) == "bfloat16" else np.asarray(arr)
    if transpose:
        arr = np.swapaxes(arr, -1, -2)
    return [np.ascontiguousarray(a) for a in arr]


def save_pretrained(path: str, config: EncoderConfig, params: dict) -> None:
    os.makedirs(path, exist_ok=True)
    config.save_pretrained(path)
    state: Dict[str, np.ndarray] = {}
    if config.is_llama:
        state["embed_tokens.weight"] = np.asarray(params["embed_tokens"]["weight"], np.float32)
        state["norm.weight"] = np.asarray(params["norm"]["weight"], np.float32)
        ls = params["layers"]
        mapping = [
            ("input_layernorm.weight", ls["input_layernorm"]["weight"], False),
            (
                "post_attention_layernorm.weight",
                ls["post_attention_layernorm"]["weight"],
                False,
            ),
            ("self_attn.q_proj.weight", ls["q_proj"]["kernel"], True),
            ("self_attn.k_proj.weight", ls["k_proj"]["kernel"], True),
            ("self_attn.v_proj.weight", ls["v_proj"]["kernel"], True),
            ("self_attn.o_proj.weight", ls["o_proj"]["kernel"], True),
            ("mlp.gate_proj.weight", ls["gate_proj"]["kernel"], True),
            ("mlp.up_proj.weight", ls["up_proj"]["kernel"], True),
            ("mlp.down_proj.weight", ls["down_proj"]["kernel"], True),
        ]
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            if "bias" in ls[proj]:
                mapping.append((f"self_attn.{proj}.bias", ls[proj]["bias"], False))
        for name, stacked, tr in mapping:
            for i, a in enumerate(_unstack(stacked, tr)):
                state[f"layers.{i}.{name}"] = a.astype(np.float32)
    else:
        emb = params["embeddings"]
        state["embeddings.word_embeddings.weight"] = np.asarray(
            emb["word_embeddings"]["weight"], np.float32
        )
        state["embeddings.position_embeddings.weight"] = np.asarray(
            emb["position_embeddings"]["weight"], np.float32
        )
        state["embeddings.token_type_embeddings.weight"] = np.asarray(
            emb["token_type_embeddings"]["weight"], np.float32
        )
        state["embeddings.LayerNorm.weight"] = np.asarray(
            emb["layer_norm"]["weight"], np.float32
        )
        state["embeddings.LayerNorm.bias"] = np.asarray(
            emb["layer_norm"]["bias"], np.float32
        )
        ls = params["layers"]
        mapping = [
            ("attention.self.query", ls["query"], True),
            ("attention.self.key", ls["key"], True),
            ("attention.self.value", ls["value"], True),
            ("attention.output.dense", ls["attn_output"], True),
            ("intermediate.dense", ls["intermediate"], True),
            ("output.dense", ls["output"], True),
        ]
        for name, d, tr in mapping:
            for i, a in enumerate(_unstack(d["kernel"], tr)):
                state[f"encoder.layer.{i}.{name}.weight"] = a.astype(np.float32)
            for i, a in enumerate(_unstack(d["bias"], False)):
                state[f"encoder.layer.{i}.{name}.bias"] = a.astype(np.float32)
        for name, d in [
            ("attention.output.LayerNorm", ls["attn_layer_norm"]),
            ("output.LayerNorm", ls["output_layer_norm"]),
        ]:
            for i, a in enumerate(_unstack(d["weight"], False)):
                state[f"encoder.layer.{i}.{name}.weight"] = a.astype(np.float32)
            for i, a in enumerate(_unstack(d["bias"], False)):
                state[f"encoder.layer.{i}.{name}.bias"] = a.astype(np.float32)

    _st_save(state, os.path.join(path, "model.safetensors"))
