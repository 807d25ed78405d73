from rankpo_tpu.models.config import (
    EncoderConfig,
    tiny_llama_config,
    tiny_qwen2_config,
    tiny_roberta_config,
)
from rankpo_tpu.models.encoder import embed, forward_hidden, init_params, resize_token_embeddings
from rankpo_tpu.models.hf_io import load_pretrained, save_pretrained
from rankpo_tpu.models.pooling import l2_normalize, pool

__all__ = [
    "EncoderConfig",
    "tiny_llama_config",
    "tiny_qwen2_config",
    "tiny_roberta_config",
    "embed",
    "forward_hidden",
    "init_params",
    "resize_token_embeddings",
    "load_pretrained",
    "save_pretrained",
    "l2_normalize",
    "pool",
]
