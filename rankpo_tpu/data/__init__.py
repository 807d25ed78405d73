from rankpo_tpu.data.collators import ContrastiveCollator, RankPOCollator
from rankpo_tpu.data.datasets import (
    ContrastiveDataset,
    StreamingContrastiveDataset,
    PairPreferenceDataset,
    load_eval_corpus,
    load_eval_queries,
)
from rankpo_tpu.data.loader import DataLoader
from rankpo_tpu.data.tokenization import (
    DOMAIN_SPECIAL_TOKENS,
    HashTokenizer,
    LLAMA_PAD_TOKEN,
    load_tokenizer,
    prepare_tokenizer,
)

__all__ = [
    "ContrastiveCollator",
    "RankPOCollator",
    "ContrastiveDataset",
    "StreamingContrastiveDataset",
    "PairPreferenceDataset",
    "load_eval_corpus",
    "load_eval_queries",
    "DataLoader",
    "DOMAIN_SPECIAL_TOKENS",
    "HashTokenizer",
    "LLAMA_PAD_TOKEN",
    "load_tokenizer",
    "prepare_tokenizer",
]
