"""Tokenizer integration.

Host-side tokenization stays on the (Rust-backed) HuggingFace tokenizers
library — it is input-pipeline work, not accelerator work (SURVEY.md §2.2).
This module adds the two reference-specific rules:

  1. Llama pad token: Llama-3.2 ships without a pad token; the reference
     assigns the reserved ``'<|finetune_right_pad_id|>'`` token
     (src/run_contrastive.py:110-124). Same here.
  2. Seven domain special tokens ``<keyword></keyword><title></title>
     <abstract></abstract><sep>`` are added for the concatenated
     paper-title/abstract corpus format (src/run_contrastive.py:126-143);
     callers then resize the embedding table.

For hermetic tests (no hub access in this environment) :class:`HashTokenizer`
provides a deterministic word-hash tokenizer with the same call convention.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Sequence, Union

LLAMA_PAD_TOKEN = "<|finetune_right_pad_id|>"

DOMAIN_SPECIAL_TOKENS = [
    "<keyword>",
    "</keyword>",
    "<title>",
    "</title>",
    "<abstract>",
    "</abstract>",
    "<sep>",
]


def load_tokenizer(path: str, use_fast: bool = True):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(path, use_fast=use_fast)


def prepare_tokenizer(tokenizer) -> int:
    """Apply pad-token + special-token rules in place. Returns the new
    vocabulary size the model's embedding table must be resized to."""
    if tokenizer.pad_token is None:
        # Llama-3.2 rule; fall back to EOS for tokenizers lacking the reserved token
        pad_id = tokenizer.convert_tokens_to_ids(LLAMA_PAD_TOKEN)
        if pad_id is not None and pad_id != getattr(tokenizer, "unk_token_id", None):
            tokenizer.pad_token = LLAMA_PAD_TOKEN
            tokenizer.pad_token_id = pad_id
        else:
            tokenizer.pad_token = tokenizer.eos_token
    tokenizer.add_special_tokens(
        {"additional_special_tokens": DOMAIN_SPECIAL_TOKENS}
    )
    return len(tokenizer)


class HashTokenizer:
    """Deterministic, dependency-free tokenizer for tests and smoke runs.

    Word-level with md5 hashing into [n_reserved, vocab_size). Matches the HF
    call convention used by our datasets: ``tok(texts, max_length=, truncation=True)``
    returns ``{'input_ids': [...], 'attention_mask': [...]}`` (lists, unpadded).
    """

    def __init__(
        self,
        vocab_size: int = 512,
        pad_token_id: int = 0,
        cls_token_id: int = 1,
        add_cls: bool = True,
    ):
        self.vocab_size = vocab_size
        self.pad_token_id = pad_token_id
        self.cls_token_id = cls_token_id
        self.add_cls = add_cls
        self.pad_token = "<pad>"
        self._n_reserved = 3

    def __len__(self) -> int:
        return self.vocab_size

    def _encode_one(self, text: str, max_length: Optional[int], truncation: bool):
        ids = []
        if self.add_cls:
            ids.append(self.cls_token_id)
        for word in text.split():
            h = int(hashlib.md5(word.encode()).hexdigest(), 16)
            ids.append(self._n_reserved + h % (self.vocab_size - self._n_reserved))
        if truncation and max_length is not None:
            ids = ids[:max_length]
        if not ids:
            ids = [self.cls_token_id]
        return ids

    def __call__(
        self,
        text: Union[str, Sequence[str]],
        max_length: Optional[int] = None,
        truncation: bool = False,
        **kwargs,
    ) -> dict:
        if isinstance(text, str):
            ids = self._encode_one(text, max_length, truncation)
            return {"input_ids": ids, "attention_mask": [1] * len(ids)}
        encoded = [self._encode_one(t, max_length, truncation) for t in text]
        return {
            "input_ids": encoded,
            "attention_mask": [[1] * len(e) for e in encoded],
        }


def tokenize_texts(tokenizer, texts: List[str], max_length: int) -> dict:
    """Batch-tokenize with truncation, no padding (collators pad)."""
    return tokenizer(texts, max_length=max_length, truncation=True)
