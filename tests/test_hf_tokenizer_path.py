"""Real HF-tokenizer integration (constructed offline — no hub access):
pad-token rules, the 7 domain special tokens, embedding resize, and dataset
tokenization through a genuine PreTrainedTokenizerFast."""

import json

import numpy as np
import pytest

import jax

transformers = pytest.importorskip("transformers")
tokenizers = pytest.importorskip("tokenizers")

from rankpo_tpu.data import ContrastiveDataset
from rankpo_tpu.data.tokenization import (
    DOMAIN_SPECIAL_TOKENS,
    LLAMA_PAD_TOKEN,
    prepare_tokenizer,
)
from rankpo_tpu.models import init_params, save_pretrained, tiny_llama_config


def _make_fast_tokenizer(with_llama_pad: bool):
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    words = ["job", "doc", "about", "topic", "methods", "research"] + [
        f"w{i}" for i in range(50)
    ]
    vocab = {"<unk>": 0, "</s>": 1}
    if with_llama_pad:
        vocab[LLAMA_PAD_TOKEN] = 2
    for w in words:
        vocab[w] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab=vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    return PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", eos_token="</s>"
    )


class TestPrepareTokenizer:
    def test_llama_reserved_pad_token_used(self):
        tok = _make_fast_tokenizer(with_llama_pad=True)
        assert tok.pad_token is None
        new_size = prepare_tokenizer(tok)
        assert tok.pad_token == LLAMA_PAD_TOKEN
        assert tok.pad_token_id == 2
        # 7 domain special tokens added
        for t in DOMAIN_SPECIAL_TOKENS:
            assert tok.convert_tokens_to_ids(t) is not None
        assert new_size == len(tok)

    def test_eos_fallback_when_reserved_token_missing(self):
        tok = _make_fast_tokenizer(with_llama_pad=False)
        prepare_tokenizer(tok)
        assert tok.pad_token == "</s>"

    def test_idempotent_on_second_call(self):
        tok = _make_fast_tokenizer(with_llama_pad=True)
        n1 = prepare_tokenizer(tok)
        n2 = prepare_tokenizer(tok)
        assert n1 == n2


class TestResizeIntegration:
    def test_setup_model_resizes_embeddings(self, tmp_path):
        from rankpo_tpu.cli.arguments import ModelArguments
        from rankpo_tpu.cli.run_contrastive import setup_model_and_tokenizer

        tok = _make_fast_tokenizer(with_llama_pad=True)
        base_vocab = len(tok)
        cfg = tiny_llama_config(vocab_size=base_vocab)
        params = init_params(jax.random.key(0), cfg)
        model_dir = tmp_path / "model"
        save_pretrained(str(model_dir), cfg, params)
        tok.save_pretrained(str(model_dir))

        args = ModelArguments(model_name_or_path=str(model_dir))
        config, params, tokenizer, pad_id = setup_model_and_tokenizer(args)
        assert config.vocab_size == base_vocab + len(DOMAIN_SPECIAL_TOKENS)
        assert params["embed_tokens"]["weight"].shape[0] == config.vocab_size
        assert pad_id == tokenizer.pad_token_id

    def test_dataset_with_real_tokenizer(self):
        tok = _make_fast_tokenizer(with_llama_pad=True)
        prepare_tokenizer(tok)
        rows = [
            {
                "query": "job about topic",
                "positives": ["<title> research doc </title>"],
                "negatives": ["w1 w2", "w3 w4 w5"],
            }
        ]
        ds = ContrastiveDataset(rows, tok, max_query_length=8,
                                max_passage_length=8)
        row = ds[0]
        assert isinstance(row["query"], list) and len(row["query"]) > 0
        # special tokens encode as single ids, not word pieces
        title_id = tok.convert_tokens_to_ids("<title>")
        assert title_id in row["positives"][0]
