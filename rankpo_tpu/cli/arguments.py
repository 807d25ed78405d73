"""Dataclass-driven CLI parsing.

Keeps the reference's declarative flag surface (src/arguments.py's seven
dataclasses parsed by HfArgumentParser) so the published shell recipes
translate ~1:1, without depending on transformers' TrainingArguments: a small
argparse generator reads dataclass fields directly. DeepSpeed flags are
replaced by mesh flags (``--model_parallel``, ``--zero1``).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Optional, Sequence, Type, Union, get_args, get_origin


def _add_field(parser: argparse.ArgumentParser, f: dataclasses.Field) -> None:
    name = "--" + f.name
    ftype = f.type
    origin = get_origin(ftype)
    if origin is Union:  # Optional[T]
        args = [a for a in get_args(ftype) if a is not type(None)]
        ftype = args[0] if args else str
    if isinstance(ftype, str):  # from __future__ annotations
        ftype = {"str": str, "int": int, "float": float, "bool": bool}.get(
            ftype.replace("Optional[", "").replace("]", ""), str
        )
    default = (
        f.default
        if f.default is not dataclasses.MISSING
        else (f.default_factory() if f.default_factory is not dataclasses.MISSING else None)
    )
    help_text = (f.metadata or {}).get("help", "")
    if ftype is bool:
        # HF-style: both `--flag` and `--flag False` accepted
        parser.add_argument(
            name,
            nargs="?",
            const=True,
            default=default,
            type=lambda s: s if isinstance(s, bool) else s.lower() in ("1", "true", "yes"),
            help=help_text,
        )
    else:
        parser.add_argument(name, type=ftype, default=default, help=help_text)


def parse_dataclasses(classes: Sequence[Type], argv: Optional[Sequence[str]] = None):
    parser = argparse.ArgumentParser()
    seen = set()
    for cls in classes:
        for f in dataclasses.fields(cls):
            if f.name in seen or not f.init:
                continue
            seen.add(f.name)
            _add_field(parser, f)
    ns = parser.parse_args(argv)
    out = []
    for cls in classes:
        kwargs = {
            f.name: getattr(ns, f.name)
            for f in dataclasses.fields(cls)
            if f.init and hasattr(ns, f.name)
        }
        out.append(cls(**kwargs))
    return tuple(out)


def _json_str(obj) -> str:
    return json.dumps(dataclasses.asdict(obj), indent=2, default=str)


def parse_index_kwargs(raw: str) -> Optional[dict]:
    """Parse the ``index_kwargs`` JSON field (extra refine/ivf constructor
    knobs on the offline CLIs — the programmatic ``index_kwargs`` dict the
    evaluator/tools accept, exposed as one flag instead of one flag per
    index knob)."""
    if not raw:
        return None
    try:
        out = json.loads(raw)
    except json.JSONDecodeError as e:
        raise ValueError(f"--index_kwargs is not valid JSON: {e}") from e
    if not isinstance(out, dict):
        raise ValueError(
            f"--index_kwargs must be a JSON object, got {type(out).__name__}"
        )
    return out


# ---------------------------------------------------------------------------
# Shared argument groups (reference src/arguments.py analogs)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class DistributedArguments:
    """Multi-host bring-up (the torchrun-env analog; rankpo_tpu/core/mesh.py
    initialize_distributed). All-None = single host."""

    coordinator_address: Optional[str] = dataclasses.field(default=None)
    num_processes: Optional[int] = dataclasses.field(default=None)
    process_id: Optional[int] = dataclasses.field(default=None)

    def initialize(self) -> None:
        from rankpo_tpu.core.mesh import initialize_distributed

        initialize_distributed(
            self.coordinator_address, self.num_processes, self.process_id
        )


@dataclasses.dataclass
class ModelArguments:
    model_name_or_path: str = dataclasses.field(
        default=None,
        metadata={"help": "HF-format checkpoint directory for the encoder."},
    )
    tokenizer_name: Optional[str] = dataclasses.field(
        default=None,
        metadata={"help": "Tokenizer path if different from the model; "
                          "'hash:<vocab>' selects the hermetic test tokenizer."},
    )
    attn_implementation: str = dataclasses.field(
        default="auto",
        metadata={"help": "Attention impl: auto|xla|flash; the reference's "
                          "'flash_attention_2' maps to the pallas flash kernel, "
                          "'eager'/'sdpa' to the XLA path."},
    )

    @property
    def attn_impl(self) -> str:
        return {
            "flash_attention_2": "flash",
            "eager": "xla",
            "sdpa": "xla",
        }.get(self.attn_implementation, self.attn_implementation)

    def to_json_string(self):
        return _json_str(self)


@dataclasses.dataclass
class TrainDataArguments:
    train_data: str = dataclasses.field(
        default=None, metadata={"help": "Path to the training jsonl."}
    )
    eval_data: Optional[str] = dataclasses.field(
        default=None, metadata={"help": "Optional eval jsonl (same schema); "
                                        "used per --eval_strategy."}
    )
    num_negatives: int = dataclasses.field(
        default=5, metadata={"help": "Negatives sampled per query."}
    )
    max_query_length: int = dataclasses.field(default=32)
    max_passage_length: int = dataclasses.field(default=128)
    pad_multiple: Optional[int] = dataclasses.field(
        default=None,
        metadata={"help": "Bucketed padding multiple (None = fixed max length)."},
    )
    streaming: bool = dataclasses.field(
        default=False,
        metadata={"help": "Lazy mmap-backed dataset for >RAM corpora."},
    )
    pack_sequences: bool = dataclasses.field(
        default=False,
        metadata={"help": "Sequence packing: several texts per row with "
                          "block-diagonal flash attention — removes pad "
                          "FLOPs on variable-length data. Same sampled "
                          "examples and loss as unpacked (data/packing.py)."},
    )
    pack_max_segments: int = dataclasses.field(
        default=16,
        metadata={"help": "Packing: max texts per packed row."},
    )
    retrieval_eval_query_file: Optional[str] = dataclasses.field(
        default=None,
        metadata={"help": "In-training retrieval eval: query jsonl "
                          "(rankpo-evaluate schema: query text + positive "
                          "corpus indices). At each eval point (per "
                          "--eval_strategy) the LIVE params encode it and "
                          "retrieval_* metrics (MRR/Recall/AUC/nDCG) join "
                          "the training log — the offline evaluate.py loop, "
                          "live (eval/in_training.py)."},
    )
    retrieval_eval_corpus_file: Optional[str] = dataclasses.field(
        default=None,
        metadata={"help": "In-training retrieval eval: corpus jsonl "
                          "(required with --retrieval_eval_query_file)."},
    )
    retrieval_eval_k: int = dataclasses.field(
        default=100,
        metadata={"help": "In-training retrieval eval: search depth (also "
                          "caps the metric cutoffs 1,5,10,20,100)."},
    )
    retrieval_eval_index: str = dataclasses.field(
        default="flat",
        metadata={"help": "In-training retrieval eval: index tier or FAISS "
                          "index_factory-style spec ('flat', 'refine', "
                          "'PCA128,Flat', 'IVF4096', ...). 'flat' keeps "
                          "bit-parity metrics; approximate tiers keep big "
                          "eval corpora cheap per eval point."},
    )

    def to_json_string(self):
        return _json_str(self)


@dataclasses.dataclass
class ContrastiveArguments:
    use_inbatch_neg: bool = dataclasses.field(default=True)
    negatives_cross_device: bool = dataclasses.field(default=True)
    temperature: float = dataclasses.field(default=0.02)
    normalize_embeddings: bool = dataclasses.field(default=True)
    grad_cache: bool = dataclasses.field(
        default=False,
        metadata={"help": "Gradient-cache accumulation: in-batch negatives "
                          "span ALL accumulation steps at microbatch memory."},
    )

    def to_json_string(self):
        return _json_str(self)


@dataclasses.dataclass
class RankPOArguments:
    reference_free: bool = dataclasses.field(default=False)
    ref_model_name_or_path: Optional[str] = dataclasses.field(default=None)
    temperature: float = dataclasses.field(default=0.02)
    beta: float = dataclasses.field(default=1.0)
    gamma_beta_ratio: float = dataclasses.field(default=0.0)
    sft_weight: float = dataclasses.field(default=0.0)
    rankpo_weight: float = dataclasses.field(default=1.0)
    loss_type: str = dataclasses.field(default="sigmoid")
    label_smoothing: float = dataclasses.field(default=0.0)
    disable_dropout: bool = dataclasses.field(default=True)
    # optional PEFT path (reference rankpo_trainer.py:127-165)
    use_lora: bool = dataclasses.field(default=False)
    lora_r: int = dataclasses.field(default=8)
    lora_alpha: float = dataclasses.field(default=16.0)
    lora_target_modules: str = dataclasses.field(
        default="auto",
        metadata={"help": "comma-joined stacked-kernel names to adapt; "
                          "'auto' = q_proj,v_proj (decoder family) or "
                          "query,value (bert/roberta family)"},
    )

    def to_json_string(self):
        return _json_str(self)


@dataclasses.dataclass
class EvaluateArguments:
    model_name_or_path: str = dataclasses.field(default=None)
    tokenizer_name: Optional[str] = dataclasses.field(default=None)
    query_data: str = dataclasses.field(default=None)
    corpus_data: str = dataclasses.field(default=None)
    output_dir: str = dataclasses.field(default="")
    overwrite_output_dir: bool = dataclasses.field(default=False)
    evaluate_all_checkpoints: bool = dataclasses.field(default=False)
    batch_size: int = dataclasses.field(default=256)
    max_query_length: int = dataclasses.field(default=32)
    max_passage_length: int = dataclasses.field(default=128)
    k: int = dataclasses.field(default=100)
    cutoffs: str = dataclasses.field(default="1,5,10,20,100")
    bf16: bool = dataclasses.field(default=False)
    index_type: str = dataclasses.field(
        default="flat",
        metadata={"help": "flat = exact FAISS-parity search (reference "
                          "comparisons); refine = two-stage approximate "
                          "index; ivf = clustered inverted-file probing "
                          "(both faster on huge corpora, metrics lose "
                          "bit-parity); or a FAISS index_factory-style "
                          "spec, e.g. 'OPQ64,IVF4096,PQ64'"},
    )
    index_recall_target: float = dataclasses.field(
        default=0.95,
        metadata={"help": "refine/ivf index build-time recall-tune target"},
    )
    index_kwargs: str = dataclasses.field(
        default="",
        metadata={"help": "JSON dict of extra refine/ivf index-constructor "
                          "knobs, e.g. '{\"pq_m\": 64, \"pq_rotate\": "
                          "\"opq\", \"n_clusters\": 4096}'; ignored "
                          "for flat"},
    )
    wandb_project: str = dataclasses.field(default="")
    log_level: str = dataclasses.field(default="info")

    def to_json_string(self):
        return _json_str(self)


@dataclasses.dataclass
class HardNegativeArguments:
    model_name_or_path: str = dataclasses.field(default=None)
    tokenizer_name: Optional[str] = dataclasses.field(default=None)
    input_file: str = dataclasses.field(default=None)
    output_prefix: str = dataclasses.field(default=None)
    batch_size: int = dataclasses.field(default=32)
    max_query_length: int = dataclasses.field(default=32)
    max_passage_length: int = dataclasses.field(default=128)
    search_range: str = dataclasses.field(default="0-100")
    method: Optional[str] = dataclasses.field(
        default=None, metadata={"help": "topk | sample | cluster (comma-joined)"}
    )
    num_negatives: int = dataclasses.field(default=10)
    num_clusters: int = dataclasses.field(default=10)
    lambda_: Optional[float] = dataclasses.field(default=None)
    bf16: bool = dataclasses.field(default=False)
    index_type: str = dataclasses.field(
        default="flat",
        metadata={"help": "flat = exact candidate search (reference "
                          "parity); refine = two-stage PCA prefilter + "
                          "exact rerank; ivf = clustered inverted-file "
                          "probing (both approximate, much faster on "
                          "multi-million corpora — mining samples "
                          "negatives anyway); or a FAISS "
                          "index_factory-style spec"},
    )
    index_recall_target: float = dataclasses.field(
        default=0.95,
        metadata={"help": "refine/ivf index build-time recall-tune target"},
    )
    index_kwargs: str = dataclasses.field(
        default="",
        metadata={"help": "JSON dict of extra refine/ivf index-constructor "
                          "knobs, e.g. '{\"pq_m\": 64, \"pq_rotate\": "
                          "\"opq\", \"n_clusters\": 4096}'; ignored "
                          "for flat"},
    )
    seed: int = dataclasses.field(default=42)
    log_level: str = dataclasses.field(default="info")

    def to_json_string(self):
        return _json_str(self)


@dataclasses.dataclass
class PredictionArguments:
    model_name_or_path: str = dataclasses.field(default=None)
    tokenizer_name: Optional[str] = dataclasses.field(default=None)
    query_data: str = dataclasses.field(default=None)
    corpus_data: str = dataclasses.field(default=None)
    output_file: str = dataclasses.field(default=None)
    batch_size: int = dataclasses.field(default=32)
    max_query_length: int = dataclasses.field(default=32)
    max_passage_length: int = dataclasses.field(default=128)
    search_range: str = dataclasses.field(default="0-100")
    method: str = dataclasses.field(default="topk")
    num_predictions: int = dataclasses.field(default=10)
    bf16: bool = dataclasses.field(default=False)
    index_type: str = dataclasses.field(
        default="flat",
        metadata={"help": "flat = exact candidate search; refine / ivf = "
                          "approximate (faster on huge corpora); or a "
                          "FAISS index_factory-style spec"},
    )
    index_recall_target: float = dataclasses.field(
        default=0.95,
        metadata={"help": "refine/ivf index build-time recall-tune target"},
    )
    index_kwargs: str = dataclasses.field(
        default="",
        metadata={"help": "JSON dict of extra refine/ivf index-constructor "
                          "knobs, e.g. '{\"pq_m\": 64, \"pq_rotate\": "
                          "\"opq\", \"n_clusters\": 4096}'; ignored "
                          "for flat"},
    )
    seed: int = dataclasses.field(default=42)
    log_level: str = dataclasses.field(default="info")

    def to_json_string(self):
        return _json_str(self)


def resolve_tokenizer(name_or_path: Optional[str], model_path: str):
    """'hash:<vocab>' → HashTokenizer (hermetic); otherwise HF AutoTokenizer."""
    from rankpo_tpu.data.tokenization import HashTokenizer, load_tokenizer

    target = name_or_path or model_path
    if target and target.startswith("hash:"):
        return HashTokenizer(vocab_size=int(target.split(":", 1)[1]))
    return load_tokenizer(target)
