"""In-training retrieval evaluation: the paper's headline metric, live.

The reference can only measure retrieval quality OFFLINE — save checkpoints,
then walk them with src/evaluate.py (encode, FAISS search, metrics per
checkpoint dir). But its central empirical story (imgs/rankpo_performance.png:
nDCG@20 *retention* vs alignment as RankPO training progresses) is exactly a
retrieval metric as a function of training step. This hook closes that loop:
at each eval point the trainer's LIVE params encode the eval queries + corpus
on the training mesh, the index engine searches, and MRR/Recall/AUC/nDCG land
in the training log/wandb channel next to the loss — no checkpoint writes, no
separate evaluate job, no model reload.

Design notes (TPU-first):
  - ONE ``InferenceEncoder`` lives for the whole run; each eval only swaps
    ``.params``. jit caches key on shapes, so every eval after the first
    reuses the compiled embed programs (a fresh encoder per eval would pay
    the remote compiler — minutes — each time).
  - Trainer params may be ZeRO-3/FSDP-sharded over the data axis; a jitted
    identity with replicated ``out_shardings`` re-gathers them ON DEVICE
    (no host round trip). The replicated copy is dropped after the eval so
    FSDP's memory win survives outside eval points.
  - The encode → index → search → metrics path is the exact offline harness
    (``evaluate_checkpoint``), so in-training numbers are directly comparable
    with ``rankpo-evaluate`` runs over saved checkpoints of the same params
    (up to the train-time param dtype).

Reference analogs: src/evaluate.py:103-291 (the offline harness this wraps),
src/rankpo_trainer.py:626-645 (the metric channel the results join).
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Optional, Sequence

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


class RetrievalEvalHook:
    """Callable ``(params) -> {"retrieval_<metric>": value}`` for
    ``Trainer.retrieval_eval_fn``. Loads the eval query/corpus jsonl files
    once at construction (same schemas as the ``rankpo-evaluate`` CLI);
    every call encodes them with the given params and returns the metric
    dict, prefixed ``retrieval_`` for the log channel.

    Multi-process: the trainer calls the hook on every process (the encode
    and search are collective); artifacts/logging stay rank-0 like the rest
    of the log channel.
    """

    def __init__(
        self,
        config,
        tokenizer,
        query_file: str,
        corpus_file: str,
        *,
        mesh=None,
        max_query_length: int = 32,
        max_passage_length: int = 128,
        k: int = 100,
        cutoffs: Sequence[int] = (1, 5, 10, 20, 100),
        batch_size: int = 256,
        compute_dtype=None,
        attn_impl: str = "auto",
        index_type: str = "flat",
        index_kwargs: Optional[dict] = None,
    ):
        from rankpo_tpu.data.datasets import load_eval_corpus, load_eval_queries

        self.queries, self.labels = load_eval_queries(query_file)
        self.corpus = load_eval_corpus(corpus_file)
        if not self.queries or not self.corpus:
            raise ValueError(
                f"retrieval eval needs non-empty query and corpus files; got "
                f"{len(self.queries)} queries / {len(self.corpus)} corpus rows"
            )
        self.config = config
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.max_query_length = max_query_length
        self.max_passage_length = max_passage_length
        self.k = min(k, len(self.corpus))
        # re-filter against the CLAMPED k: with a corpus smaller than the
        # requested k, metrics labeled @c for c > len(corpus) would really
        # be computed over only len(corpus) slots — mislabeled
        self.cutoffs = [c for c in cutoffs if c <= self.k] or [self.k]
        self.batch_size = batch_size
        self.compute_dtype = compute_dtype
        self.attn_impl = attn_impl
        # resolve factory-style specs ('PCA128,Flat', ...) NOW: an invalid
        # spec must fail before training starts, not at the first eval point
        from rankpo_tpu.index.factory import resolve_index_spec

        self.index_type, self.index_kwargs = resolve_index_spec(
            index_type, index_kwargs
        )
        self._encoder = None
        self._reshard_fn: Optional[Callable] = None
        logger.info(
            "in-training retrieval eval: %d queries over %d corpus rows "
            "(k=%d, index=%s)",
            len(self.queries), len(self.corpus), self.k, index_type,
        )

    def _replicate(self, params):
        """Live params onto the mesh fully replicated, on device (ZeRO-3/FSDP
        shards all-gather under jit; replicated params pass through)."""
        if self.mesh is None:
            return params
        if self._reshard_fn is None:
            self._reshard_fn = jax.jit(
                lambda p: p, out_shardings=NamedSharding(self.mesh, P())
            )
        return self._reshard_fn(params)

    def __call__(self, params) -> Dict[str, float]:
        from rankpo_tpu.eval.evaluator import evaluate_checkpoint
        from rankpo_tpu.index.encoding import InferenceEncoder

        placed = self._replicate(params)
        if self._encoder is None:
            kwargs = {}
            if self.compute_dtype is not None:
                kwargs["compute_dtype"] = self.compute_dtype
            self._encoder = InferenceEncoder(
                self.config,
                placed,
                self.tokenizer,
                mesh=self.mesh,
                attn_impl=self.attn_impl,
                params_are_placed=True,
                **kwargs,
            )
        else:
            self._encoder.params = placed
        try:
            metrics, _, _ = evaluate_checkpoint(
                "<live-params>",  # unused: the encoder is supplied
                self.queries,
                self.labels,
                self.corpus,
                encoder=self._encoder,
                mesh=self.mesh,
                batch_size=self.batch_size,
                max_query_length=self.max_query_length,
                max_passage_length=self.max_passage_length,
                k=self.k,
                cutoffs=self.cutoffs,
                index_type=self.index_type,
                index_kwargs=self.index_kwargs,
            )
        finally:
            # drop the replicated param copy: with FSDP the whole point of
            # sharding is that full params never stay resident
            self._encoder.params = None
        return {f"retrieval_{name}": float(v) for name, v in metrics.items()}


def maybe_attach_retrieval_eval(
    trainer, data_args, config, tokenizer, *, mesh=None, attn_impl="auto"
) -> bool:
    """Wire ``--retrieval_eval_query_file``/``--retrieval_eval_corpus_file``
    (TrainDataArguments) onto a Trainer. Shared by run_contrastive and
    run_rankpo. Returns True when a hook was attached."""
    qf = getattr(data_args, "retrieval_eval_query_file", None)
    cf = getattr(data_args, "retrieval_eval_corpus_file", None)
    if not qf:
        if cf:
            raise ValueError(
                "--retrieval_eval_corpus_file requires "
                "--retrieval_eval_query_file"
            )
        return False
    if not cf:
        raise ValueError(
            "--retrieval_eval_query_file requires --retrieval_eval_corpus_file"
        )
    import jax.numpy as jnp

    k = int(data_args.retrieval_eval_k)
    trainer.retrieval_eval_fn = RetrievalEvalHook(
        config,
        tokenizer,
        qf,
        cf,
        mesh=mesh,
        max_query_length=data_args.max_query_length,
        max_passage_length=data_args.max_passage_length,
        k=k,
        cutoffs=[c for c in (1, 5, 10, 20, 100) if c <= k] or [k],
        # match the train-config precision so in-training numbers stay
        # directly comparable with an offline rankpo-evaluate run using the
        # same --bf16 setting (the offline CLI defaults to fp32);
        # pure_bf16 runs also train in bf16, so they evaluate in bf16 too
        compute_dtype=(
            jnp.bfloat16
            if (
                trainer.config.bf16
                or getattr(trainer.config, "pure_bf16", False)
            )
            else jnp.float32
        ),
        attn_impl=attn_impl,
        index_type=getattr(data_args, "retrieval_eval_index", "flat"),
    )
    if trainer.config.eval_strategy == "no":
        logger.warning(
            "retrieval eval files given but --eval_strategy is 'no': the "
            "hook will never fire — set --eval_strategy epoch|steps"
        )
    return True
