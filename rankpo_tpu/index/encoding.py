"""Batched text → embedding encoder for evaluation, mining, and serving.

TPU-native analog of the reference's ``ModelForInference.encode``
(src/modeling.py:473-554), with the differences that matter on TPU:

  - static shapes: row count padded to the (fixed) batch size and sequence
    length padded to a bucket (multiple of ``length_multiple``, capped at
    ``max_length``) so each bucket compiles exactly once — instead of the
    reference's pad-to-batch-max dynamic shapes;
  - mesh-parallel: the batch is sharded over the data axis, making multi-chip
    corpus encoding first-class (the reference scaffolds this in
    utils.py:165-285 split_between_processes but never uses it);
  - output always fp32 numpy (the reference upcasts bf16 before numpy,
    modeling.py:537-538).
"""

from __future__ import annotations

import logging
from typing import List, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rankpo_tpu.core.mesh import DATA_AXIS, replicate_to_mesh
from rankpo_tpu.data.collators import _pad_block
from rankpo_tpu.models import encoder as enc
from rankpo_tpu.models.config import EncoderConfig

logger = logging.getLogger(__name__)


class InferenceEncoder:
    def __init__(
        self,
        config: EncoderConfig,
        params,
        tokenizer,
        *,
        mesh=None,
        normalize_embeddings: bool = True,
        compute_dtype=jnp.bfloat16,
        attn_impl: str = "auto",
        length_multiple: int = 64,
    ):
        self.config = config
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.normalize = normalize_embeddings
        self.compute_dtype = compute_dtype
        self.attn_impl = attn_impl
        self.length_multiple = length_multiple

        # multi-host: every process runs the SAME encode() over a global mesh
        # (each tokenizes the full chunk, contributes its contiguous row
        # slice); the reference merely scaffolds this (utils.py:165-285)
        self.process_count = jax.process_count()
        self.process_index = jax.process_index()
        if mesh is not None:
            self.params = replicate_to_mesh(params, mesh)
            batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
        else:
            self.params = params
            batch_sharding = None

        def _embed(params, batch):
            return enc.embed(
                params,
                config,
                batch,
                normalize=self.normalize,
                compute_dtype=self.compute_dtype,
                deterministic=True,
                attn_impl=self.attn_impl,
            )

        if batch_sharding is not None:
            # outputs replicated so every process can fetch full batches
            self._embed_fn = jax.jit(
                _embed,
                in_shardings=(
                    NamedSharding(mesh, P()),
                    {"input_ids": batch_sharding, "attention_mask": batch_sharding},
                ),
                out_shardings=NamedSharding(mesh, P()),
            )
            self._batch_sharding = batch_sharding
        else:
            self._embed_fn = jax.jit(_embed)
            self._batch_sharding = None

    @classmethod
    def from_pretrained(cls, path: str, tokenizer=None, **kwargs) -> "InferenceEncoder":
        from rankpo_tpu.data.tokenization import load_tokenizer
        from rankpo_tpu.models import load_pretrained

        config, params = load_pretrained(path)
        if tokenizer is None:
            tokenizer = load_tokenizer(path)
        return cls(config, params, tokenizer, **kwargs)

    # ------------------------------------------------------------------
    def _bucket_length(self, longest: int, max_length: int) -> int:
        m = self.length_multiple
        # the max_length cap wins over the multiple floor: with
        # max_query_length=32 and multiple 64 the old max(m, ...) padded every
        # query to 64 tokens, ~doubling encode FLOPs for truncated-to-32 text
        return min(max_length, max(m, -(-longest // m) * m))

    def prepare_batch(self, chunk: List[str], batch_size: int, max_length: int):
        """Tokenize + right-pad one chunk to a static [batch_size, bucket]
        shape (rows past len(chunk) are filler). Returns the device-ready
        batch dict — on a multi-process mesh, globally sharded with this
        process contributing its contiguous row slice. Shared by encode()
        and the serving fused encode+search program (same tokenization is
        what makes fused scores bit-identical to the two-dispatch path)."""
        pad_id = self.config.pad_token_id or 0
        encoded = self.tokenizer(chunk, max_length=max_length, truncation=True)
        ids_list = encoded["input_ids"]
        longest = max(len(x) for x in ids_list)
        target = self._bucket_length(longest, max_length)
        # row padding shares the collators' right-pad helper (the
        # last-token-pooling invariant lives in exactly one place)
        block = _pad_block(ids_list, pad_id, target, None)
        pad_rows = batch_size - len(chunk)
        ids = np.pad(block["input_ids"], ((0, pad_rows), (0, 0)),
                     constant_values=pad_id)
        mask = np.pad(block["attention_mask"], ((0, pad_rows), (0, 0)))
        # fully-padded filler rows keep static shape; pooling needs at
        # least one attended token, give them one pad token attended
        mask[len(chunk):, 0] = 1
        batch = {"input_ids": ids, "attention_mask": mask}
        if self.process_count > 1:
            # every process tokenized the full chunk; contribute this
            # process's contiguous row slice to the global sharded batch
            local = batch_size // self.process_count
            sl = slice(self.process_index * local,
                       (self.process_index + 1) * local)
            batch = jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    self._batch_sharding, np.ascontiguousarray(x[sl])
                ),
                batch,
            )
        return batch

    def encode(
        self,
        sentences: Union[str, List[str]],
        *,
        batch_size: int = 256,
        max_length: int = 512,
        description: str = "Encoding",
        sort_by_length: bool = True,
    ) -> np.ndarray:
        """Returns fp32 [N, H] embeddings (or [H] for a single string).

        ``sort_by_length`` (multi-chunk calls only) processes texts in
        length order and restores input order afterwards: without it one
        long text drags its whole chunk to the long sequence bucket, so a
        mixed-length corpus pays near-max_length FLOPs per chunk (the
        reference pads each batch to ITS max, modeling.py:509-518 — same
        sensitivity to input order). Sorting makes chunks length-homogeneous
        so most ride short buckets; each embedding depends only on its own
        row, and the stable sort is deterministic across processes (every
        process derives the same order, multi-host encode stays in
        lockstep). Cost: up to max_length/length_multiple distinct compiled
        buckets instead of (typically) one."""
        single = isinstance(sentences, str)
        if single:
            sentences = [sentences]
        if sentences and not isinstance(sentences[0], str):
            raise ValueError("Input items should be text.")

        order = None
        if sort_by_length and len(sentences) > batch_size:
            # char length as the token-length proxy (monotone enough for
            # bucketing; avoids a second tokenization pass)
            order = np.argsort([len(s) for s in sentences], kind="stable")
            sentences = [sentences[i] for i in order]

        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        if batch_size % n_dev != 0:
            batch_size = -(-batch_size // n_dev) * n_dev

        # async dispatch with a BOUNDED in-flight window: outputs stay on
        # device until the window fills, then the oldest is fetched while the
        # device keeps running newer batches. Unbounded pending replicated
        # every [batch, H] output on every device for the whole corpus —
        # O(N*H) HBM at corpus scale (a 4M-text encode OOMed a 16G chip).
        max_in_flight = 16
        out: list = []
        pending: list = []
        n = len(sentences)
        for lo in range(0, n, batch_size):
            chunk = sentences[lo : lo + batch_size]
            batch = self.prepare_batch(chunk, batch_size, max_length)
            reps = self._embed_fn(self.params, batch)
            # queue this batch's D2H behind its compute now: the copy overlaps
            # later batches' compute instead of serializing at the window edge
            reps.copy_to_host_async()
            pending.append((reps, len(chunk)))
            if len(pending) > max_in_flight:
                reps0, real0 = pending.pop(0)
                out.append(np.asarray(reps0[:real0], np.float32))
            if lo == 0:
                logger.info(
                    "%s: %d texts, batch %d, seq %d", description, n,
                    batch_size, batch["input_ids"].shape[-1],
                )
        out.extend(np.asarray(reps[:real], np.float32) for reps, real in pending)
        result = np.concatenate(out, axis=0) if out else np.zeros((0, 0), np.float32)
        if order is not None:  # undo the length sort: row i ↔ sentences[i]
            inverse = np.empty_like(order)
            inverse[order] = np.arange(len(order))
            result = result[inverse]
        return result[0] if single else result

    def encode_sharded(
        self,
        sentences: List[str],
        *,
        batch_size: int = 256,
        max_length: int = 512,
        description: str = "Encoding (device-resident)",
        sort_by_length: bool = True,
    ):
        """Device-resident corpus encode: returns ``(embeddings, n_total)``
        where ``embeddings`` is a row-sharded fp32 ``jax.Array`` of shape
        [n_buf, H] (n_buf >= n_total, divisible by the data-axis shard
        count; rows past n_total are zeros) that never visits the host.

        The host-returning ``encode`` fetches every [batch, H] block and an
        index build re-uploads the matrix — two full-corpus transfers plus
        an O(N*H) host-RAM ceiling (a 10M x d1024 fp32 corpus is 40 GB of
        host numpy). Here each batch's replicated embed output is written
        straight into a preallocated row-sharded HBM buffer with a donated
        ``dynamic_update_slice`` (traced offset: one compile total), which
        is exactly the layout ``FlatIPIndex.from_sharded`` /
        ``RefineIPIndex.from_sharded`` pin into the index. Same _embed_fn
        and chunking as ``encode`` — values are bit-identical to the host
        path."""
        import jax

        if not isinstance(sentences, list):
            sentences = list(sentences)
        n = len(sentences)
        hidden = int(self.config.hidden_size)
        n_shards = (
            self.mesh.shape[DATA_AXIS] if self.mesh is not None else 1
        )

        order = None
        if sort_by_length and n > batch_size:
            order = np.argsort([len(s) for s in sentences], kind="stable")
            sentences = [sentences[i] for i in order]

        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        if batch_size % n_dev != 0:
            batch_size = -(-batch_size // n_dev) * n_dev
        if n == 0:
            n_buf = n_shards
        else:
            # ceil to whole batches: the last dynamic_update_slice must not
            # clamp backwards over real rows (batch % n_dev == 0 and the
            # data-axis size divides n_dev, so n_buf stays shard-divisible)
            n_buf = -(-n // batch_size) * batch_size
            n_buf = -(-n_buf // n_shards) * n_shards

        row_sharding = (
            NamedSharding(self.mesh, P(DATA_AXIS, None))
            if self.mesh is not None else None
        )
        shard_kw = (
            {"out_shardings": row_sharding} if row_sharding is not None else {}
        )
        buf = jax.jit(
            lambda: jnp.zeros((n_buf, hidden), jnp.float32), **shard_kw
        )()

        def _update(buf, chunk, lo, real):
            row = jax.lax.broadcasted_iota(jnp.int32, chunk.shape, 0)
            chunk = jnp.where(row < real, chunk.astype(jnp.float32), 0.0)
            return jax.lax.dynamic_update_slice(buf, chunk, (lo, 0))

        update_kw = dict(donate_argnums=0)
        if row_sharding is not None:
            update_kw.update(
                in_shardings=(
                    row_sharding,
                    NamedSharding(self.mesh, P()),
                    NamedSharding(self.mesh, P()),
                    NamedSharding(self.mesh, P()),
                ),
                out_shardings=row_sharding,
            )
        update_fn = jax.jit(_update, **update_kw)

        for lo in range(0, n, batch_size):
            chunk = sentences[lo : lo + batch_size]
            batch = self.prepare_batch(chunk, batch_size, max_length)
            reps = self._embed_fn(self.params, batch)
            buf = update_fn(
                buf, reps, jnp.int32(lo), jnp.int32(len(chunk))
            )
            if lo == 0:
                logger.info(
                    "%s: %d texts, batch %d, seq %d", description, n,
                    batch_size, batch["input_ids"].shape[-1],
                )

        if order is not None:
            # undo the length sort ON DEVICE (one cross-shard gather);
            # pad positions map to pad positions so zeros stay zeros
            inverse = np.empty_like(order)
            inverse[order] = np.arange(len(order))
            inv_full = np.concatenate(
                [inverse, np.arange(n, n_buf)]
            ).astype(np.int32)
            inv_dev = (
                replicate_to_mesh(inv_full, self.mesh)
                if self.mesh is not None else jnp.asarray(inv_full)
            )
            buf = jax.jit(
                lambda b, i: jnp.take(b, i, axis=0), **shard_kw
            )(buf, inv_dev)
        return buf, n
