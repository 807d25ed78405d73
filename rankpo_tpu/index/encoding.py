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
        params_are_placed: bool = False,
    ):
        self.config = config
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.normalize = normalize_embeddings
        self.compute_dtype = compute_dtype
        self.attn_impl = attn_impl
        self.length_multiple = length_multiple
        self._packed_fns: dict = {}  # max_segments -> jitted packed embed

        # multi-host: every process runs the SAME encode() over a global mesh
        # (each tokenizes the full chunk, contributes its contiguous row
        # slice); the reference merely scaffolds this (utils.py:165-285)
        self.process_count = jax.process_count()
        self.process_index = jax.process_index()
        if mesh is not None:
            # params_are_placed: the caller already holds mesh-replicated
            # device arrays (the in-training retrieval hook reshards LIVE
            # trainer params on device) — replicate_to_mesh would fetch the
            # whole tree to host in multi-process mode just to re-place it
            self.params = (
                params if params_are_placed else replicate_to_mesh(params, mesh)
            )
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

    # ------------------------------------------------------------------
    # sequence-packed encode
    # ------------------------------------------------------------------
    def _packed_embed_fn(self, max_segments: int):
        """jit-compiled packed embed, cached per max_segments (the one
        static knob; shapes recompile under the same jit as usual)."""
        fn = self._packed_fns.get(max_segments)
        if fn is not None:
            return fn

        def _embed(params, batch):
            reps, _valid = enc.embed_packed(
                params,
                self.config,
                batch,
                max_segments,
                normalize=self.normalize,
                compute_dtype=self.compute_dtype,
                deterministic=True,
                attn_impl=self.attn_impl,
            )
            return reps

        if self._batch_sharding is not None:
            fn = jax.jit(
                _embed,
                in_shardings=(
                    NamedSharding(self.mesh, P()),
                    {
                        "input_ids": self._batch_sharding,
                        "segment_ids": self._batch_sharding,
                    },
                ),
                out_shardings=NamedSharding(self.mesh, P()),
            )
        else:
            fn = jax.jit(_embed)
        self._packed_fns[max_segments] = fn
        return fn

    def encode_packed(
        self,
        sentences: List[str],
        *,
        max_length: int = 512,
        pack_length: int = 0,
        tokens_per_batch: int = 65536,
        pack_chunk: int = 8192,
        description: str = "Encoding (packed)",
    ) -> np.ndarray:
        """Sequence-packed encode: fp32 [N, H] embeddings in input order.

        Each text is truncated to ``max_length`` then bin-packed with its
        neighbors into rows of ``pack_length`` tokens (default: the chunk's
        longest text, rounded up to a power of two >= 256 so row shapes
        rarely change) — near-zero pad waste instead of pad-to-bucket. The
        per-text embeddings bit-match :meth:`encode`'s for the same
        tokenization (tests/test_packing.py); only the batching differs.

        ``pack_chunk`` texts are tokenized and packed at a time (bounds host
        memory and keeps the best-fit packer O(chunk log chunk)); rows
        dispatch in groups of ~``tokens_per_batch`` tokens.
        """
        if isinstance(sentences, str):
            raise ValueError("encode_packed takes a list of texts")
        if sentences and not isinstance(sentences[0], str):
            raise ValueError("Input items should be text.")
        from rankpo_tpu.data.packing import occupancy, pack_token_lists

        n = len(sentences)
        hidden = int(self.config.hidden_size)
        out = np.zeros((n, hidden), np.float32)
        if n == 0:
            return out
        pad_id = self.config.pad_token_id or 0
        n_dev = self.mesh.devices.size if self.mesh is not None else 1

        logged = False
        pending: list = []
        max_in_flight = 16  # same bounded-window rationale as encode()

        def _drain(entry):
            reps, tidx = entry  # [R, M, H] fetched lazily; [R, M] host
            reps = np.asarray(reps, np.float32)
            flat_idx = tidx.reshape(-1)
            sel = flat_idx >= 0
            out[flat_idx[sel]] = reps.reshape(-1, hidden)[sel]

        for lo in range(0, n, pack_chunk):
            chunk = sentences[lo : lo + pack_chunk]
            encoded = self.tokenizer(
                chunk, max_length=max_length, truncation=True
            )
            # empty tokenizations pack as a single pad token (finite garbage
            # embedding, like the unpacked path's all-pad row)
            ids_list = [x or [pad_id] for x in encoded["input_ids"]]
            longest = max(len(x) for x in ids_list)
            if pack_length:
                cap = pack_length
                if longest > cap:
                    raise ValueError(
                        f"pack_length {cap} < longest tokenized text "
                        f"{longest}; raise it or lower max_length"
                    )
            else:
                cap = 256
                while cap < longest:
                    cap *= 2
            # segment cap: a power of two so the pooling table's static
            # width (and its compile) rarely changes across chunks
            mseg = 8
            while mseg < min(cap, 4 * max(1, cap // max(1, longest))):
                mseg *= 2
            packed = pack_token_lists(ids_list, cap, mseg, pad_id)
            m = 8
            while m < packed.max_segments:
                m *= 2
            rows_per_batch = max(1, tokens_per_batch // cap)
            rows_per_batch = max(n_dev, rows_per_batch // n_dev * n_dev)
            embed_fn = self._packed_embed_fn(m)
            if not logged:
                logger.info(
                    "%s: %d texts, rows %dx%d tokens, <=%d texts/row, "
                    "occupancy %.1f%%",
                    description, n, rows_per_batch, cap, m,
                    100 * occupancy(packed),
                )
                logged = True
            for rlo in range(0, packed.n_rows, rows_per_batch):
                ids = packed.input_ids[rlo : rlo + rows_per_batch]
                seg = packed.segment_ids[rlo : rlo + rows_per_batch]
                tidx = packed.text_index[rlo : rlo + rows_per_batch]
                pad_rows = rows_per_batch - ids.shape[0]
                if pad_rows:  # filler rows: all-pad, 0 segments -> zeros
                    ids = np.pad(ids, ((0, pad_rows), (0, 0)),
                                 constant_values=pad_id)
                    seg = np.pad(seg, ((0, pad_rows), (0, 0)))
                if pad_rows or tidx.shape[1] < m:
                    tidx = np.pad(
                        tidx,
                        ((0, pad_rows), (0, m - tidx.shape[1])),
                        constant_values=-1,
                    )
                batch = {
                    "input_ids": ids.astype(np.int32),
                    "segment_ids": seg.astype(np.int32),
                }
                if self.process_count > 1:
                    local = rows_per_batch // self.process_count
                    sl = slice(self.process_index * local,
                               (self.process_index + 1) * local)
                    batch = jax.tree_util.tree_map(
                        lambda x: jax.make_array_from_process_local_data(
                            self._batch_sharding, np.ascontiguousarray(x[sl])
                        ),
                        batch,
                    )
                reps = embed_fn(self.params, batch)
                reps.copy_to_host_async()
                # chunk-local text ids -> global
                pending.append((reps, np.where(tidx >= 0, tidx + lo, -1)))
                if len(pending) > max_in_flight:
                    _drain(pending.pop(0))
        for entry in pending:
            _drain(entry)
        return out

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
