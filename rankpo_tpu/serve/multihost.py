"""Pod-scale serving: one HTTP frontend, every process participates in search.

With the corpus sharded over a multi-host mesh (the BASELINE "v5e-32 pod
serving" regime: 8M+ passages at 1M/chip), a search is a GLOBAL collective —
every process must execute the same jitted encode+search in lockstep. HTTP
requests only arrive at one process, so rank 0 broadcasts each query batch
(fixed-size uint8 buffer via ``multihost_utils.broadcast_one_to_all``) and
the followers replay it against the shared service.

The reference has no serving at all; its closest scaffold is the unwired
``split_between_processes`` (src/utils.py:165-285). This is the online
counterpart of our multi-host offline encode (cli/evaluate.py et al.).

Usage: every process builds the SAME RetrievalService (same corpus/index
file), then rank 0 wraps it in :class:`MultihostFrontend` and serves HTTP
while ranks 1.. call :meth:`follower_loop`.
"""

from __future__ import annotations

import json
import logging
import threading
from typing import Dict, List, Sequence

import numpy as np

logger = logging.getLogger(__name__)


class MultihostFrontend:
    """Drop-in for RetrievalService on rank 0; replays queries on followers.

    Exposes the same surface MicroBatcher and the HTTP handler consume
    (``query``/``ntotal``/``corpus_texts``), so micro-batching composes: the
    batcher groups requests on rank 0, and each grouped dispatch is broadcast
    once.
    """

    def __init__(self, service, *, max_payload_bytes: int = 1 << 20):
        import jax

        self.service = service
        self.max_payload = max_payload_bytes
        self.process_index = jax.process_index()
        # one collective stream: broadcast+query must not interleave
        self._lock = threading.Lock()

    # -- delegation ----------------------------------------------------
    @property
    def ntotal(self) -> int:
        return self.service.ntotal

    @property
    def corpus_texts(self) -> List[str]:
        return self.service.corpus_texts

    # -- wire protocol ---------------------------------------------------
    def _broadcast(self, obj: Dict | None) -> Dict:
        from jax.experimental import multihost_utils

        if self.process_index == 0:
            data = json.dumps(obj).encode()
            if len(data) > self.max_payload:
                raise ValueError(
                    f"payload {len(data)}B exceeds max_payload_bytes="
                    f"{self.max_payload}; raise it or send fewer/shorter queries"
                )
            buf = np.zeros(self.max_payload, np.uint8)
            buf[: len(data)] = np.frombuffer(data, np.uint8)
            length = np.int32(len(data))
        else:
            buf = np.zeros(self.max_payload, np.uint8)
            length = np.int32(0)
        length, buf = multihost_utils.broadcast_one_to_all((length, buf))
        return json.loads(bytes(np.asarray(buf)[: int(length)]))

    # -- rank-0 entry ----------------------------------------------------
    def query(
        self,
        texts: Sequence[str] | str,
        k: int = 10,
        *,
        return_passages: bool = True,
        allowed_ids=None,
        disallowed_ids=None,
        nprobe=None,
        candidates=None,
    ):
        if self.process_index != 0:
            raise RuntimeError("query() is rank-0 only; followers run follower_loop()")
        single = isinstance(texts, str)
        batch = [texts] if single else list(texts)
        # validate BEFORE broadcasting: once the dispatch is announced, every
        # process must be able to run it identically — a request that fails
        # validation only on rank 0 (bad types, no index) would otherwise
        # diverge the collective and wedge the pod
        if not all(isinstance(t, str) for t in batch):
            raise ValueError("Input items should be text.")
        if self.service.index is None:
            raise RuntimeError("no index built; call build_index first")
        if allowed_ids is not None and disallowed_ids is not None:
            raise ValueError(
                "give at most one of allowed_ids / disallowed_ids"
            )
        # the filter mask rides the index's search program on every process
        # (a sharded/replicated collective input), so it must broadcast with
        # the queries; same-positional-filter replay keeps the pod in lockstep
        sel = {}
        if allowed_ids is not None:
            sel["allowed_ids"] = [int(i) for i in allowed_ids]
        if disallowed_ids is not None:
            sel["disallowed_ids"] = [int(i) for i in disallowed_ids]
        if nprobe is not None:
            sel["nprobe"] = int(nprobe)
        if candidates is not None:
            sel["candidates"] = int(candidates)
        with self._lock:
            self._broadcast(
                {"op": "query", "texts": batch, "k": int(k), **sel}
            )
            result = self.service.query(
                batch, k=k, return_passages=return_passages, **sel
            )
        return result[0] if single else result

    def add_passages(self, texts: Sequence[str], **kwargs) -> None:
        """Broadcast an index-extension (collective encode) to every process."""
        if self.process_index != 0:
            raise RuntimeError("add_passages() is rank-0 only")
        with self._lock:
            # kwargs ride the broadcast: encode shapes must match on every
            # process or the collective diverges
            self._broadcast({"op": "add", "texts": list(texts), "kwargs": kwargs})
            self.service.add_passages(list(texts), **kwargs)

    def remove_passages(self, ids) -> int:
        """Broadcast a removal (collective rebuild) to every process."""
        if self.process_index != 0:
            raise RuntimeError("remove_passages() is rank-0 only")
        with self._lock:
            ids = [int(i) for i in ids]
            self._broadcast({"op": "remove", "ids": ids})
            return self.service.remove_passages(ids)

    def save_index(self, path: str) -> None:
        """Broadcast a collective index save: ``RetrievalService.save_index``
        gathers sharded state collectively, so EVERY process must call it
        (each writes its own copy, atomic rename)."""
        if self.process_index != 0:
            raise RuntimeError("save_index() is rank-0 only")
        with self._lock:
            self._broadcast({"op": "save", "path": str(path)})
            self.service.save_index(str(path))

    def stop(self) -> None:
        """Release followers (rank 0)."""
        if self.process_index == 0:
            with self._lock:
                self._broadcast({"op": "stop"})

    # -- ranks 1.. -------------------------------------------------------
    def follower_loop(self) -> None:
        """Blocks replaying rank 0's dispatches until a stop message."""
        if self.process_index == 0:
            raise RuntimeError("follower_loop() is for ranks != 0")
        logger.info("follower %d entering serve loop", self.process_index)
        while True:
            msg = self._broadcast(None)
            if msg["op"] == "stop":
                logger.info("follower %d stopping", self.process_index)
                return
            try:
                # same texts/k on every process -> identical jitted dispatch
                if msg["op"] == "add":
                    self.service.add_passages(
                        msg["texts"], **msg.get("kwargs", {})
                    )
                elif msg["op"] == "remove":
                    self.service.remove_passages(msg["ids"])
                elif msg["op"] == "save":
                    self.service.save_index(msg["path"])
                else:
                    sel = {
                        key: msg[key]
                        for key in ("allowed_ids", "disallowed_ids",
                                    "nprobe", "candidates")
                        if key in msg
                    }
                    self.service.query(
                        msg["texts"], k=msg["k"], return_passages=False,
                        **sel,
                    )
            except Exception:
                # rank 0 catches its own copy of the failure and keeps
                # serving; a follower must survive too — dying here leaves
                # the next collective one participant short (pod wedge)
                logger.exception(
                    "follower %d: dispatch failed, continuing", self.process_index
                )
