"""Host input pipeline: sharded, shuffled, prefetching batch loader.

Replaces the reference's accelerate-prepared torch DataLoader
(src/contrastive_trainer.py:92-146): each JAX process reads only its shard of
every global batch (process-sharded sampling), the collator produces
static-shape numpy batches, and a background thread keeps ``prefetch`` batches
ahead so tokenum/pad work overlaps device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np


def _stack_microbatches(path, *xs):
    """np.stack one leaf across an accumulation group, padding the leading
    (row) dim to the group max first when microbatches disagree — packed
    collators (data/packing.py) keep a sticky row budget, but a rare
    overflow batch can be taller than its group peers. Pad rows are inert:
    segment_ids 0 (= no text) and slot_index -1 (= no slot); input ids pad
    with 0, a valid vocab row that inert rows never surface."""
    if len({x.shape for x in xs}) == 1:
        return np.stack(xs, axis=0)
    rows = max(x.shape[0] for x in xs)
    name = getattr(path[-1], "key", None) if path else None
    fill = -1 if name == "slot_index" else 0
    xs = [
        np.pad(
            x,
            [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1),
            constant_values=fill,
        )
        for x in xs
    ]
    return np.stack(xs, axis=0)


class DataLoader:
    def __init__(
        self,
        dataset,
        collator: Callable,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        prefetch: int = 2,
    ):
        if batch_size % process_count != 0:
            raise ValueError(
                f"global batch_size {batch_size} must divide evenly over "
                f"{process_count} processes"
            )
        self.dataset = dataset
        self.collator = collator
        self.batch_size = batch_size
        self.local_batch_size = batch_size // process_count
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch

    def steps_per_epoch(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, epoch))
            return rng.permutation(n)
        return np.arange(n)

    def epoch(
        self, epoch: int = 0, start_step: int = 0, stack: int = 0
    ) -> Iterator[dict]:
        """Iterate this process's batches for one epoch. ``start_step`` skips
        already-consumed batches (resume support, the analog of the reference's
        batch-skipping on resume, contrastive_trainer.py:472-481).

        ``stack`` > 0 groups that many consecutive microbatches and np.stacks
        them into one [stack, B, ...] array INSIDE the worker thread, so the
        whole accumulation group's collation + stacking overlaps device compute
        (the reference's prepared-DataLoader overlap,
        contrastive_trainer.py:92-146); a trailing partial group is dropped,
        matching the train loop's drop semantics."""
        if stack > 0 and not self.drop_last:
            # stacked groups require every batch at the full static shape;
            # a ragged final batch would np.stack-crash (and in multi-process
            # give ranks unequal row counts). Training always stacks and the
            # TPU needs static shapes anyway — drop the partial tail.
            raise ValueError(
                "drop_last=False is incompatible with stacked accumulation "
                "groups (static shapes); set dataloader_drop_last=True"
            )
        order = self._epoch_order(epoch)
        steps = self.steps_per_epoch()
        stop = threading.Event()

        def produce(out_q: queue.Queue):
            def put(item) -> bool:
                # bounded put that gives up when the consumer abandoned the
                # generator (otherwise this thread blocks forever on a full
                # queue, pinning collated batches in memory)
                while not stop.is_set():
                    try:
                        out_q.put(item, timeout=0.1)
                        return True
                    except queue.Full:
                        continue
                return False

            try:
                group = []
                for step in range(start_step, steps):
                    if stop.is_set():
                        return
                    lo = step * self.batch_size
                    global_ids = order[lo : lo + self.batch_size]
                    local_ids = global_ids[
                        self.process_index :: self.process_count
                    ]
                    rows = [self.dataset[int(i)] for i in local_ids]
                    collated = self.collator(rows)
                    if stack <= 0:
                        if not put(("batch", collated)):
                            return
                        continue
                    group.append(collated)
                    if len(group) == stack:
                        import jax

                        stacked = jax.tree_util.tree_map_with_path(
                            _stack_microbatches, *group
                        )
                        group = []
                        if not put(("batch", stacked)):
                            return
                put(("done", None))
            except Exception as e:  # surface worker errors in the consumer
                put(("error", e))

        q: queue.Queue = queue.Queue(maxsize=max(1, self.prefetch))
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        try:
            while True:
                kind, payload = q.get()
                if kind == "done":
                    return
                if kind == "error":
                    raise payload
                yield payload
        finally:
            # consumer done or abandoned (max_steps, preemption, exception):
            # release the producer thread
            stop.set()
