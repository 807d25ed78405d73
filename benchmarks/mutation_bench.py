"""Index mutation latency at scale: device path vs the old host rebuild.

The serving layer's /add //remove used to fetch the stored matrix to the
host (O(N*D) fp32), concat/compact there, and rebuild — at 1M x d1024
that is a 4 GB device->host->device round trip (minutes through a remote
tunnel; an outright host-RAM OOM at the 10M+ scales the device-resident
build exists for). The device path (`append_sharded`/`remove_rows`)
slices/gathers storage on device instead.

Measures, on the real chip:
  - append_sharded of ``--n_new`` rows into an N-row index (per tier)
  - remove_rows of ``--n_new`` positions
  - the old host path's fetch leg alone (index storage -> host fp32),
    which LOWER-bounds the rebuild it replaced (skippable: --skip_host)

Run: python benchmarks/mutation_bench.py --n 1000000 --d 1024
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x) -> float:
    """Synchronize by fetching a SCALAR (fetching arrays through the
    tunnel measures D2H, not compute — CLAUDE.md benchmarking rule)."""
    import jax.numpy as jnp

    if isinstance(x, (tuple, list)):
        x = x[0]
    head = x[:8] if x.ndim == 1 else x[0, :8]
    return float(jnp.sum(head.astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--n_new", type=int, default=1024)
    ap.add_argument("--tiers", default="flat_bf16,flat_int8,ivf_pq")
    ap.add_argument("--skip_host", action="store_true",
                    help="skip the old host-path fetch-leg timing")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rankpo_tpu.index import FlatIPIndex, IVFIPIndex

    dev = jax.devices()[0]
    print(f"backend={dev.platform} device={dev}")
    key = jax.random.key(0)

    def make_rows(k, n, d):
        x = jax.random.normal(k, (n, d), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    corpus = jax.jit(make_rows, static_argnums=(1, 2))(key, args.n, args.d)
    _sync(corpus)
    new_rows = jax.jit(make_rows, static_argnums=(1, 2))(
        jax.random.fold_in(key, 1), args.n_new, args.d
    )
    _sync(new_rows)
    removed = np.linspace(0, args.n - 1, args.n_new).astype(np.int64)

    def build(tier):
        if tier == "flat_bf16":
            return FlatIPIndex.from_sharded(
                corpus, args.n, None, dtype=jnp.bfloat16
            )
        if tier == "flat_int8":
            return FlatIPIndex.from_sharded(
                corpus, args.n, None, dtype=jnp.int8
            )
        if tier == "ivf_pq":
            return IVFIPIndex.from_sharded(
                corpus, args.n, None, pq_m=max(8, args.d // 16),
                nprobe=8, kmeans_iters=4,
            )
        raise SystemExit(f"unknown tier {tier}")

    for tier in args.tiers.split(","):
        t0 = time.time()
        index = build(tier)
        print(f"[{tier}] build: {time.time() - t0:.1f}s "
              f"(ntotal={index.ntotal})")

        # --- device append (first call pays the mutation compile) -------
        times = []
        idx = index
        for r in range(args.repeats):
            t0 = time.time()
            idx = index.append_sharded(new_rows, args.n_new)
            _sync(idx.corpus)
            times.append(time.time() - t0)
        print(f"[{tier}] append_sharded({args.n_new}): "
              f"first={times[0]*1e3:.0f}ms "
              f"warm={min(times[1:])*1e3:.0f}ms")

        # --- device remove ----------------------------------------------
        times = []
        for r in range(args.repeats):
            t0 = time.time()
            # distinct ids per repeat, wrapped to stay inside [0, n_total)
            out = idx.remove_rows((removed + r) % idx.n_total)
            _sync(out.row_ids if hasattr(out, "row_ids") else out.corpus)
            times.append(time.time() - t0)
        print(f"[{tier}] remove_rows({args.n_new}): "
              f"first={times[0]*1e3:.0f}ms "
              f"warm={min(times[1:])*1e3:.0f}ms")

        # --- old host path, fetch leg only ------------------------------
        if not args.skip_host:
            t0 = time.time()
            rows = np.asarray(index.corpus)  # raw storage bytes, as
            # _stored_embeddings fetched them (host-side decode excluded)
            host_s = time.time() - t0
            gb = rows.nbytes / 1e9
            print(f"[{tier}] OLD host-path fetch leg: {host_s:.1f}s "
                  f"({gb:.2f} GB storage -> host; the rebuild also paid "
                  f"re-quantize + re-upload on top)")
            del rows
        del index, idx


if __name__ == "__main__":
    main()
