"""Probed-row gather formulations for the IVF search path.

The 1M/Q=8 ivf_probe run showed ~8 ms of on-device work for what is only a
42 MB probed-row gather + a tiny rerank — ~5 GB/s effective against an HBM
that streams ~800 GB/s through a matmul. Either XLA lowers the block gather
(``jnp.take(blocks[K_c, cap, D], probe[Q, p])``) serially, or the rerank
einsum (per-query matvecs, MXU-hostile) stalls. This probe times four
formulations producing IDENTICAL (scores, ids) so the winner can be adopted
in ``IVFIPIndex.search_callable`` with a parity test:

  A block-take   take over [K_c, cap*D] blocks (current probe_block shape)
  B row-take     expand probe to slot ids, take 2 KB rows from [slots, D]
  C one-hot      probe -> one-hot [Q*p, K_c] bf16, gather AS A MATMUL on the
                 MXU (FLOPs Q*p*K_c*cap*D — wins only at tiny Q if ever)
  D slice-scan   fori_loop of dynamic_slice block copies (serial DMA)

Run: ``python benchmarks/gather_probe.py --q 8 256``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=1_000_000)
parser.add_argument("--d", type=int, default=1024)
parser.add_argument("--clusters", type=int, default=4096)
parser.add_argument("--capacity", type=int, default=320)
parser.add_argument("--q", type=int, nargs="+", default=[8, 256])
parser.add_argument("--p", type=int, default=8)
parser.add_argument("--k", type=int, default=100)
parser.add_argument("--reps", type=int, default=0,
                    help="0 = auto (more reps at small Q to amortize the "
                    "~27ms tunnel dispatch floor)")
_args = parser.parse_args()

K_C, CAP, D, P_PROBE, K = (
    _args.clusters, _args.capacity, _args.d, _args.p, _args.k
)
SLOTS = K_C * CAP


def main():
    print(
        f"backend={jax.default_backend()} slots={SLOTS} (K_c={K_C} x "
        f"cap={CAP}) D={D} p={P_PROBE} k={K} bf16 storage",
        flush=True,
    )

    @jax.jit
    def gen(key):
        kc, kq = jax.random.split(key)
        corpus = jax.random.normal(kc, (SLOTS, D), jnp.bfloat16)
        return corpus

    corpus = gen(jax.random.key(0))
    jax.block_until_ready(corpus)

    def rerank_topk(queries, rows, q, width):
        """rows [q, width, D] -> (top scores, positions)."""
        s = jnp.einsum(
            "qd,qnd->qn", queries.astype(jnp.bfloat16), rows,
            preferred_element_type=jnp.float32,
        )
        return lax.top_k(s, K)

    def variant_block_take(corpus_arg, probe, queries):
        q = queries.shape[0]
        blocks = corpus_arg.reshape(K_C, CAP, D)
        rows = jnp.take(blocks, probe, axis=0)  # [q, p, cap, D]
        return rerank_topk(
            queries, rows.reshape(q, P_PROBE * CAP, D), q, P_PROBE * CAP
        )

    def variant_row_take(corpus_arg, probe, queries):
        q = queries.shape[0]
        slots = (
            probe[:, :, None] * CAP + lax.iota(jnp.int32, CAP)[None, None, :]
        ).reshape(q, P_PROBE * CAP)
        rows = jnp.take(corpus_arg, slots, axis=0)  # [q, p*cap, D]
        return rerank_topk(queries, rows, q, P_PROBE * CAP)

    def variant_onehot(corpus_arg, probe, queries):
        q = queries.shape[0]
        onehot = jax.nn.one_hot(
            probe.reshape(q * P_PROBE), K_C, dtype=jnp.bfloat16
        )
        rows = (onehot @ corpus_arg.reshape(K_C, CAP * D)).reshape(
            q, P_PROBE * CAP, D
        )
        return rerank_topk(queries, rows, q, P_PROBE * CAP)

    def variant_slice_scan(corpus_arg, probe, queries):
        q = queries.shape[0]
        flat_probe = probe.reshape(q * P_PROBE)

        def body(i, out):
            blk = lax.dynamic_slice_in_dim(
                corpus_arg, flat_probe[i] * CAP, CAP
            )
            return lax.dynamic_update_slice_in_dim(out, blk, i * CAP, axis=0)

        rows = lax.fori_loop(
            0, q * P_PROBE, body,
            jnp.zeros((q * P_PROBE * CAP, D), jnp.bfloat16),
        )
        return rerank_topk(
            queries, rows.reshape(q, P_PROBE * CAP, D), q, P_PROBE * CAP
        )

    # full-path clones of IVFIPIndex.probe_block: centroid matmul + top_k
    # picks the probe ids IN-JIT (the standalone variants take them as
    # inputs), plus the id gather and the empty-slot mask — bisects where
    # the real search's extra milliseconds live
    kc2 = jax.random.key(99)
    cents = jax.random.normal(kc2, (K_C, D), jnp.float32)
    ids_dev = jnp.arange(SLOTS, dtype=jnp.int32)
    jax.block_until_ready((cents, ids_dev))

    def centroid_stage(cents_arg, ids_arg, queries):
        qc = jnp.einsum(
            "qd,kd->qk", queries.astype(jnp.bfloat16),
            cents_arg.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        _, probe = lax.top_k(qc, P_PROBE)
        id_blocks = ids_arg.reshape(K_C, CAP)
        hit_ids = jnp.take(id_blocks, probe, axis=0)
        return probe, hit_ids

    def full_block_take(corpus_arg, cents_arg, ids_arg, queries):
        q = queries.shape[0]
        probe, hit_ids = centroid_stage(cents_arg, ids_arg, queries)
        blocks = corpus_arg.reshape(K_C, CAP, D)
        rows = jnp.take(blocks, probe, axis=0)
        s = jnp.einsum(
            "qd,qpcd->qpc", queries.astype(jnp.bfloat16), rows,
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(hit_ids >= 0, s, float("-inf")).reshape(
            q, P_PROBE * CAP
        )
        top_s, pos = lax.top_k(s, K)
        return top_s, jnp.take_along_axis(
            hit_ids.reshape(q, P_PROBE * CAP), pos, axis=1
        )

    def full_row_take(corpus_arg, cents_arg, ids_arg, queries):
        q = queries.shape[0]
        probe, hit_ids = centroid_stage(cents_arg, ids_arg, queries)
        slots = (
            probe[:, :, None] * CAP + lax.iota(jnp.int32, CAP)[None, None, :]
        ).reshape(q, P_PROBE * CAP)
        rows = jnp.take(corpus_arg, slots, axis=0)
        s = jnp.einsum(
            "qd,qnd->qn", queries.astype(jnp.bfloat16), rows,
            preferred_element_type=jnp.float32,
        )
        hit_flat = hit_ids.reshape(q, P_PROBE * CAP)
        s = jnp.where(hit_flat >= 0, s, float("-inf"))
        top_s, pos = lax.top_k(s, K)
        return top_s, jnp.take_along_axis(hit_flat, pos, axis=1)

    def centroid_only(corpus_arg, cents_arg, ids_arg, queries):
        probe, hit_ids = centroid_stage(cents_arg, ids_arg, queries)
        return hit_ids[:, :, 0].astype(jnp.float32), probe

    variants = [
        ("block-take (current)", variant_block_take),
        ("row-take", variant_row_take),
        ("one-hot matmul", variant_onehot),
        ("slice-scan", variant_slice_scan),
    ]
    full_variants = [
        ("FULL block-take (cur)", full_block_take),
        ("FULL row-take", full_row_take),
        ("centroid stage only", centroid_only),
    ]

    for q_n in _args.q:
        reps = _args.reps or (4 if q_n >= 64 else 32)
        kq, kp = jax.random.split(jax.random.key(q_n))
        queries = jax.random.normal(kq, (q_n, D), jnp.float32)
        probe = jax.random.randint(kp, (q_n, P_PROBE), 0, K_C, jnp.int32)
        jax.block_until_ready((queries, probe))
        print(
            f"  Q={q_n} (gather {q_n * P_PROBE * CAP * D * 2 / 1e6:.0f} MB, "
            f"reps={reps}):",
            flush=True,
        )
        ref = None
        for name, fn in variants:
            if name == "one-hot matmul" and q_n * P_PROBE * K_C * CAP * D \
                    * 2 > 6e12:
                print(f"    {name:22} skipped (>3 TFLOP)", flush=True)
                continue

            def loop(c, pr, qs, fn=fn):
                def body(i, carry):
                    s, _ = fn(c, pr, qs + carry * 0.0)
                    return carry + s[0, 0] * 1e-20
                return lax.fori_loop(0, reps, body, jnp.float32(0.0))

            loop_fn = jax.jit(loop)
            try:
                float(loop_fn(corpus, probe, queries))
            except Exception as e:  # OOM etc. — record, keep sweeping
                print(f"    {name:22} failed: {type(e).__name__}", flush=True)
                continue
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(loop_fn(corpus, probe, queries))
                best = min(best, (time.perf_counter() - t0) / reps)
            out = jax.jit(fn)(corpus, probe, queries)
            s_i = (np.asarray(out[0]), np.asarray(out[1]))
            if ref is None:
                ref = s_i
                match = "ref"
            else:
                match = (
                    "ids=" if np.array_equal(ref[1], s_i[1]) else "IDS DIFFER"
                )
            print(
                f"    {name:22} {best*1e3:8.2f} ms  "
                f"({q_n * P_PROBE * CAP * D * 2 / best / 1e9:6.1f} GB/s)  "
                f"{match}",
                flush=True,
            )

        # full-path clones: probe ids computed IN-JIT from the centroid
        # stage (different ids than the random-probe variants above, so
        # they compare only against each other)
        fref = None
        for name, fn in full_variants:

            def loop(c, ce, ids, qs, fn=fn):
                def body(i, carry):
                    s, _ = fn(c, ce, ids, qs + carry * 0.0)
                    return carry + s[0, 0] * 1e-20
                return lax.fori_loop(0, reps, body, jnp.float32(0.0))

            loop_fn = jax.jit(loop)
            try:
                float(loop_fn(corpus, cents, ids_dev, queries))
            except Exception as e:
                print(f"    {name:22} failed: {type(e).__name__}", flush=True)
                continue
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(loop_fn(corpus, cents, ids_dev, queries))
                best = min(best, (time.perf_counter() - t0) / reps)
            out = jax.jit(fn)(corpus, cents, ids_dev, queries)
            ids_out = np.asarray(out[1])
            if fref is None:
                fref, match = ids_out, "ref"
            elif ids_out.shape == fref.shape:
                match = (
                    "ids=" if np.array_equal(fref, ids_out) else "IDS DIFFER"
                )
            else:
                match = "-"
            print(f"    {name:22} {best*1e3:8.2f} ms  {match}", flush=True)


if __name__ == "__main__":
    main()
