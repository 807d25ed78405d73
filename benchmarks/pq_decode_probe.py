"""PQ probed-row scoring formulations (the IVF+PQ search hot path).

Measured on TPU: scoring probed PQ codes via reconstruct-then-rerank
(``_pq_reconstruct``: a flat ``jnp.take`` of Q*p*cap*m ds-wide codebook
vectors) runs ~8.6x slower than plain-IVF's full-row gather at 1M/Q=256 —
the element-granularity gather hits the same few-GB/s wall as the block
gather (benchmarks/gather_probe.py). Decode is only ~344 GFLOP of
codebook-matmul work at that shape, so an MXU formulation should win.

Variants (identical (scores, ids) outputs):

  A take-reconstruct   current: flat take -> [.., D] bf16 rows -> einsum
  B lut-gather         per-query LUT [Q, m, 256] (tiny einsum), then a
                       take_along_axis of Q*p*cap*m scalars
  C onehot-matmul      decode per chunk AS A MATMUL: one_hot(codes) [r, m,
                       256] bf16 einsum codebooks -> rows; one-hot transient
                       bounded by the chunk size; all FLOPs land on the MXU
  D pallas-adc         fused kernel (ops/pq_adc_pallas.py): per-query LUT
                       in VMEM, probed code blocks streamed HBM -> VMEM,
                       one-hot mask+reduce never touches HBM (TPU only)

Run: ``python benchmarks/pq_decode_probe.py --q 8 256``.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

parser = argparse.ArgumentParser()
parser.add_argument("--clusters", type=int, default=4096)
parser.add_argument("--capacity", type=int, default=320)
parser.add_argument("--d", type=int, default=1024)
parser.add_argument("--m", type=int, default=64)
parser.add_argument("--q", type=int, nargs="+", default=[8, 256])
parser.add_argument("--p", type=int, default=8)
parser.add_argument("--k", type=int, default=100)
parser.add_argument("--chunk", type=int, default=16384,
                    help="one-hot decode chunk (rows); transient is "
                    "chunk*m*256*2B")
_args = parser.parse_args()

K_C, CAP, D, M, P_PROBE, K = (
    _args.clusters, _args.capacity, _args.d, _args.m, _args.p, _args.k
)
DS = D // M
SLOTS = K_C * CAP


def main():
    print(
        f"backend={jax.default_backend()} slots={SLOTS} D={D} m={M} ds={DS} "
        f"p={P_PROBE} k={K}",
        flush=True,
    )

    @jax.jit
    def gen(key):
        kc, kb = jax.random.split(key)
        codes = jax.random.randint(kc, (SLOTS, M), 0, 256, jnp.int32).astype(
            jnp.uint8
        )
        cb = jax.random.normal(kb, (M, 256, DS), jnp.float32)
        return codes, cb.astype(jnp.bfloat16)

    codes, cb = gen(jax.random.key(0))
    cb_flat = jax.jit(lambda c: c.reshape(M * 256, DS))(cb)
    jax.block_until_ready((codes, cb_flat))

    def topk(s, q):
        return lax.top_k(s.reshape(q, P_PROBE * CAP), K)

    def gather_codes(codes_arg, probe):
        blocks = codes_arg.reshape(K_C, CAP, M)
        return jnp.take(blocks, probe, axis=0)  # [q, p, cap, m]

    def variant_take(codes_arg, cbf, cbm, probe, queries):
        q = queries.shape[0]
        cg = gather_codes(codes_arg, probe)
        flat = cg.astype(jnp.int32) + lax.iota(jnp.int32, M) * 256
        rows = jnp.take(cbf, flat, axis=0).reshape(
            q, P_PROBE, CAP, D
        )
        s = jnp.einsum(
            "qd,qpcd->qpc", queries.astype(jnp.bfloat16), rows,
            preferred_element_type=jnp.float32,
        )
        return topk(s, q)

    def variant_lut(codes_arg, cbf, cbm, probe, queries):
        q = queries.shape[0]
        cg = gather_codes(codes_arg, probe)
        q_sub = queries.reshape(q, M, DS).astype(jnp.bfloat16)
        lut = jnp.einsum(
            "qmd,mkd->qmk", q_sub, cbm, preferred_element_type=jnp.float32
        )  # [q, m, 256]
        lut_flat = lut.reshape(q, M * 256)
        idx = (
            cg.astype(jnp.int32) + lax.iota(jnp.int32, M) * 256
        ).reshape(q, P_PROBE * CAP * M)
        parts = jnp.take_along_axis(lut_flat, idx, axis=1)
        s = parts.reshape(q, P_PROBE * CAP, M).sum(-1)
        return lax.top_k(s, K)

    def variant_onehot(codes_arg, cbf, cbm, probe, queries):
        q = queries.shape[0]
        cg = gather_codes(codes_arg, probe).reshape(q * P_PROBE * CAP, M)
        rows_n = q * P_PROBE * CAP
        chunk = min(rows_n, _args.chunk)
        n_chunks = -(-rows_n // chunk)

        def body(ci, out):
            start = jnp.minimum(ci * chunk, rows_n - chunk)
            blk = lax.dynamic_slice_in_dim(cg, start, chunk)
            onehot = jax.nn.one_hot(blk, 256, dtype=jnp.bfloat16)
            rows = jnp.einsum(
                "rmk,mkd->rmd", onehot, cbm,
                preferred_element_type=jnp.bfloat16,
            ).reshape(chunk, D)
            return lax.dynamic_update_slice_in_dim(out, rows, start, axis=0)

        rows = lax.fori_loop(
            0, n_chunks, body, jnp.zeros((rows_n, D), jnp.bfloat16)
        ).reshape(q, P_PROBE, CAP, D)
        s = jnp.einsum(
            "qd,qpcd->qpc", queries.astype(jnp.bfloat16), rows,
            preferred_element_type=jnp.float32,
        )
        return topk(s, q)

    def variant_pallas(codes_arg, cbf, cbm, probe, queries, mxu=False):
        from rankpo_tpu.ops.pq_adc_pallas import pq_probe_scores

        q = queries.shape[0]
        q_sub = queries.reshape(q, M, DS).astype(jnp.bfloat16)
        lut = jnp.einsum(
            "qmd,mkd->qmk", q_sub, cbm, preferred_element_type=jnp.float32
        )
        s = pq_probe_scores(codes_arg, probe, lut, cap=CAP, mxu=mxu)
        return topk(s.reshape(q, P_PROBE, CAP), q)

    def variant_pallas_t(codes_t_arg, cbf, cbm, probe, queries,
                         via_transpose=False):
        from rankpo_tpu.ops.pq_adc_pallas import pq_probe_scores_t

        q = queries.shape[0]
        q_sub = queries.reshape(q, M, DS).astype(jnp.bfloat16)
        lut = jnp.einsum(
            "qmd,mkd->qmk", q_sub, cbm, preferred_element_type=jnp.float32
        )
        s = pq_probe_scores_t(codes_t_arg, probe, lut, cap=CAP,
                              via_transpose=via_transpose)
        return topk(s.reshape(q, P_PROBE, CAP), q)

    variants = [
        ("take-reconstruct (cur)", variant_take),
        ("lut-gather", variant_lut),
        ("onehot-matmul decode", variant_onehot),
    ]
    codes_t = None
    if jax.default_backend() == "tpu":
        variants.append(("pallas-adc fused", variant_pallas))
        variants.append((
            "pallas-adc mxu-reduce",
            functools.partial(variant_pallas, mxu=True),
        ))
        if CAP % 128 == 0 and M % 32 == 0:
            # transposed [m, slots] layout (pq_layout='cols'); needs a
            # x128 capacity — run with e.g. --capacity 384 to compare
            codes_t = jax.jit(lambda c: c.T)(codes)
            jax.block_until_ready(codes_t)
            variants.append((
                "pallas-adc-T native",
                functools.partial(variant_pallas_t, via_transpose=False),
            ))
            variants.append((
                "pallas-adc-T via-transp",
                functools.partial(variant_pallas_t, via_transpose=True),
            ))

    for q_n in _args.q:
        reps = 4 if q_n >= 64 else 32
        kq, kp = jax.random.split(jax.random.key(q_n))
        queries = jax.random.normal(kq, (q_n, D), jnp.float32)
        probe = jax.random.randint(kp, (q_n, P_PROBE), 0, K_C, jnp.int32)
        jax.block_until_ready((queries, probe))
        decode_gflop = q_n * P_PROBE * CAP * M * 256 * DS * 2 / 1e9
        print(
            f"  Q={q_n} (decode-as-matmul would be {decode_gflop:.0f} "
            f"GFLOP, reps={reps}):",
            flush=True,
        )
        ref = None
        for name, fn in variants:
            codes_arg = codes_t if name.startswith("pallas-adc-T") else codes

            def loop(c, f, b, pr, qs, fn=fn):
                def body(i, carry):
                    s, _ = fn(c, f, b, pr, qs + carry * 0.0)
                    return carry + s[0, 0] * 1e-20
                return lax.fori_loop(0, reps, body, jnp.float32(0.0))

            loop_fn = jax.jit(loop)
            try:
                float(loop_fn(codes_arg, cb_flat, cb, probe, queries))
            except Exception as e:
                print(f"    {name:24} failed: {type(e).__name__}", flush=True)
                continue
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(loop_fn(codes_arg, cb_flat, cb, probe, queries))
                best = min(best, (time.perf_counter() - t0) / reps)
            out = jax.jit(fn)(codes_arg, cb_flat, cb, probe, queries)
            ids = np.asarray(out[1])
            if ref is None:
                ref, match = ids, "ref"
            else:
                # lut sums in a different order than the D-wide einsum;
                # near-ties may swap — report overlap instead of equality
                ov = np.mean([
                    len(set(ids[r].tolist()) & set(ref[r].tolist())) / K
                    for r in range(q_n)
                ])
                match = f"overlap={ov:.3f}"
            print(f"    {name:24} {best*1e3:8.2f} ms  {match}", flush=True)


if __name__ == "__main__":
    main()
