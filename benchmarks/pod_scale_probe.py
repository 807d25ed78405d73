"""Pod-scale corpus probe: top-k QPS at multi-million keys on ONE v5e chip.

BASELINE.json's pod-serving regime is multi-million passages on a v5e-32
pod. This probe measures the single-chip building block at pod-scale corpus
sizes — far beyond bench.py's 1M row — bounded only by HBM:

  - 10M keys, int8 storage (10 GB of 16 GB HBM) — a v5e-32 pod at this
    density holds 320M keys.
  - 2M keys, exact fp32 storage (8 GB) — the largest exact-fp32 corpus one
    chip fits with the engine's 4 GB score budget.

The fp32 corpus at 10M (40 GB) cannot exist on the chip, so the corpus is
generated CHUNK-WISE on device: each fp32 chunk is scored against the probe
queries at full fp32 precision (the host oracle), quantized to int8, and
written into a preallocated donated [N, D] int8 buffer — the fp32 chunk
never accumulates. The host argsort of the collected probe scores is the
FAISS-IndexFlatIP-semantics oracle (lowest-index ties); int8 results are
gated on measured recall against it, exact-fp32 results on exactness
(near-tie tolerance as in bench.py).

Timing follows CLAUDE.md: REPS dispatches inside one jit via fori_loop with
a data-dependent carry, synchronized on a scalar fetch.

Run on the real chip:  python benchmarks/pod_scale_probe.py
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 100
PROBE = 4  # host-oracle queries (PROBE x N fp32 scores fetched chunk-wise)


def _engine_seconds(jitted_loop, args, reps, iters=3):
    float(jitted_loop(*args))  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jitted_loop(*args))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def _build_corpus(n, d, chunk, quantize: bool, q_probe):
    """Chunked on-device corpus build. Returns (corpus_dev, row_scale_dev or
    None, probe_scores_host [PROBE, n] fp32)."""
    import jax
    import jax.numpy as jnp

    out_dtype = jnp.int8 if quantize else jnp.float32

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fill(buf, scale_buf, key, lo, probe_q):
        x = jax.random.normal(key, (chunk, d), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        # oracle scores for this chunk at true fp32 precision
        ps = jnp.einsum(
            "qd,nd->qn", probe_q, x,
            preferred_element_type=jnp.float32, precision="float32",
        )
        if quantize:
            s = jnp.maximum(jnp.max(jnp.abs(x), axis=1) / 127.0, 1e-12)
            rows = jnp.clip(jnp.round(x / s[:, None]), -127, 127).astype(
                jnp.int8
            )
            scale_buf = jax.lax.dynamic_update_slice(
                scale_buf, s.astype(jnp.float32), (lo,)
            )
        else:
            rows = x
        buf = jax.lax.dynamic_update_slice(buf, rows, (lo, 0))
        return buf, scale_buf, ps

    buf = jnp.zeros((n, d), out_dtype)
    scale_buf = jnp.zeros((n,), jnp.float32)
    probe_scores = np.empty((PROBE, n), np.float32)
    key = jax.random.key(11)
    for lo in range(0, n, chunk):
        key, sub = jax.random.split(key)
        buf, scale_buf, ps = fill(
            buf, scale_buf, sub, jnp.int32(lo), q_probe
        )
        probe_scores[:, lo : lo + chunk] = np.asarray(ps)
    jax.block_until_ready(buf)
    return buf, (scale_buf if quantize else None), probe_scores


def _measure(n, d, q_batch, chunk, quantize, reps):
    import jax
    import jax.numpy as jnp

    from rankpo_tpu.ops.topk import matmul_topk

    kq = jax.random.key(3)
    q = jax.random.normal(kq, (q_batch, d), jnp.float32)
    q_dev = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    jax.block_until_ready(q_dev)

    corpus, row_scale, probe_scores = _build_corpus(
        n, d, chunk, quantize, q_dev[:PROBE]
    )
    ref_i = np.argsort(-probe_scores, axis=1, kind="stable")[:, :K]
    ref_s = np.take_along_axis(probe_scores, ref_i, axis=1)
    del probe_scores

    if quantize:
        def search(qq, c, scale):
            return matmul_topk(qq.astype(jnp.bfloat16), c, k=K,
                               col_scale=scale)

        s, i = jax.device_get(
            jax.jit(search)(q_dev[:PROBE], corpus, row_scale)
        )
        recall = float(np.mean([
            len(set(i[r].tolist()) & set(ref_i[r].tolist())) / K
            for r in range(PROBE)
        ]))

        @jax.jit
        def loop(c, scale, qq):
            def body(_, carry):
                s, _i = search(qq + carry * 0.0, c, scale)
                return carry + s[0, 0] * 1e-20
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        dt = _engine_seconds(loop, (corpus, row_scale, q_dev), reps)
        return q_batch / dt, recall
    else:
        exact = jax.jit(lambda qq, c: matmul_topk(qq, c, k=K))
        s, i = jax.device_get(exact(q_dev, corpus))
        s, i = s[:PROBE], i[:PROBE]
        mismatch = i != ref_i
        n_bad = int(mismatch.sum())
        if n_bad > PROBE * K // 100 or not np.allclose(
            s[mismatch], ref_s[mismatch], atol=2e-5
        ):
            raise AssertionError(
                f"exact top-k diverges from the fp32 oracle beyond near-tie "
                f"noise ({n_bad}/{PROBE * K})"
            )

        @jax.jit
        def loop(c, qq):
            def body(_, carry):
                s, _i = matmul_topk(qq + carry * 0.0, c, k=K)
                return carry + s[0, 0] * 1e-20
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        dt = _engine_seconds(loop, (corpus, q_dev), reps)
        return q_batch / dt, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=500_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip_exact_2m", action="store_true")
    ap.add_argument("--n_exact", type=int, default=2_000_000)
    ap.add_argument("--n_int8", type=int, default=10_000_000)
    args = ap.parse_args()

    import jax

    print(f"backend={jax.default_backend()}", flush=True)

    if not args.skip_exact_2m:
        t0 = time.time()
        qps, _ = _measure(args.n_exact, args.d, args.q, args.chunk,
                          quantize=False, reps=args.reps)
        print(f"exact_fp32 n={args.n_exact / 1e6:g}M d={args.d} k={K}: "
              f"{qps:,.0f} QPS "
              f"(oracle-gated; total {time.time() - t0:.0f}s)", flush=True)

    t0 = time.time()
    qps, recall = _measure(args.n_int8, args.d, args.q, args.chunk,
                           quantize=True, reps=args.reps)
    print(f"int8 n={args.n_int8 / 1e6:g}M d={args.d} k={K}: {qps:,.0f} QPS "
          f"recall@100={recall:.4f} vs fp32 oracle "
          f"(total {time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
