"""A/B the Pallas probed-cluster score kernel vs the XLA row-take path.

The XLA row-take gather+rerank (adopted after benchmarks/gather_probe.py)
reaches ~110 GB/s; the Pallas kernel (ops/ivf_gather_pallas.py) streams
the same blocks through double-buffered DMA, which should approach the
HBM line rate. Parity is asserted against the XLA einsum before timing.

Run: ``python benchmarks/ivf_pallas_probe.py --q 8 256``.
CPU smoke: interpret mode is too slow at real shapes — use tiny ones
(``--clusters 64 --capacity 32 --d 256 --q 4 --p 2 --interpret``).
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
parser.add_argument("--clusters", type=int, default=4096)
parser.add_argument("--capacity", type=int, default=320)
parser.add_argument("--d", type=int, default=1024)
parser.add_argument("--q", type=int, nargs="+", default=[8, 256])
parser.add_argument("--p", type=int, default=8)
parser.add_argument("--interpret", action="store_true")
_args = parser.parse_args()

K_C, CAP, D, P_PROBE = _args.clusters, _args.capacity, _args.d, _args.p
SLOTS = K_C * CAP


def main():
    from rankpo_tpu.ops import ivf_gather_pallas as igp

    if _args.interpret:
        import functools
        from jax.experimental import pallas as pl

        orig = pl.pallas_call
        pl.pallas_call = functools.partial(orig, interpret=True)

    print(
        f"backend={jax.default_backend()} slots={SLOTS} (K_c={K_C} x "
        f"cap={CAP}) D={D} p={P_PROBE} bf16",
        flush=True,
    )
    corpus = jax.jit(
        lambda k: jax.random.normal(k, (SLOTS, D), jnp.bfloat16)
    )(jax.random.key(0))
    jax.block_until_ready(corpus)

    def xla_scores(c, probe, queries):
        q = queries.shape[0]
        slots = (
            probe[:, :, None] * CAP + lax.iota(jnp.int32, CAP)[None, None, :]
        ).reshape(q, P_PROBE * CAP)
        rows = jnp.take(c, slots, axis=0)
        return jnp.einsum(
            "qd,qnd->qn", queries.astype(jnp.bfloat16), rows,
            preferred_element_type=jnp.float32,
        ).reshape(q, P_PROBE, CAP)

    def pallas_scores(c, probe, queries):
        return igp.probe_scores(c, probe, queries, cap=CAP)

    for q_n in _args.q:
        reps = 4 if q_n >= 64 else 32
        kq, kp = jax.random.split(jax.random.key(q_n))
        queries = jax.random.normal(kq, (q_n, D), jnp.float32)
        probe = jax.random.randint(kp, (q_n, P_PROBE), 0, K_C, jnp.int32)
        jax.block_until_ready((queries, probe))

        ref = np.asarray(jax.jit(xla_scores)(corpus, probe, queries))
        got = np.asarray(pallas_scores(corpus, probe, queries))
        # measured vs an exact numpy oracle at these shapes: the KERNEL is
        # exact to 2.3e-5 while the XLA batched-matvec einsum itself
        # carries ~0.22 abs error (bf16 intermediate reductions in the
        # qd,qnd->qn lowering) — so this gate only bounds the difference
        # by XLA's own error envelope
        np.testing.assert_allclose(got, ref, atol=0.5, rtol=0.05)
        print(f"  Q={q_n}: parity OK within XLA's own accum envelope "
              f"(max diff {np.abs(got - ref).max():.2e})", flush=True)

        gb = q_n * P_PROBE * CAP * D * 2 / 1e9
        for name, fn in (("xla row-take", xla_scores),
                         ("pallas dma", pallas_scores)):

            def loop(c, pr, qs, fn=fn):
                def body(i, carry):
                    s = fn(c, pr, qs + carry * 0.0)
                    return carry + s[0, 0, 0] * 1e-20
                return lax.fori_loop(0, reps, body, jnp.float32(0.0))

            loop_fn = jax.jit(loop)
            float(loop_fn(corpus, probe, queries))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(loop_fn(corpus, probe, queries))
                best = min(best, (time.perf_counter() - t0) / reps)
            print(
                f"    {name:14} {best*1e3:8.2f} ms  "
                f"({gb / best:6.1f} GB/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
