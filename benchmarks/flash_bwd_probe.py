"""Flash backward tuning probe (VERDICT r3 item: the bwd gap).

Measured state (docs/BENCHMARKS.md): fwd 6.3 ms, fwd+bwd 15.2 ms at
B4/S4096/H16-KV8/D128 causal — bwd ≈ 8.9 ms for ~3.5x the fwd tile-matmuls
(dq pass 3 + dkv pass 4 vs fwd 2). Candidates probed here:

  1. (q_block, k_block) retune for the two bwd kernels separately — the fwd
     optimum (512/1024) need not be the bwd one (dq iterates k blocks with 3
     matmuls/tile; dkv iterates q blocks with 4).
  2. the fused one-pass bwd (--fused; ops/flash_attention.py
     bwd_impl='fused'): dq accumulated in VMEM across k-block grid steps, s
     and dp computed ONCE per tile (5 matmuls instead of 7).

Timing follows CLAUDE.md rules: lax.fori_loop with data-dependent carry
inside one jit, scalar fetch, divide by reps.

Run: python benchmarks/flash_bwd_probe.py [--sweep] [--fused]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rankpo_tpu.ops.flash_attention import flash_attention

B, S, HQ, HKV, D = 4, 4096, 16, 8, 128
REPS = 8


def timed(fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, carry):
            out = fn(*a, carry)
            return jnp.sum(out.astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    float(loop(*args))  # compile
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


def full_bwd_time(q, k, v, mask, *, causal=True, skip_pad_q=False, **kw):
    """grad wrt q, k AND v — the training shape (dq + dkv both run).
    The data-dependent carry stays in q.dtype (a fp32 carry would promote q
    and hand the kernels fp32 inputs — VMEM blowup, not the trained shape)."""
    def fn(q_, k_, v_, carry):
        def f(qq, kk, vv):
            return jnp.sum(
                flash_attention(qq, kk, vv, mask=mask, causal=causal,
                                skip_pad_q=skip_pad_q, **kw)
                .astype(jnp.float32) ** 2
            )
        g = jax.grad(f, argnums=(0, 1, 2))(
            q_ + carry.astype(q_.dtype), k_, v_
        )
        return g[0] + 1e-6 * jnp.sum(g[1]) + 1e-6 * jnp.sum(g[2])
    return timed(fn, q, k, v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true",
                    help="sweep bwd (q_block, k_block)")
    ap.add_argument("--fused", action="store_true",
                    help="probe the fused one-pass bwd vs split")
    args = ap.parse_args()

    print(f"backend={jax.default_backend()} B{B} S{S} H{HQ}/KV{HKV} D{D}",
          flush=True)
    rng = np.random.RandomState(0)
    q = jax.device_put(jnp.asarray(rng.randn(B, S, HQ, D), jnp.bfloat16))
    k = jax.device_put(jnp.asarray(rng.randn(B, S, HKV, D), jnp.bfloat16))
    v = jax.device_put(jnp.asarray(rng.randn(B, S, HKV, D), jnp.bfloat16))
    full = jax.device_put(jnp.ones((B, S), jnp.int32))

    base = full_bwd_time(q, k, v, full)
    print(f"fwd+bwd split q512/k1024 (default): {base*1e3:7.2f} ms", flush=True)

    def try_case(label, **kw):
        try:
            t = full_bwd_time(q, k, v, full, **kw)
            print(f"  {label}: {t*1e3:7.2f} ms", flush=True)
        except Exception as e:  # per-config VMEM OOM must not kill the sweep
            msg = "VMEM OOM" if "vmem" in str(e).lower() else str(e)[:120]
            print(f"  {label}: FAILED ({msg})", flush=True)

    if args.sweep:
        for qb in (256, 512, 1024):
            for kb in (512, 1024, 2048):
                try_case(f"fwd+bwd split q{qb}/k{kb}", q_block=qb, k_block=kb)

    if args.fused:
        for qb in (256, 512):
            for kb in (256, 512, 1024):
                try_case(f"fwd+bwd FUSED q{qb}/k{kb}", q_block=qb,
                         k_block=kb, bwd_impl="fused")


if __name__ == "__main__":
    main()
