"""int4 (nibble-packed) corpus storage: recall + speed feasibility probe.

int8 storage already serves 1M passages from 1 GB at recall 0.984 vs the
fp32 oracle. A 4-bit tier would halve that again (~0.5 GB/M at d1024,
~60M passages per v5e-8 pod) IF the recall survives: symmetric per-row
4-bit codes have ~8x the element error of int8 (15 levels vs 255).

Scheme probed: per-row max-abs symmetric quantization to [-7, 7], two
codes packed per int8 byte ([N, D/2] storage), unpacked inside jit with
shifts and dequantized into the bf16 matmul (same fusion contract as the
int8 path). Measures top-100 recall vs the fp32 oracle and engine QPS at
[1024 x 1M x d1024], exact selection and recall_target 0.95.

Run on the real chip: python -u benchmarks/int4_recall_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from rankpo_tpu.ops.topk import exact_topk_blockmax

N, D, Q, K = 1_000_000, 1024, 1024, 100


def pack_int4(c):
    """fp32 [N, D] -> (uint8 [N, D//2] packed codes, fp32 [N] scales).

    Codes are offset-binary nibbles: stored = clip(round(x/scale), -7, 7) + 8
    in [1, 15]; 0 is unused (keeps the offset trick simple)."""
    scale = jnp.maximum(jnp.max(jnp.abs(c), axis=1) / 7.0, 1e-12)
    q = jnp.clip(jnp.round(c / scale[:, None]), -7, 7).astype(jnp.int32) + 8
    lo = q[:, 0::2]
    hi = q[:, 1::2]
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return packed, scale.astype(jnp.float32)


def unpack_int4(packed):
    """uint8 [N, D//2] -> bf16 [N, D] with the +8 offset removed."""
    p = packed.astype(jnp.int32)
    lo = (p & 0xF) - 8
    hi = ((p >> 4) & 0xF) - 8
    n, half = packed.shape
    out = jnp.stack([lo, hi], axis=-1).reshape(n, half * 2)
    return out.astype(jnp.bfloat16)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.key(0)

    def gen(k, n, d):
        x = jax.random.normal(k, (n, d), jnp.float32)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    kc, kq = jax.random.split(key)
    c_dev = jax.jit(gen, static_argnums=(1, 2))(kc, N, D)
    q_dev = jax.jit(gen, static_argnums=(1, 2))(kq, Q, D)
    jax.block_until_ready(c_dev)

    # fp32 oracle (blockmax exact on fp32-faithful scores)
    def oracle(q, c):
        s = jnp.einsum("qd,nd->qn", q, c, preferred_element_type=jnp.float32,
                       precision="float32")
        return exact_topk_blockmax(s, K)[1]
    ref_i = np.asarray(jax.jit(oracle)(q_dev, c_dev))
    print("  oracle ready", flush=True)

    packed, scale = jax.jit(pack_int4)(c_dev)
    jax.block_until_ready(packed)
    bytes_total = packed.size + scale.size * 4
    print(f"  int4 storage: {bytes_total/1e9:.2f} GB (fp32: 4.10 GB)",
          flush=True)
    del c_dev

    def search(q, p, s, rt):
        c = unpack_int4(p)
        scores = jnp.einsum(
            "qd,nd->qn", q.astype(jnp.bfloat16), c,
            preferred_element_type=jnp.float32,
        ) * s[None, :]
        if rt < 1.0:
            out = jax.lax.approx_max_k(scores, K, recall_target=rt,
                                       aggregate_to_topk=True)
        else:
            out = exact_topk_blockmax(scores, K)
        return out

    REPS = 4
    for rt in (1.0, 0.95):
        fn = jax.jit(lambda q, p, s, rt=rt: search(q, p, s, rt))
        idx = np.asarray(fn(q_dev, packed, scale)[1])
        recall = float(np.mean([
            len(set(idx[r].tolist()) & set(ref_i[r].tolist())) / K
            for r in range(Q)
        ]))

        def loop(q, p, s, fn=fn):
            def body(i, carry):
                out = fn(q + carry * 0.0, p, s)
                return carry + out[0][0, 0].astype(jnp.float32) * 1e-20
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        loop_fn = jax.jit(loop)
        float(loop_fn(q_dev, packed, scale))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(loop_fn(q_dev, packed, scale))
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(f"  int4 rt={rt}: {best*1e3:7.1f} ms -> {Q/best:7.0f} QPS  "
              f"recall={recall:.4f}", flush=True)


if __name__ == "__main__":
    main()
