"""Two-level (hierarchical) blockmax probe for large-N exact top-k.

At [1024 x 1M] the single-level engine's cost is dominated by the
block-selection ``lax.top_k`` over the [Q, N/32 ~= 31k]-wide block-max
matrix (~33 ms of the 98 ms fp32-exact dispatch). Hypothesis: select
top superblocks (groups of 32 blocks) first — a [Q, ~1k]-wide sort —
then select blocks only within those superblocks ([Q, ~3.7k]-wide),
keeping the same provable-coverage + verified-exactness structure:

  * every superblock containing a true top-k column has max >= theta_k,
    and at most k can, so top-(k+slack) superblocks cover the top-k;
  * exactness check extends to both levels: all superblocks with
    max >= theta selected AND all blocks within selected superblocks
    with max >= theta selected; otherwise full-sort fallback.

Run on the real chip: python benchmarks/hier_blockmax_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rankpo_tpu.ops import topk as topk_mod

BLOCK = 32
GROUP = 32  # blocks per superblock
SLACK = topk_mod.BLOCKMAX_SLACK


def hier_topk(scores, k):
    """Two-level blockmax exact top-k (probe version; mirrors
    exact_topk_blockmax's contract incl. FAISS tie order + fallback)."""
    q, n = scores.shape
    c = k + SLACK
    b_full = n // BLOCK
    c = min(b_full, c)
    tail = n - b_full * BLOCK

    main = scores[:, : b_full * BLOCK].reshape(q, b_full, BLOCK)
    m = jnp.max(main, axis=-1)  # [Q, B]

    # pad B up to a multiple of GROUP with -inf so trailing blocks live in a
    # (partially padded) final superblock
    s_full = -(-b_full // GROUP)
    pad = s_full * GROUP - b_full
    m_pad = jnp.pad(m, ((0, 0), (0, pad)), constant_values=topk_mod.NEG_INF)
    sm = jnp.max(m_pad.reshape(q, s_full, GROUP), axis=-1)  # [Q, S]

    cs = min(s_full, c)
    sv, si = jax.lax.top_k(sm, cs)
    si_sorted = jnp.sort(si, axis=1)  # ascending superblock index

    # block maxima within the selected superblocks
    m3 = m_pad.reshape(q, s_full, GROUP)
    m_sel = jax.vmap(lambda g, idx: jnp.take(g, idx, axis=0))(m3, si_sorted)
    m_sel = m_sel.reshape(q, cs * GROUP)
    bid = (
        si_sorted[:, :, None] * GROUP
        + jnp.arange(GROUP, dtype=jnp.int32)[None, None, :]
    ).reshape(q, cs * GROUP)

    bv, bpos = jax.lax.top_k(m_sel, c)
    bi = jnp.take_along_axis(bid, bpos, axis=1)
    bi_sorted = jnp.sort(bi, axis=1)  # ascending global block index
    # padding blocks (id >= b_full) can only be selected in degenerate cases
    # (theta = -inf); clamp for the gather, the exactness check falls back
    bi_gather = jnp.minimum(bi_sorted, b_full - 1)

    cand = jax.vmap(lambda s3, idx: jnp.take(s3, idx, axis=0))(
        main, bi_gather
    ).reshape(q, c * BLOCK)
    cols = (
        bi_gather[:, :, None] * BLOCK
        + jnp.arange(BLOCK, dtype=jnp.int32)[None, None, :]
    ).reshape(q, c * BLOCK)
    if tail:
        cand = jnp.concatenate([cand, scores[:, b_full * BLOCK :]], axis=1)
        tail_cols = jnp.broadcast_to(
            jnp.arange(b_full * BLOCK, n, dtype=jnp.int32)[None, :], (q, tail)
        )
        cols = jnp.concatenate([cols, tail_cols], axis=1)

    top_scores, pos = jax.lax.top_k(cand, k)
    top_idx = jnp.take_along_axis(cols, pos, axis=1)

    theta = top_scores[:, k - 1 : k]
    exact = jnp.all(
        (jnp.sum(sm >= theta, axis=1) == jnp.sum(sv >= theta, axis=1))
        & (jnp.sum(m_sel >= theta, axis=1) == jnp.sum(bv >= theta, axis=1))
    )
    return jax.lax.cond(
        exact,
        lambda _: (top_scores, top_idx),
        lambda s: tuple(jax.lax.top_k(s, k)),
        scores,
    )


def timeit(fn, *args, reps=4, iters=5):
    def loop(*a):
        def body(i, carry):
            out = fn(*(x + carry * 0.0 if x.dtype == jnp.float32 else x
                       for x in a))
            return carry + jnp.sum(out[0][0]) * 1e-20
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    loop_fn = jax.jit(loop)
    float(loop_fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(loop_fn(*args))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.key(0)

    # --- parity check on a moderate shape (exact equality vs single-level)
    sc = jax.random.normal(jax.random.fold_in(key, 9), (256, 200_000), jnp.float32)
    a = jax.jit(lambda s: topk_mod.exact_topk_blockmax(s, 100))(sc)
    b = jax.jit(lambda s: hier_topk(s, 100))(sc)
    ok_s = bool(jnp.all(a[0] == b[0]))
    ok_i = bool(jnp.all(a[1] == b[1]))
    print(f"parity @[256,200k] k=100: scores={ok_s} idx={ok_i}", flush=True)
    del sc, a, b

    # --- selection-only timings (scores pre-generated on device)
    for q, n, k in [
        (1024, 1_000_000, 100),
        (1024, 1_000_000, 10),
        (1024, 500_000, 100),
        (4096, 100_000, 100),
    ]:
        scores = jax.random.normal(jax.random.fold_in(key, n + k), (q, n), jnp.float32)
        t1 = timeit(jax.jit(lambda s: topk_mod.exact_topk_blockmax(s, k)), scores)
        t2 = timeit(jax.jit(lambda s: hier_topk(s, k)), scores)
        print(
            f"select-only [{q},{n}] k={k}: 1-level {t1*1e3:7.1f} ms | "
            f"2-level {t2*1e3:7.1f} ms ({t1/t2:.2f}x)",
            flush=True,
        )
        del scores


if __name__ == "__main__":
    main()
