"""Probe: can lax.approx_max_k serve as the exact-top-k prefilter?

Needs (a) candidate coverage of the true top-k to be ~always complete (else
the whole-batch fallback fires and we lose), (b) to beat the blockmax
prefilter's 48ms at [4096, 100k] k=100. Prints coverage and amortized time
for several (k_cand, recall_target) points.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

Q, N, K = 4096, 100_000, 100
rng = np.random.RandomState(0)
scores_np = rng.randn(Q, N).astype(np.float32)
scores = jax.device_put(jnp.asarray(scores_np))

# exact reference (host)
exact_idx = np.argsort(-scores_np, axis=1, kind="stable")[:, :K]

def timed(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    # amortize tunnel dispatch: loop inside jit
    @jax.jit
    def loop(s):
        def body(i, carry):
            r = fn(s + carry * 0.0)
            return carry + r[0][0, 0] * 1e-20
        return jax.lax.fori_loop(0, 8, body, jnp.float32(0))
    loop(scores).block_until_ready()
    t0 = time.perf_counter()
    loop(scores).block_until_ready()
    dt = (time.perf_counter() - t0) / 8
    return out, dt

for k_cand in (128, 192, 256, 512):
    for rt in (0.95, 0.99):
        fn = jax.jit(lambda s, kc=k_cand, r=rt: jax.lax.approx_max_k(
            s, kc, recall_target=r, aggregate_to_topk=True))
        (cs, ci), dt = timed(fn, scores)
        ci_np = np.asarray(ci)
        # coverage: every true top-K index present among candidates, per row
        covered = 0
        for q in range(0, Q, 16):  # sample rows for speed
            covered += int(set(exact_idx[q]).issubset(set(ci_np[q])))
        n_rows = len(range(0, Q, 16))
        print(f"k_cand={k_cand} recall={rt}: {dt*1e3:.1f} ms, "
              f"rows fully covered {covered}/{n_rows}", flush=True)

# baseline: the blockmax prefilter and plain sort on the same scores
from rankpo_tpu.ops.topk import exact_topk_blockmax
(_, _), dt = timed(jax.jit(lambda s: exact_topk_blockmax(s, K)), scores)
print(f"blockmax exact: {dt*1e3:.1f} ms", flush=True)
(_, _), dt = timed(jax.jit(lambda s: jax.lax.top_k(s, K)), scores)
print(f"plain top_k: {dt*1e3:.1f} ms", flush=True)
