"""Fused Pallas matmul+top-k: measured decision record + gate.

BASELINE.json names a "fused Pallas dot → running top-k kernel" as the index
engine's compute core. We implemented and profiled the alternatives on a real
v5e before committing to a kernel, and the data says XLA already sits at the
hardware limit for this op:

  [Q=1024, N=100k, D=1024, k=100] on v5e —
    score matmul alone (fp32):                  4.9 ms   (near fp32 MXU peak)
    dense matmul + lax.top_k (exact):          37.0 ms
    dense + lax.approx_max_k(recall=0.95):      4.5 ms   ← matmul-bound
    dense + lax.approx_max_k(recall=1.0):      37.0 ms   (degenerates to sort)
    hierarchical per-block top_k + merge:     47-183 ms  (slower: extra sorts)
    lax.scan streaming block merge:            ~4x dense (sequential dispatch)

  - At recall<1.0 the TPU's PartialReduce hardware path (what approx_max_k
    lowers to) makes top-k FREE relative to the matmul — a Pallas kernel
    cannot beat matmul-bound.
  - For EXACT top-k the cost is the sort; Mosaic does not lower a sort/top_k
    primitive (verified: "Unimplemented primitive in Pallas TPU lowering:
    top_k"), so a Pallas kernel would need a hand-rolled O(log²) bitonic
    network on the VPU — strictly more VPU work than XLA's tuned sort that
    already overlaps the MXU matmul.

Conclusion: the engine stays on the XLA path (rankpo_tpu/ops/topk.py: dense
matmul under a score-matrix memory budget, python-unrolled budget-sized
chunks merged pairwise above it, exact top-k via the two-pass block-max
prefilter ``exact_topk_blockmax``, plus the ``recall_target`` serving knob).
This module is the decision record only — if a future Mosaic release adds a
sort/top_k primitive, a fused kernel belongs behind matmul_topk's existing
signature in ops/topk.py.
"""
