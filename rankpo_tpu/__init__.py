"""rankpo_tpu — a TPU-native (JAX/XLA/Pallas) framework for two-stage dense-retrieval
training (contrastive learning + RankPO preference optimization), brute-force retrieval
evaluation, and hard-negative mining.

Re-designed TPU-first from the capability spec of the RankPO reference implementation
(yflyzhang/RankPO): functional jit-compiled train steps over a `jax.sharding.Mesh`,
differentiable XLA collectives for cross-device negatives, and a sharded HBM
matmul+top-k index engine in place of FAISS.
"""

__version__ = "0.1.0"
