"""True multi-process distributed inference: 2 JAX processes x 4 CPU devices
form one global 8-device mesh; evaluate_checkpoint must produce metrics and
indices IDENTICAL to a single-process run (the capability the reference only
scaffolds, src/utils.py:165-285 split_between_processes, never wired —
SURVEY.md §2.3 'distributed inference').

Spawned as real subprocesses: jax.distributed.initialize cannot run twice in
one process, and the conftest already initialized a single-process backend.
"""


import pytest

pytestmark = pytest.mark.slow  # see pyproject: fast tier = -m 'not slow'

import json
import os
import socket
import subprocess
import sys


import jax
import jax.numpy as jnp

from rankpo_tpu.data.tokenization import HashTokenizer

_WORKER = r"""
import json, os, sys
sys.path.insert(0, "/root/repo")
pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
model = sys.argv[4]

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4

import jax.numpy as jnp
from rankpo_tpu.core.mesh import MeshConfig, make_mesh
from rankpo_tpu.data.tokenization import HashTokenizer
from rankpo_tpu.eval.evaluator import evaluate_checkpoint

mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
tok = HashTokenizer(vocab_size=256)
queries = [f"job opening about subject {i} methods" for i in range(8)]
labels = [[i] for i in range(8)]
corpus = [f"field {i} research on subject {i} methods" for i in range(40)]
metrics, indices, scores = evaluate_checkpoint(
    model, queries, labels, corpus, tokenizer=tok, mesh=mesh,
    batch_size=16, max_query_length=16, max_passage_length=16,
    k=10, cutoffs=(1, 5, 10), compute_dtype=jnp.float32,
)
# two-stage index across processes: the build itself is collective (sharded
# second-moment reduce + replicated fetch, host PCA, shard placement)
r_metrics, r_indices, _ = evaluate_checkpoint(
    model, queries, labels, corpus, tokenizer=tok, mesh=mesh,
    batch_size=16, max_query_length=16, max_passage_length=16,
    k=10, cutoffs=(1, 5, 10), compute_dtype=jnp.float32,
    index_type="refine", index_recall_target=0.9,
)
# IVF index across processes: k-means is collective (per-shard assignment
# + psum'd centroid updates), the assignment fetch is replicated, and the
# host greedy fill is deterministic. Full probe (nprobe = n_clusters)
# makes hit SETS layout-independent, so they must match single-process
# exactly even if collective-reduction bit noise nudges the k-means.
i_metrics, i_indices, _ = evaluate_checkpoint(
    model, queries, labels, corpus, tokenizer=tok, mesh=mesh,
    batch_size=16, max_query_length=16, max_passage_length=16,
    k=10, cutoffs=(1, 5, 10), compute_dtype=jnp.float32,
    index_type="ivf",
    index_kwargs={"n_clusters": 8, "nprobe": 8,
                  "store_dtype": jnp.float32, "kmeans_iters": 2},
)
# IVF+PQ with the rotated codec across processes: the codebook/rotation
# fit runs per process on an identical replicated-fetch sample, so the
# codec must come out identical everywhere; scores are ADC-approximate,
# so the parent asserts hit-set OVERLAP vs single-process, not equality.
p_metrics, p_indices, _ = evaluate_checkpoint(
    model, queries, labels, corpus, tokenizer=tok, mesh=mesh,
    batch_size=16, max_query_length=16, max_passage_length=16,
    k=10, cutoffs=(1, 5, 10), compute_dtype=jnp.float32,
    index_type="ivf",
    index_kwargs={"n_clusters": 8, "nprobe": 8, "kmeans_iters": 2,
                  "pq_m": 8, "pq_iters": 5, "pq_rotate": "random"},
)
with open(os.path.join(outdir, f"metrics_{pid}.json"), "w") as f:
    json.dump({"metrics": metrics, "indices": indices.tolist(),
               "refine_metrics": r_metrics,
               "refine_indices": r_indices.tolist(),
               "ivf_metrics": i_metrics,
               "ivf_indices": i_indices.tolist(),
               "pq_indices": p_indices.tolist()}, f)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_eval_matches_single(tmp_path):
    from rankpo_tpu.models import init_params, save_pretrained, tiny_llama_config

    cfg = tiny_llama_config(vocab_size=256)
    params = init_params(jax.random.key(0), cfg)
    model_dir = tmp_path / "model"
    save_pretrained(str(model_dir), cfg, params)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    port = str(_free_port())
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port, str(tmp_path), str(model_dir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]

    multi0 = json.loads((tmp_path / "metrics_0.json").read_text())
    multi1 = json.loads((tmp_path / "metrics_1.json").read_text())
    assert multi0 == multi1, "processes disagree"

    # single-process reference on the conftest's own 8-device backend
    from rankpo_tpu.core.mesh import MeshConfig, make_mesh
    from rankpo_tpu.eval.evaluator import evaluate_checkpoint

    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    tok = HashTokenizer(vocab_size=256)
    queries = [f"job opening about subject {i} methods" for i in range(8)]
    labels = [[i] for i in range(8)]
    corpus = [f"field {i} research on subject {i} methods" for i in range(40)]
    metrics, indices, _ = evaluate_checkpoint(
        str(model_dir), queries, labels, corpus, tokenizer=tok, mesh=mesh,
        batch_size=16, max_query_length=16, max_passage_length=16,
        k=10, cutoffs=(1, 5, 10), compute_dtype=jnp.float32,
    )
    assert indices.tolist() == multi0["indices"], "indices differ from single-process"
    for key, value in metrics.items():
        assert abs(value - multi0["metrics"][key]) < 1e-9, key

    # refine (two-stage) index: same collective build + search across the
    # 2-process mesh — processes must agree (checked above via multi0==multi1)
    # and match the single-process run's hit sets and metrics
    r_metrics, r_indices, _ = evaluate_checkpoint(
        str(model_dir), queries, labels, corpus, tokenizer=tok, mesh=mesh,
        batch_size=16, max_query_length=16, max_passage_length=16,
        k=10, cutoffs=(1, 5, 10), compute_dtype=jnp.float32,
        index_type="refine", index_recall_target=0.9,
    )
    for row, multi_row in zip(r_indices.tolist(), multi0["refine_indices"]):
        assert set(row) == set(multi_row), "refine hit sets differ"
    for key, value in r_metrics.items():
        assert abs(value - multi0["refine_metrics"][key]) < 1e-9, key

    # IVF index: collective k-means build + cluster-sharded search across
    # the 2-process mesh, full-probe config (layout-independent hit sets)
    i_metrics, i_indices, _ = evaluate_checkpoint(
        str(model_dir), queries, labels, corpus, tokenizer=tok, mesh=mesh,
        batch_size=16, max_query_length=16, max_passage_length=16,
        k=10, cutoffs=(1, 5, 10), compute_dtype=jnp.float32,
        index_type="ivf",
        index_kwargs={"n_clusters": 8, "nprobe": 8,
                      "store_dtype": jnp.float32, "kmeans_iters": 2},
    )
    for row, multi_row in zip(i_indices.tolist(), multi0["ivf_indices"]):
        assert set(row) == set(multi_row), "ivf hit sets differ"
    for key, value in i_metrics.items():
        assert abs(value - multi0["ivf_metrics"][key]) < 1e-9, key

    # IVF+PQ (rotated codec): collective k-means bit noise can nudge the
    # centroids the codes are fit against, and ADC scores are approximate
    # by contract — assert strong per-row hit-set overlap, not equality
    _, p_indices, _ = evaluate_checkpoint(
        str(model_dir), queries, labels, corpus, tokenizer=tok, mesh=mesh,
        batch_size=16, max_query_length=16, max_passage_length=16,
        k=10, cutoffs=(1, 5, 10), compute_dtype=jnp.float32,
        index_type="ivf",
        index_kwargs={"n_clusters": 8, "nprobe": 8, "kmeans_iters": 2,
                      "pq_m": 8, "pq_iters": 5, "pq_rotate": "random"},
    )
    overlaps = [
        len(set(row) & set(multi_row)) / 10
        for row, multi_row in zip(p_indices.tolist(), multi0["pq_indices"])
    ]
    assert sum(overlaps) / len(overlaps) >= 0.8, overlaps


_SELECTOR_WORKER = r"""
import json, os, sys
sys.path.insert(0, "/root/repo")
pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)

import numpy as np
from rankpo_tpu.core.mesh import MeshConfig, make_mesh
from rankpo_tpu.index.flat import FlatIPIndex
from rankpo_tpu.index.ivf import IVFIPIndex


mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
rng = np.random.default_rng(7)
corpus = rng.normal(size=(203, 64)).astype(np.float32)
queries = rng.normal(size=(9, 64)).astype(np.float32)
allowed = np.sort(rng.choice(203, 41, replace=False))

# flat: filtered exact search is a collective (row-sharded mask) — both
# processes must produce the same, oracle-exact result
flat = FlatIPIndex(corpus, mesh=mesh)
fs, fi = flat.search(queries, k=10, allowed_ids=allowed)

# ivf, full probe: filtered hit sets must also agree across processes
ivf = IVFIPIndex(corpus, mesh=mesh, n_clusters=8, nprobe=8, kmeans_iters=2)
_, ii = ivf.search(queries, k=10, allowed_ids=allowed)

with open(os.path.join(outdir, f"sel_{pid}.json"), "w") as f:
    json.dump({"flat_scores": fs.tolist(), "flat_idx": fi.tolist(),
               "ivf_idx": ii.tolist(), "allowed": allowed.tolist()}, f)
"""


def test_two_process_filtered_search_matches_oracle(tmp_path):
    """Filtered search (IDSelector analog) across a 2-process mesh: the
    selector mask is a collective input (row-sharded for flat, replicated
    for IVF) — both processes must agree, flat must match the filtered
    numpy oracle bit-for-bit, and every hit must be eligible."""
    import numpy as np

    worker = tmp_path / "sel_worker.py"
    worker.write_text(_SELECTOR_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    port = str(_free_port())
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
    r0 = json.loads((tmp_path / "sel_0.json").read_text())
    r1 = json.loads((tmp_path / "sel_1.json").read_text())
    assert r0 == r1, "processes disagree on filtered search"

    # filtered numpy oracle (same deterministic inputs as the worker)
    rng = np.random.default_rng(7)
    corpus = rng.normal(size=(203, 64)).astype(np.float32)
    queries = rng.normal(size=(9, 64)).astype(np.float32)
    allowed = np.sort(rng.choice(203, 41, replace=False))
    assert r0["allowed"] == allowed.tolist()
    scores = queries @ corpus.T
    mask = np.zeros(203, bool)
    mask[allowed] = True
    scores[:, ~mask] = -np.inf
    order = np.argsort(-scores, axis=1, kind="stable")[:, :10]
    assert r0["flat_idx"] == order.tolist()
    aset = set(allowed.tolist())
    for row in r0["ivf_idx"]:
        assert set(i for i in row if i >= 0) <= aset
