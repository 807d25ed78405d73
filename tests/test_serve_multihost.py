"""Multi-host serving: 2 JAX processes form one 8-device mesh with the corpus
sharded across BOTH; rank 0 answers queries via MultihostFrontend (+ the
micro-batcher on top) while rank 1 replays dispatches in follower_loop.
Results must be identical to a single-process RetrievalService.

Spawned as real subprocesses (jax.distributed.initialize is once-per-process
and conftest already initialized this one).
"""


import pytest

pytestmark = pytest.mark.slow  # see pyproject: fast tier = -m 'not slow'

import json
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp

from rankpo_tpu.data.tokenization import HashTokenizer

_WORKER = r"""
import json, os, sys, threading
sys.path.insert(0, "/root/repo")
pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
model = sys.argv[4]; pack = bool(int(sys.argv[5]))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4

import jax.numpy as jnp
from rankpo_tpu.core.mesh import MeshConfig, make_mesh
from rankpo_tpu.data.tokenization import HashTokenizer
from rankpo_tpu.index import InferenceEncoder
from rankpo_tpu.serve import MicroBatcher, MultihostFrontend, RetrievalService

mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
tok = HashTokenizer(vocab_size=256)
encoder = InferenceEncoder.from_pretrained(
    model, tokenizer=tok, mesh=mesh, compute_dtype=jnp.float32, length_multiple=8
)
service = RetrievalService(encoder, mesh=mesh, max_query_length=16,
                           query_batch_size=8, pack_queries=pack,
                           pack_max_segments=4)
corpus = [f"document {i} on distinct topic {i}" for i in range(32)]
service.build_index(corpus, max_passage_length=16, batch_size=16)

frontend = MultihostFrontend(service)
if pid != 0:
    frontend.follower_loop()
    sys.exit(0)

# rank 0: single-query path through the micro-batcher, batch path direct
mb = MicroBatcher(frontend, max_batch=8, max_wait_ms=5, k_max=5)
single = mb.query("document 7 on distinct topic 7", k=3)
batch = frontend.query(
    [f"document {i} on distinct topic {i}" for i in (3, 11, 30)], k=4,
    return_passages=False,
)
# index extension is a collective too (followers replay the encode)
frontend.add_passages(["document 70 on distinct topic 70"],
                      max_passage_length=16, batch_size=16)
added = frontend.query("document 70 on distinct topic 70", k=1)
# removal replays as a collective rebuild on every process (remove id 0:
# every later id shifts down by one, FAISS remove_ids renumbering)
n_removed = frontend.remove_passages([0])
after_remove = frontend.query("document 70 on distinct topic 70", k=1)
mb.close()
frontend.stop()
with open(os.path.join(outdir, "results.json"), "w") as f:
    json.dump({"single": single, "batch": batch, "added": added,
               "n_removed": n_removed, "after_remove": after_remove}, f)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("pack", [0, 1])
def test_two_process_serving_matches_single(tmp_path, pack):
    from rankpo_tpu.index import InferenceEncoder
    from rankpo_tpu.models import init_params, save_pretrained, tiny_llama_config
    from rankpo_tpu.serve import RetrievalService

    cfg = tiny_llama_config(vocab_size=256)
    params = init_params(jax.random.key(0), cfg)
    model_dir = tmp_path / "model"
    save_pretrained(str(model_dir), cfg, params)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    port = _free_port()
    env = {
        **{k: v for k, v in __import__("os").environ.items()},
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(tmp_path),
             str(model_dir), str(pack)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    with open(tmp_path / "results.json") as f:
        got = json.load(f)

    # single-process ground truth on the conftest 8-device mesh
    from rankpo_tpu.core.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    tok = HashTokenizer(vocab_size=256)
    encoder = InferenceEncoder(cfg, params, tok, mesh=mesh,
                               compute_dtype=jnp.float32, length_multiple=8)
    svc = RetrievalService(encoder, mesh=mesh, max_query_length=16,
                           query_batch_size=8)
    corpus = [f"document {i} on distinct topic {i}" for i in range(32)]
    svc.build_index(corpus, max_passage_length=16, batch_size=16)

    ref_single = svc.query("document 7 on distinct topic 7", k=3)
    assert [h["index"] for h in got["single"]["hits"]] == [
        h["index"] for h in ref_single["hits"]
    ]
    assert got["single"]["hits"][0]["passage"] == ref_single["hits"][0]["passage"]

    ref_batch = svc.query(
        [f"document {i} on distinct topic {i}" for i in (3, 11, 30)], k=4,
        return_passages=False,
    )
    assert [[h["index"] for h in r["hits"]] for r in got["batch"]] == [
        [h["index"] for h in r["hits"]] for r in ref_batch
    ]
    # the passage added through the broadcast got the next id (32) and is
    # retrievable from the shard-extended index
    assert got["added"]["hits"][0]["index"] == 32
    assert got["added"]["hits"][0]["passage"] == "document 70 on distinct topic 70"
    # removal broadcast: id 0 dropped on every process, later ids shift
    # down (the added passage 32 -> 31), passages stay attached correctly
    assert got["n_removed"] == 1
    assert got["after_remove"]["hits"][0]["index"] == 31
    assert (got["after_remove"]["hits"][0]["passage"]
            == "document 70 on distinct topic 70")
