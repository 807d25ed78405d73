"""The serve CLI's multi-host wiring, end to end: 2 processes run
`rankpo_tpu.cli.serve.main` with --coordinator_address; rank 1 enters the
follower loop, rank 0 warms through the broadcast frontend, binds HTTP, and
answers queries whose search spans both processes' corpus shards.

Complements tests/test_serve_multihost.py (which drives MultihostFrontend as
a library): this one catches wiring bugs in cli/serve.py itself. The server
processes never exit on their own (serve_forever / follower_loop), so the
test kills them after verifying responses.
"""


import pytest

pytestmark = pytest.mark.slow  # see pyproject: fast tier = -m 'not slow'

import json
import os
import signal
import socket
import subprocess
import sys
import time
import urllib.request

import jax

from rankpo_tpu.data.tokenization import HashTokenizer

_WORKER = r"""
import json, os, sys
sys.path.insert(0, "/root/repo")
pid = int(sys.argv[1]); coord_port = sys.argv[2]; http_port = sys.argv[3]
model = sys.argv[4]; corpus = sys.argv[5]

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from rankpo_tpu.cli.serve import main

main([
    "--model_name_or_path", model,
    "--tokenizer_name", "hash:256",
    "--corpus_data", corpus,
    "--port", http_port,
    "--max_query_length", "16", "--max_passage_length", "16",
    "--batch_size", "16", "--serving_k_max", "5", "--warmup", "fast",
    "--microbatch_wait_ms", "2",
    "--coordinator_address", f"localhost:{coord_port}",
    "--num_processes", "2", "--process_id", str(pid),
])
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_serve_cli(tmp_path):
    from rankpo_tpu.models import init_params, save_pretrained, tiny_llama_config

    cfg = tiny_llama_config(vocab_size=256)
    model_dir = tmp_path / "model"
    save_pretrained(str(model_dir), cfg, init_params(jax.random.key(0), cfg))
    corpus_file = tmp_path / "corpus.jsonl"
    corpus_file.write_text("\n".join(
        json.dumps({"text": f"document {i} on distinct topic {i}"})
        for i in range(32)
    ))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    coord_port, http_port = _free_port(), _free_port()
    env = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(coord_port),
             str(http_port), str(model_dir), str(corpus_file)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    try:
        deadline = time.time() + 180
        health = None
        while time.time() < deadline:
            for p in procs:
                if p.poll() is not None:
                    out = p.stdout.read().decode()
                    raise AssertionError(f"server process died:\n{out[-3000:]}")
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{http_port}/healthz", timeout=1
                ) as r:
                    health = json.loads(r.read())
                break
            except Exception:
                time.sleep(1)
        assert health is not None, "rank-0 HTTP server never came up"
        assert health["ntotal"] == 32

        req = urllib.request.Request(
            f"http://127.0.0.1:{http_port}/search",
            data=json.dumps(
                {"queries": ["document 21 on distinct topic 21"], "k": 3}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            body = json.loads(r.read())
        hits = body["results"][0]["hits"]
        assert hits[0]["index"] == 21 and len(hits) == 3
        # multi-query path too (direct, search-at-k_max + slice)
        req = urllib.request.Request(
            f"http://127.0.0.1:{http_port}/search",
            data=json.dumps(
                {"queries": ["document 3 on distinct topic 3",
                             "document 30 on distinct topic 30"], "k": 2}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            body = json.loads(r.read())
        assert [r_["hits"][0]["index"] for r_ in body["results"]] == [3, 30]
    finally:
        for p in procs:
            if p.poll() is None:
                p.send_signal(signal.SIGKILL)
        for p in procs:
            p.wait(timeout=10)
