"""In-training retrieval evaluation (eval/in_training.py): the offline
evaluate.py harness (reference src/evaluate.py:103-291) wired into the live
training loop. Covers: hook-vs-offline metric parity on identical params,
compiled-encoder reuse across calls, FSDP-sharded params, and the trainer
integration (retrieval_* metrics land in the log history per eval_strategy)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rankpo_tpu.data import ContrastiveCollator, ContrastiveDataset, HashTokenizer
from rankpo_tpu.eval import RetrievalEvalHook, evaluate_checkpoint
from rankpo_tpu.eval.in_training import maybe_attach_retrieval_eval
from rankpo_tpu.models import init_params, save_pretrained, tiny_llama_config
from rankpo_tpu.train import TrainConfig, Trainer, make_contrastive_loss_fn


@pytest.fixture(scope="module")
def tok():
    return HashTokenizer(vocab_size=256)


CORPUS = [f"unique doc {i} topic {i}" for i in range(20)]
POSITIVES = (3, 11)


def _write_eval_files(tmp_path):
    qf, cf = tmp_path / "q.jsonl", tmp_path / "c.jsonl"
    qf.write_text(
        "\n".join(
            json.dumps({"query": {"text": CORPUS[i]}, "positives": {"index": [i]}})
            for i in POSITIVES
        )
    )
    cf.write_text("\n".join(json.dumps({"text": t}) for t in CORPUS))
    return str(qf), str(cf)


def _hook(tmp_path, tok, mesh, **kwargs):
    qf, cf = _write_eval_files(tmp_path)
    kw = dict(
        max_query_length=16, max_passage_length=16, k=10, cutoffs=(1, 5),
        batch_size=8, compute_dtype=jnp.float32,
    )
    kw.update(kwargs)
    return RetrievalEvalHook(
        tiny_llama_config(vocab_size=256), tok, qf, cf, mesh=mesh, **kw
    )


class TestRetrievalEvalHook:
    def test_matches_offline_evaluator(self, tmp_path, data_mesh, tok):
        """The hook on live params == evaluate_checkpoint on the same params
        saved to disk (identical encode → index → search → metrics path)."""
        cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(0), cfg)
        model_dir = tmp_path / "ckpt"
        save_pretrained(str(model_dir), cfg, params)

        hook = _hook(tmp_path, tok, data_mesh)
        live = hook(params)

        offline, _, _ = evaluate_checkpoint(
            str(model_dir), [CORPUS[i] for i in POSITIVES],
            [[i] for i in POSITIVES], CORPUS,
            tokenizer=tok, mesh=data_mesh, batch_size=8,
            max_query_length=16, max_passage_length=16, k=10, cutoffs=(1, 5),
            compute_dtype=jnp.float32,
        )
        assert live["retrieval_MRR@1"] == 1.0  # query == its positive doc
        for name, value in offline.items():
            np.testing.assert_allclose(
                live[f"retrieval_{name}"], value, rtol=1e-6, err_msg=name
            )

    def test_encoder_reused_and_params_freed(self, tmp_path, data_mesh, tok):
        cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(1), cfg)
        hook = _hook(tmp_path, tok, data_mesh)
        first = hook(params)
        enc = hook._encoder
        assert enc is not None and enc.params is None  # replicated copy freed
        second = hook(params)
        assert hook._encoder is enc  # same compiled embed programs
        assert first == second

    def test_cutoffs_refiltered_against_clamped_k(self, tmp_path, data_mesh, tok):
        """Corpus smaller than retrieval_eval_k: k clamps to len(corpus) and
        the cutoffs must re-filter against the CLAMPED k — otherwise the log
        reports e.g. nDCG@100 that was really computed over len(corpus)
        slots (mislabeled metrics, advisor round-3 finding)."""
        hook = _hook(tmp_path, tok, data_mesh, k=100, cutoffs=(1, 5, 100))
        assert hook.k == len(CORPUS) == 20
        assert hook.cutoffs == [1, 5]  # 100 > clamped k → dropped
        cfg = tiny_llama_config(vocab_size=256)
        metrics = hook(init_params(jax.random.key(3), cfg))
        assert "retrieval_MRR@100" not in metrics
        assert "retrieval_MRR@5" in metrics
        # all requested cutoffs above the corpus size → fall back to [k]
        hook2 = _hook(tmp_path, tok, data_mesh, k=50, cutoffs=(30, 40))
        assert hook2.cutoffs == [20]

    def test_fsdp_sharded_params(self, tmp_path, data_mesh, tok):
        """ZeRO-3/FSDP-style params (sharded over the data axis) re-gather on
        device through the hook's jitted reshard and give identical metrics
        to the replicated run."""
        from rankpo_tpu.parallel.sharding import fsdp_partition_specs, make_shardings

        cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(2), cfg)
        specs = fsdp_partition_specs(params, data_mesh.shape["data"])
        sharded = jax.device_put(params, make_shardings(data_mesh, specs))
        hook = _hook(tmp_path, tok, data_mesh)
        np.testing.assert_equal(hook(sharded), hook(params))


class TestTrainerIntegration:
    def test_retrieval_metrics_in_history(self, tmp_path, data_mesh, tok):
        model_cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(0), model_cfg)
        loss_fn = make_contrastive_loss_fn(
            model_cfg, temperature=0.05, use_inbatch_neg=True,
            negatives_cross_device=True, compute_dtype=jnp.float32,
        )
        cfg = TrainConfig(
            output_dir=str(tmp_path / "out"), learning_rate=1e-3,
            warmup_steps=0, warmup_ratio=0.0, lr_scheduler_type="constant",
            per_device_train_batch_size=1, num_train_epochs=1,
            eval_strategy="epoch", save_strategy="no",
        )
        trainer = Trainer(
            loss_fn=loss_fn, params=params, mesh=data_mesh, config=cfg,
            total_steps=2,
        )
        trainer.retrieval_eval_fn = _hook(tmp_path, tok, data_mesh)

        rows = [
            {
                "query": f"common topic {i} alpha",
                "positives": [f"common topic {i} gamma"],
                "negatives": [f"other {j} {i}" for j in range(3)],
            }
            for i in range(16)
        ]
        ds = ContrastiveDataset(rows, tok, 16, 16)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=3,
                                   max_query_length=16, max_passage_length=16,
                                   seed=0)
        history = trainer.train(ds, coll)
        ev = [h for h in history if "retrieval_MRR@1" in h]
        assert len(ev) == 1  # one eval point: epoch end
        assert "retrieval_nDCG@5" in ev[0]
        assert "retrieval_eval_runtime" in ev[0]
        assert 0.0 <= ev[0]["retrieval_MRR@1"] <= 1.0

    def test_attach_helper_validation(self, tmp_path, data_mesh, tok):
        class DataArgs:
            retrieval_eval_query_file = None
            retrieval_eval_corpus_file = "c.jsonl"
            retrieval_eval_k = 10
            max_query_length = 16
            max_passage_length = 16

        cfg = TrainConfig(output_dir=str(tmp_path / "o"))
        trainer = Trainer(
            loss_fn=lambda p, b, r: (jnp.float32(0), {}), params={"w": jnp.ones(8)},
            mesh=data_mesh, config=cfg, total_steps=1,
        )
        with pytest.raises(ValueError, match="requires"):
            maybe_attach_retrieval_eval(
                trainer, DataArgs(), tiny_llama_config(vocab_size=256), tok,
                mesh=data_mesh,
            )

        qf, cf = _write_eval_files(tmp_path)
        args = DataArgs()
        args.retrieval_eval_query_file = qf
        args.retrieval_eval_corpus_file = cf
        assert maybe_attach_retrieval_eval(
            trainer, args, tiny_llama_config(vocab_size=256), tok,
            mesh=data_mesh,
        )
        assert trainer.retrieval_eval_fn is not None
        assert trainer.retrieval_eval_fn.k == 10
        assert trainer.retrieval_eval_fn.cutoffs == [1, 5, 10]


_TWO_PROC_WORKER = r"""
import json, os, sys
sys.path.insert(0, "/root/repo")
pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.device_count() == 8

import jax.numpy as jnp
from rankpo_tpu.core.mesh import MeshConfig, make_mesh
from rankpo_tpu.data import HashTokenizer
from rankpo_tpu.eval.in_training import RetrievalEvalHook
from rankpo_tpu.models import init_params, tiny_llama_config

mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
cfg = tiny_llama_config(vocab_size=256)
params = init_params(jax.random.key(0), cfg)
hook = RetrievalEvalHook(
    cfg, HashTokenizer(vocab_size=256),
    os.path.join(outdir, "q.jsonl"), os.path.join(outdir, "c.jsonl"),
    mesh=mesh, max_query_length=16, max_passage_length=16, k=10,
    cutoffs=(1, 5), batch_size=8, compute_dtype=jnp.float32,
)
m1 = hook(params)
m2 = hook(params)  # second call reuses the compiled programs on the global mesh
assert m1 == m2, (m1, m2)
with open(os.path.join(outdir, f"retrieval_{pid}.json"), "w") as f:
    json.dump(m1, f)
"""


@pytest.mark.slow
class TestTwoProcess:
    def test_two_process_matches_single(self, tmp_path, data_mesh, tok):
        """The hook's collective encode+search on a 2-process x 4-device
        global mesh produces bit-identical metrics to the single-process
        8-device run (same precedent as tests/test_multihost.py)."""
        import os
        import socket
        import subprocess
        import sys as _sys

        _write_eval_files(tmp_path)
        worker = tmp_path / "worker.py"
        worker.write_text(_TWO_PROC_WORKER)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        s = socket.socket(); s.bind(("localhost", 0))
        port = str(s.getsockname()[1]); s.close()
        procs = [
            subprocess.Popen(
                [_sys.executable, str(worker), str(i), port, str(tmp_path)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
            for i in range(2)
        ]
        for p in procs:
            _, err = p.communicate(timeout=600)
            assert p.returncode == 0, err[-3000:]

        m0 = json.loads((tmp_path / "retrieval_0.json").read_text())
        m1 = json.loads((tmp_path / "retrieval_1.json").read_text())
        assert m0 == m1, "ranks disagree on retrieval metrics"

        single = _hook(tmp_path, tok, data_mesh)(
            init_params(jax.random.key(0), tiny_llama_config(vocab_size=256))
        )
        # AUC can be NaN on this tiny single-class fixture; compare the rest
        for name, value in single.items():
            got = m0[name]
            if np.isnan(value):
                assert np.isnan(got), name
            else:
                np.testing.assert_allclose(got, value, rtol=0, atol=0,
                                           err_msg=name)


class TestIndexSpec:
    def test_factory_spec_resolves_and_runs(self, tmp_path, data_mesh, tok):
        hook = _hook(tmp_path, tok, data_mesh, index_type="PCA8,Flat")
        assert hook.index_type == "refine"
        metrics = hook(init_params(jax.random.key(0),
                                   tiny_llama_config(vocab_size=256)))
        assert "retrieval_MRR@1" in metrics

    def test_invalid_spec_fails_at_construction(self, tmp_path, data_mesh, tok):
        with pytest.raises(Exception):
            _hook(tmp_path, tok, data_mesh, index_type="OPQ64,Flat")
