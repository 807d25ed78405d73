"""True multi-process TRAINING (see bottom note on collator RNG): 2 JAX processes x 4 CPU devices run the
contrastive Trainer over one global mesh — the loader shards rows per
process, _globalize assembles global batches via
make_array_from_process_local_data, ZeRO-1 shards moments over the global
data axis, and rank 0 owns checkpoints. Loss history must agree with a
single-process run on the same data/seed (identical math up to batch-mean
summation order)."""


import pytest

pytestmark = pytest.mark.slow  # see pyproject: fast tier = -m 'not slow'

import json
import os
import socket
import subprocess
import sys

import jax

_WORKER = r"""
import json, os, sys
sys.path.insert(0, "/root/repo")
pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.device_count() == 8

import numpy as np
import jax.numpy as jnp
from rankpo_tpu.core.mesh import MeshConfig, make_mesh
from rankpo_tpu.data import ContrastiveCollator, ContrastiveDataset, HashTokenizer
from rankpo_tpu.models import init_params, tiny_llama_config
from rankpo_tpu.train import TrainConfig, Trainer, make_contrastive_loss_fn

mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
tok = HashTokenizer(vocab_size=256)
rows = [
    {"query": f"common topic {i} alpha", "positives": [f"common topic {i} beta"],
     "negatives": [f"other {j} {i}" for j in range(4)]}
    for i in range(32)
]
ds = ContrastiveDataset(rows, tok, 16, 16)
coll = ContrastiveCollator(pad_token_id=0, num_negatives=4,
                           max_query_length=16, max_passage_length=16, seed=3)
model_cfg = tiny_llama_config(vocab_size=256)
params = init_params(jax.random.key(0), model_cfg)
loss_fn = make_contrastive_loss_fn(
    model_cfg, temperature=0.05, use_inbatch_neg=True,
    negatives_cross_device=True, compute_dtype=jnp.float32,
)
cfg = TrainConfig(
    output_dir=os.path.join(outdir, "ckpt"), learning_rate=1e-3,
    warmup_steps=0, warmup_ratio=0.0, lr_scheduler_type="constant",
    per_device_train_batch_size=1, num_train_epochs=1, zero1=True,
    save_strategy="epoch", save_only_model=False, seed=7,
)
trainer = Trainer(loss_fn=loss_fn, params=params, mesh=mesh, config=cfg,
                  total_steps=4)
history = trainer.train(ds, coll)
with open(os.path.join(outdir, f"history_{pid}.json"), "w") as f:
    json.dump([h["loss"] for h in history], f)
"""


_PACKED_WORKER = r"""
import json, os, sys
sys.path.insert(0, "/root/repo")
pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.device_count() == 8

import numpy as np
import jax.numpy as jnp
from rankpo_tpu.core.mesh import MeshConfig, make_mesh
from rankpo_tpu.data import ContrastiveDataset, HashTokenizer
from rankpo_tpu.data.packing import PackedContrastiveCollator, sync_packed_budgets
from rankpo_tpu.models import init_params, tiny_llama_config
from rankpo_tpu.train import TrainConfig, Trainer, make_contrastive_loss_fn


mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
tok = HashTokenizer(vocab_size=256)
rows = [
    {"query": f"common topic {i} alpha", "positives": [f"common topic {i} beta"],
     "negatives": [f"other {j} {i}" for j in range(4)]}
    for i in range(32)
]
ds = ContrastiveDataset(rows, tok, 16, 16)
coll = PackedContrastiveCollator(
    pad_token_id=0, num_negatives=4, max_query_length=16,
    max_passage_length=16, query_max_segments=4, passage_max_segments=4,
    rows_multiple=8, seed=3,
)
# multi-process bring-up: one startup allgather agrees the fixed budgets,
# then slot tables point at GLOBAL batch positions for this host's shard
local_bs = 4  # per_device 1 x 4 local devices
q_rows, p_rows = sync_packed_budgets(coll, [ds[i] for i in range(local_bs)])
coll.set_process_shard(pid, local_bs)
model_cfg = tiny_llama_config(vocab_size=256)
params = init_params(jax.random.key(0), model_cfg)
loss_fn = make_contrastive_loss_fn(
    model_cfg, temperature=0.05, use_inbatch_neg=True,
    negatives_cross_device=True, compute_dtype=jnp.float32,
)
cfg = TrainConfig(
    output_dir=os.path.join(outdir, "ckpt"), learning_rate=1e-3,
    warmup_steps=0, warmup_ratio=0.0, lr_scheduler_type="constant",
    per_device_train_batch_size=1, num_train_epochs=1, zero1=True,
    save_strategy="no", seed=7,
)
trainer = Trainer(loss_fn=loss_fn, params=params, mesh=mesh, config=cfg,
                  total_steps=4)
history = trainer.train(ds, coll)
with open(os.path.join(outdir, f"packed_history_{pid}.json"), "w") as f:
    json.dump({"loss": [h["loss"] for h in history],
               "budgets": [int(q_rows), int(p_rows)],
               "truncated": coll._q.n_truncated + coll._p.n_truncated}, f)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_matches_single(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    port = str(_free_port())
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]

    h0 = json.loads((tmp_path / "history_0.json").read_text())
    h1 = json.loads((tmp_path / "history_1.json").read_text())
    assert h0 == h1, "ranks logged different losses"
    assert len(h0) == 4 and all(abs(x) < 1e3 for x in h0)

    # rank 0 owns the checkpoint; rank 1 must not have raced it
    ckpts = [d for d in os.listdir(tmp_path / "ckpt") if d.startswith("checkpoint-")]
    assert len(ckpts) == 1, ckpts
    # full-state save: the ZeRO-1 moments are cross-process-sharded, so this
    # proves the collective gather path (device_get alone raises there)
    assert os.path.isdir(tmp_path / "ckpt" / ckpts[0] / "opt_state"), (
        "optimizer state missing from multi-host checkpoint"
    )

    # single-process reference on the conftest backend: same data, seed,
    # global batch -> same loss sequence (batch-mean order tolerance only)
    import numpy as np
    import jax.numpy as jnp

    from rankpo_tpu.core.mesh import MeshConfig, make_mesh
    from rankpo_tpu.data import ContrastiveCollator, ContrastiveDataset, HashTokenizer
    from rankpo_tpu.models import init_params, tiny_llama_config
    from rankpo_tpu.train import TrainConfig, Trainer, make_contrastive_loss_fn

    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    tok = HashTokenizer(vocab_size=256)
    rows = [
        {"query": f"common topic {i} alpha", "positives": [f"common topic {i} beta"],
         "negatives": [f"other {j} {i}" for j in range(4)]}
        for i in range(32)
    ]
    ds = ContrastiveDataset(rows, tok, 16, 16)
    coll = ContrastiveCollator(pad_token_id=0, num_negatives=4,
                               max_query_length=16, max_passage_length=16, seed=3)
    model_cfg = tiny_llama_config(vocab_size=256)
    params = init_params(jax.random.key(0), model_cfg)
    loss_fn = make_contrastive_loss_fn(
        model_cfg, temperature=0.05, use_inbatch_neg=True,
        negatives_cross_device=True, compute_dtype=jnp.float32,
    )
    cfg = TrainConfig(
        output_dir=str(tmp_path / "single"), learning_rate=1e-3,
        warmup_steps=0, warmup_ratio=0.0, lr_scheduler_type="constant",
        per_device_train_batch_size=1, num_train_epochs=1, zero1=True,
        save_strategy="no", seed=7,
    )
    trainer = Trainer(loss_fn=loss_fn, params=params, mesh=mesh, config=cfg,
                      total_steps=4)
    single = [h["loss"] for h in trainer.train(ds, coll)]
    np.testing.assert_allclose(h0, single, rtol=2e-4)


def test_two_process_packed_training_matches_single(tmp_path):
    """Sequence-packed multi-process training: synced fixed row budgets +
    global slot offsets give every host one static shape, and the loss
    sequence matches a single-process PACKED run on the same data/seed
    (packing is loss-neutral; see the RNG note at the bottom)."""
    worker = tmp_path / "worker.py"
    worker.write_text(_PACKED_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    port = str(_free_port())
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]

    r0 = json.loads((tmp_path / "packed_history_0.json").read_text())
    r1 = json.loads((tmp_path / "packed_history_1.json").read_text())
    assert r0["loss"] == r1["loss"], "ranks logged different losses"
    assert r0["budgets"] == r1["budgets"], "hosts disagreed on row budgets"
    assert len(r0["loss"]) == 4

    # single-process packed reference on the conftest backend
    import numpy as np
    import jax.numpy as jnp

    from rankpo_tpu.core.mesh import MeshConfig, make_mesh
    from rankpo_tpu.data import ContrastiveDataset, HashTokenizer
    from rankpo_tpu.data.packing import PackedContrastiveCollator
    from rankpo_tpu.models import init_params, tiny_llama_config
    from rankpo_tpu.train import TrainConfig, Trainer, make_contrastive_loss_fn

    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    tok = HashTokenizer(vocab_size=256)
    rows = [
        {"query": f"common topic {i} alpha", "positives": [f"common topic {i} beta"],
         "negatives": [f"other {j} {i}" for j in range(4)]}
        for i in range(32)
    ]
    ds = ContrastiveDataset(rows, tok, 16, 16)
    coll = PackedContrastiveCollator(
        pad_token_id=0, num_negatives=4, max_query_length=16,
        max_passage_length=16, query_max_segments=4, passage_max_segments=4,
        rows_multiple=8, seed=3,
    )
    model_cfg = tiny_llama_config(vocab_size=256)
    params = init_params(jax.random.key(0), model_cfg)
    loss_fn = make_contrastive_loss_fn(
        model_cfg, temperature=0.05, use_inbatch_neg=True,
        negatives_cross_device=True, compute_dtype=jnp.float32,
    )
    cfg = TrainConfig(
        output_dir=str(tmp_path / "single"), learning_rate=1e-3,
        warmup_steps=0, warmup_ratio=0.0, lr_scheduler_type="constant",
        per_device_train_batch_size=1, num_train_epochs=1, zero1=True,
        save_strategy="no", seed=7,
    )
    trainer = Trainer(loss_fn=loss_fn, params=params, mesh=mesh, config=cfg,
                      total_steps=4)
    single = [h["loss"] for h in trainer.train(ds, coll)]
    np.testing.assert_allclose(r0["loss"], single, rtol=2e-4)


# NOTE: num_negatives equals the rows' negative count so the sampled negative
# SET is layout-independent (only its order varies, which the InfoNCE mean is
# invariant to). With num_negatives < available, each process's collator RNG
# stream diverges from the single-process stream — the same property the
# reference's per-rank random sampling has (src/data_utils.py:50), so batch
# composition equality is only defined up to that RNG.
