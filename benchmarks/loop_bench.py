"""Full Trainer.train loop throughput with a REAL host input pipeline.

Unlike train_bench.py (one pre-built batch fed repeatedly), this drives
Trainer.train with a DataLoader + collator, so host-side collation, group
stacking, and H2D staging are on the clock — the path the round-2 overlap
work (loader stack=accum + one-ahead device_put) targets.

--collator_ms adds artificial per-microbatch collation cost to model heavy
tokenization; with full overlap the step time should not grow until collation
exceeds device compute.

    python benchmarks/loop_bench.py --accum 4 [--collator_ms 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--attn", default="flash")
    parser.add_argument("--hidden", type=int, default=1024)
    parser.add_argument("--layers", type=int, default=8)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--group", type=int, default=4)
    parser.add_argument("--q_seq", type=int, default=512)
    parser.add_argument("--p_seq", type=int, default=1024)
    parser.add_argument("--accum", type=int, default=4)
    parser.add_argument("--rows", type=int, default=0, help="dataset rows (0=auto)")
    parser.add_argument("--collator_ms", type=float, default=0.0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from rankpo_tpu.core.mesh import local_mesh
    from rankpo_tpu.data import ContrastiveCollator, ContrastiveDataset, HashTokenizer
    from rankpo_tpu.models import EncoderConfig, init_params
    from rankpo_tpu.train import TrainConfig, Trainer, make_contrastive_loss_fn

    config = EncoderConfig(
        model_type="llama", vocab_size=32000, hidden_size=args.hidden,
        intermediate_size=args.hidden * 3, num_hidden_layers=args.layers,
        num_attention_heads=16, num_key_value_heads=8,
        max_position_embeddings=8192, rope_theta=500000.0, pad_token_id=0,
        architectures=("LlamaModel",), pooling="last_token",
    )
    mesh = local_mesh()
    n_dev = mesh.devices.size
    params = init_params(jax.random.key(0), config)
    loss_fn = make_contrastive_loss_fn(
        config, temperature=0.02, compute_dtype=jnp.bfloat16, remat=True,
        attn_impl=args.attn,
    )

    micro = args.batch * n_dev
    steps = 12  # warm step + measured steps
    rows = args.rows or micro * args.accum * steps
    tok = HashTokenizer(vocab_size=32000)
    data = [
        {
            "query": " ".join(f"tok{i}_{j}" for j in range(64)),
            "positives": [" ".join(f"pos{i}_{j}" for j in range(128))],
            "negatives": [
                " ".join(f"neg{i}_{m}_{j}" for j in range(128)) for m in range(6)
            ],
        }
        for i in range(rows)
    ]
    ds = ContrastiveDataset(data, tok, args.q_seq, args.p_seq)
    base_collator = ContrastiveCollator(
        pad_token_id=0, num_negatives=args.group - 1,
        max_query_length=args.q_seq, max_passage_length=args.p_seq,
    )
    if args.collator_ms > 0:
        delay = args.collator_ms / 1e3

        def collator(rows_):
            time.sleep(delay)
            return base_collator(rows_)
    else:
        collator = base_collator

    import dataclasses

    cfg_kwargs = dict(
        output_dir="/tmp/loop_bench", learning_rate=1e-5, warmup_ratio=0.0,
        lr_scheduler_type="constant", per_device_train_batch_size=args.batch,
        gradient_accumulation_steps=args.accum, num_train_epochs=1,
        save_strategy="no", logging_steps=0, logging_strategy="no",
    )
    # keep the script runnable against older package snapshots (A/B timing)
    fields = {f.name for f in dataclasses.fields(TrainConfig)}
    cfg = TrainConfig(**{k: v for k, v in cfg_kwargs.items() if k in fields})
    trainer = Trainer(loss_fn=loss_fn, params=params, mesh=mesh, config=cfg,
                      total_steps=100)

    from rankpo_tpu.train.state import TrainState

    def sync():
        float(jnp.sum(jax.tree_util.tree_leaves(trainer.state.params)[0][:1]))

    # warm epoch: pays the remote compile; then rewind the step counter and
    # measure a clean epoch on the cached executable
    trainer.train(ds, collator)
    sync()
    trainer.state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=trainer.state.params,
        opt_state=trainer.state.opt_state,
    )
    t0 = time.perf_counter()
    trainer.train(ds, collator)
    sync()
    total = time.perf_counter() - t0
    n_steps = rows // (micro * args.accum)
    # first step carries compile; report steady-state over the rest
    print(json.dumps({
        "metric": "train_loop_samples_per_sec_per_chip",
        "value": round(rows / total / n_dev, 3),
        "unit": "samples/sec/chip",
        "total_s": round(total, 3),
        "steps": n_steps,
        "accum": args.accum,
        "collator_ms": args.collator_ms,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
