"""Contrastive train-step throughput on real hardware (samples/sec/chip).

BASELINE.md tracks contrastive samples/sec/chip (no published reference number
exists). Run: python benchmarks/train_bench.py [--attn xla|flash] [--seq N]
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
    parser.add_argument("--attn", default="auto", choices=["auto", "xla", "flash"])
    parser.add_argument("--hidden", type=int, default=1024)
    parser.add_argument("--layers", type=int, default=8)
    parser.add_argument("--heads", type=int, default=16)
    parser.add_argument("--kv_heads", type=int, default=8)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--group", type=int, default=4)  # 1 pos + 3 neg
    parser.add_argument("--q_seq", type=int, default=512)
    parser.add_argument("--p_seq", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--remat_policy", default="full", choices=["full", "dots", "attn"])
    parser.add_argument("--pure_bf16", action="store_true",
                        help="bf16 params+moments: fits ~1B params on one v5e")
    parser.add_argument("--vocab", type=int, default=32000)
    parser.add_argument("--ffn", type=int, default=0)
    parser.add_argument("--accum", type=int, default=1)
    parser.add_argument("--grad_cache", action="store_true")
    parser.add_argument("--pad_frac", type=float, default=0.0,
                        help="fraction of each row that is padding (realistic batches)")
    parser.add_argument("--var_len", action="store_true",
                        help="per-row random lengths with mean "
                             "(1-pad_frac)*seq (instead of one uniform pad "
                             "tail) — the realistic mixed-length regime")
    parser.add_argument("--pack", action="store_true",
                        help="sequence packing (implies --var_len): same "
                             "texts bin-packed into full rows, block-"
                             "diagonal flash attention; samples/sec counts "
                             "the same examples either way")
    parser.add_argument("--pack_max_segments", type=int, default=16)
    parser.add_argument("--optim", default="adamw",
                        choices=["adamw", "adamw8bit", "adafactor"])
    parser.add_argument("--max_grad_norm", type=float, default=1.0,
                        help="0 disables clipping (saves a full-grad-tree "
                             "transient at the memory boundary)")
    parser.add_argument("--ablate", default="none",
                        choices=["none", "rope", "norm", "opt"],
                        help="perf ablations (numerically WRONG, diagnosis "
                             "only): upper bound of what fusing/eliminating "
                             "the op could buy — rope: identity RoPE; norm: "
                             "identity RMSNorm; opt: SGD update instead of "
                             "AdamW (bounds optimizer HBM traffic)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from rankpo_tpu.core.mesh import local_mesh
    from rankpo_tpu.models import EncoderConfig, init_params
    from rankpo_tpu.train import TrainConfig, Trainer, make_contrastive_loss_fn

    if args.ablate == "rope":
        from rankpo_tpu.models import llama

        llama.apply_rope = lambda x, cos, sin: x
    elif args.ablate == "norm":
        from rankpo_tpu.models import llama

        llama.rms_norm = lambda x, w, eps, gemma=False: x
    elif args.ablate == "opt":
        import optax

        from rankpo_tpu.train import state as _state
        from rankpo_tpu.train import trainer as _trainer_mod

        def sgd_optimizer(config, total_steps):
            schedule = _state.make_schedule(config, total_steps)
            return optax.sgd(schedule), schedule

        # Trainer imported the name directly; patch its module binding
        _trainer_mod.make_optimizer = sgd_optimizer

    config = EncoderConfig(
        model_type="llama",
        vocab_size=args.vocab,
        hidden_size=args.hidden,
        intermediate_size=args.ffn or args.hidden * 3,
        num_hidden_layers=args.layers,
        num_attention_heads=args.heads,
        num_key_value_heads=args.kv_heads,
        max_position_embeddings=8192,
        rope_theta=500000.0,
        pad_token_id=0,
        architectures=("LlamaModel",),
        pooling="last_token",
    )
    mesh = local_mesh()
    n_dev = mesh.devices.size
    params = init_params(
        jax.random.key(0), config,
        dtype=jnp.bfloat16 if args.pure_bf16 else jnp.float32,
    )
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))

    loss_fn = make_contrastive_loss_fn(
        config,
        temperature=0.02,
        compute_dtype=jnp.bfloat16,
        remat=args.remat,
        remat_policy=args.remat_policy,
        attn_impl=args.attn,
    )
    cfg = TrainConfig(
        output_dir="/tmp/train_bench",
        learning_rate=1e-5,
        warmup_ratio=0.0,
        lr_scheduler_type="constant",
        per_device_train_batch_size=args.batch,
        gradient_accumulation_steps=args.accum,
        max_grad_norm=args.max_grad_norm,
        optim=args.optim,
        save_strategy="no",
    )
    grad_fn = None
    if args.grad_cache:
        from rankpo_tpu.train.gradcache import make_contrastive_gradcache_grad_fn

        grad_fn = make_contrastive_gradcache_grad_fn(
            config, temperature=0.02, compute_dtype=jnp.bfloat16,
            remat=args.remat, remat_policy=args.remat_policy, attn_impl=args.attn,
        )
    trainer = Trainer(
        loss_fn=loss_fn, grad_fn=grad_fn, params=params, mesh=mesh, config=cfg,
        total_steps=100,
    )

    b = args.batch * n_dev
    rng = np.random.RandomState(0)
    if args.pack:
        args.var_len = True

    def row_lengths(rows, seq):
        if not args.var_len:
            return np.full(rows, max(1, int(seq * (1 - args.pad_frac))))
        mean = max(1.0, seq * (1 - args.pad_frac))
        lens = rng.normal(mean, 0.4 * mean, size=rows)
        return np.clip(lens.round(), 1, seq).astype(int)

    def block(rows, seq):
        ids = rng.randint(
            5, args.vocab, (args.accum, rows, seq)
        ).astype(np.int32)
        mask = np.ones((args.accum, rows, seq), np.int32)
        for a in range(args.accum):
            for i, L in enumerate(row_lengths(rows, seq)):
                mask[a, i, L:] = 0
        ids = np.where(mask > 0, ids, 0)
        return {"input_ids": ids, "attention_mask": mask}

    def packed_block(rows, seq):
        import jax.tree_util as jtu

        from rankpo_tpu.data.loader import _stack_microbatches
        from rankpo_tpu.data.packing import _BlockPacker

        packer = _BlockPacker(
            seq, args.pack_max_segments, 0, rows_multiple=n_dev
        )
        steps = []
        for a in range(args.accum):
            seqs = [
                list(rng.randint(5, args.vocab, L))
                for L in row_lengths(rows, seq)
            ]
            steps.append(packer(seqs))
        return jtu.tree_map_with_path(_stack_microbatches, *steps)

    make_block = packed_block if args.pack else block
    batch = {
        "query": make_block(b, args.q_seq),
        "passage": make_block(b * args.group, args.p_seq),
    }
    if args.pack:
        qs = batch["query"]["input_ids"].shape
        ps = batch["passage"]["input_ids"].shape
        print(f"packed rows: query {qs} passage {ps} "
              f"(unpacked: {(args.accum, b, args.q_seq)} / "
              f"{(args.accum, b * args.group, args.p_seq)})",
              file=sys.stderr, flush=True)
    key = jax.random.key(0)

    metrics = trainer.train_step(batch, key)  # compile
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        metrics = trainer.train_step(batch, key)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.steps

    result = {
        "metric": "contrastive_samples_per_sec_per_chip",
        "value": round(b * args.accum / dt / n_dev, 3),
        "unit": "samples/sec/chip",
        "step_time_s": round(dt, 4),
        "params_m": round(n_params / 1e6, 1),
        "attn": args.attn,
        "config": {
            "batch": b, "group": args.group, "accum": args.accum,
            "pure_bf16": args.pure_bf16, "grad_cache": args.grad_cache,
            "q_seq": args.q_seq, "p_seq": args.p_seq,
            "hidden": args.hidden, "layers": args.layers, "remat": args.remat,
        },
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
