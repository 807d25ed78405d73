"""Per-layer activation parity vs transformers for an HF checkpoint.

SURVEY.md hard-part #3: "HF weight import — parity dies silently here; test by
comparing per-layer activations on one example." Usage:

    python benchmarks/parity_check.py --model_path /path/to/hf-checkpoint \
        [--seq 16] [--atol 2e-4]

Loads the checkpoint with BOTH transformers (torch, eager attention, hidden
states on) and rankpo_tpu (fp32 XLA attention), runs one batch, and reports
the max abs error AFTER EVERY LAYER (pre-final-norm states for llama, post-
layer states for bert/roberta) plus the final hidden state. Exits nonzero on
mismatch, naming the first diverging layer — exactly where a weight-mapping
bug would hide.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _our_layerwise(config, params, ids_j, mask_j):
    """Replicate the model's scan manually, collecting per-layer states."""
    import jax
    import jax.numpy as jnp

    from rankpo_tpu.models import llama as lm, roberta as rb

    states = []
    if config.is_llama:
        x = params["embed_tokens"]["weight"][ids_j].astype(jnp.float32)
        states.append(np.asarray(x))
        b, s = ids_j.shape
        positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        cos, sin = lm.rope_cos_sin(config, positions)
        key_mask = mask_j.astype(bool)
        L = config.num_hidden_layers
        for i in range(L):
            lp = jax.tree_util.tree_map(lambda p: p[i], params["layers"])
            x = lm._layer(config, x, lp, cos, sin, key_mask, "xla")
            states.append(np.asarray(x))
        final = lm.rms_norm(x, params["norm"]["weight"], config.rms_norm_eps)
        states.append(np.asarray(final))
    else:
        emb = params["embeddings"]
        b, s = ids_j.shape
        if config.model_type == "bert":
            pos_ids = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        else:
            pad = config.pad_token_id if config.pad_token_id is not None else 1
            pos_ids = rb.roberta_position_ids(ids_j, pad)
        x = (
            emb["word_embeddings"]["weight"][ids_j]
            + emb["position_embeddings"]["weight"][pos_ids]
            + emb["token_type_embeddings"]["weight"][jnp.zeros_like(ids_j)]
        ).astype(jnp.float32)
        x = rb.layer_norm(
            x, emb["layer_norm"]["weight"], emb["layer_norm"]["bias"],
            config.layer_norm_eps,
        )
        states.append(np.asarray(x))
        key_mask = mask_j.astype(bool)
        for i in range(config.num_hidden_layers):
            lp = jax.tree_util.tree_map(lambda p: p[i], params["layers"])
            x = rb._layer(config, x, lp, key_mask, None, True, "xla")
            states.append(np.asarray(x))
        states.append(np.asarray(x))  # no extra final norm for bert family
    return states


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

    hf = AutoModel.from_pretrained(
        args.model_path, attn_implementation="eager"
    ).eval()
    config, params = load_pretrained(args.model_path)

    rng = np.random.RandomState(0)
    ids = rng.randint(5, config.vocab_size, (args.batch, args.seq))
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
    ref = [h.numpy() for h in out.hidden_states]  # embed, after L1..LN(+norm)

    ours = _our_layerwise(config, params, jnp.asarray(ids), jnp.asarray(mask))
    valid = mask.astype(bool)

    # transformers' hidden_states: [embed, layer1..layerN] where the LAST entry
    # includes the final norm for llama; ours appends the final separately
    n_layers = config.num_hidden_layers
    print(f"{'stage':<22} max abs err (valid tokens)")
    failed = None
    pairs = [("embeddings", ours[0], ref[0])]
    for i in range(1, n_layers):
        pairs.append((f"after layer {i}", ours[i], ref[i]))
    pairs.append(("final hidden state", ours[-1], ref[-1]))
    for name, a, b in pairs:
        err = float(np.abs(a - b)[valid].max())
        marker = "" if err < args.atol else "   <-- DIVERGES"
        print(f"{name:<22} {err:.3e}{marker}")
        if err >= args.atol and failed is None:
            failed = name
    if failed:
        print(f"PARITY FAILED at: {failed} (atol {args.atol})")
        sys.exit(1)
    print("PARITY OK")


if __name__ == "__main__":
    main()
