"""Cross-accumulation in-batch negatives (GradCache-style) for contrastive
training.

The reference's gradient accumulation (batch 8 × accum 4, scripts/train/
run_contrastive.sh) computes InfoNCE per MICROBATCH — negatives never cross
accumulation steps, so the effective negative pool is 8·G, not 32·G. The
gradient-cache technique (Gao et al.; cf. "A Gradient Accumulation Method for
Dense Retriever under Memory Constraint", arXiv:2406.12356) decouples the two:

  pass 1: lax.scan the encoder over microbatches, collecting ONLY the pooled
          reps (activations freed per step);
  bridge: InfoNCE on the full [accum·B] rep matrix; grab d(loss)/d(reps) —
          a tiny [accum·B, H] cotangent;
  pass 2: lax.scan again, re-running each microbatch under jax.vjp and pulling
          the rep cotangents back to parameter gradients, summed across steps.

Cost: one extra encoder forward (same as remat); peak memory: ONE microbatch's
activations. Result: gradients IDENTICAL to a single huge-batch InfoNCE step
(verified in tests), i.e. the full global negative pool at accumulation-step
memory. Composes with cross-device negatives (the rep loss runs on global
arrays under GSPMD).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from rankpo_tpu.losses.contrastive import info_nce_loss, validate_temperature
from rankpo_tpu.models.config import EncoderConfig
from rankpo_tpu.train.steps import _embed_field


def make_contrastive_gradcache_grad_fn(
    model_config: EncoderConfig,
    *,
    temperature: float = 0.02,
    normalize_embeddings: bool = True,
    use_inbatch_neg: bool = True,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    remat_policy: str = "full",
    attn_impl: str = "auto",
    mesh=None,
) -> Callable:
    """Returns grad_fn(params, batch, rng) -> (loss, metrics, grads) for the
    Trainer's gradient-cache path. ``batch`` leaves are [accum, rows, seq].

    Sequence-packed microbatches (data/packing.py collators: blocks carry
    'segment_ids' + 'slot_index' + 'slots') work unchanged: each scan step
    embeds its packed rows and scatters per-segment reps back to batch
    order, so the bridge sees the same [accum*B, H] rep matrix as the plain
    path and the gradient contract (identical to one full-batch InfoNCE)
    carries over — per-chunk packing composes with cross-chunk negatives.
    """
    temperature = validate_temperature(normalize_embeddings, temperature)

    def embed_pair(params, mb, rng):
        dq, dp = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        kwargs = dict(
            normalize=normalize_embeddings,
            compute_dtype=compute_dtype,
            remat=remat,
            remat_policy=remat_policy,
            attn_impl=attn_impl,
            mesh=mesh,
        )
        q = _embed_field(
            params, model_config, mb["query"],
            deterministic=rng is None, dropout_key=dq, **kwargs,
        )
        p = _embed_field(
            params, model_config, mb["passage"],
            deterministic=rng is None, dropout_key=dp, **kwargs,
        )
        return q, p

    def grad_fn(params, batch, rng):
        accum = batch["query"]["input_ids"].shape[0]
        rngs = jax.random.split(rng, accum) if rng is not None else None

        # ---- pass 1: reps only (activations die with each scan step) ----
        def fwd(_, inp):
            mb, r = inp
            return None, embed_pair(params, mb, r)

        xs = (batch, rngs) if rngs is not None else (batch, jnp.zeros((accum,)))
        if rngs is None:
            def fwd(_, inp):  # noqa: F811 — deterministic variant
                mb, _unused = inp
                return None, embed_pair(params, mb, None)
        _, (q_stack, p_stack) = jax.lax.scan(fwd, None, xs)
        h = q_stack.shape[-1]
        q_all = q_stack.reshape(-1, h)
        p_all = p_stack.reshape(-1, h)

        # ---- bridge: full-batch InfoNCE + rep cotangents ----
        def rep_loss(q, p):
            loss, scores = info_nce_loss(
                q, p, temperature=temperature, use_inbatch_neg=use_inbatch_neg
            )
            b = q.shape[0]
            g = p.shape[0] // b
            targets = (
                jnp.arange(b) * g if use_inbatch_neg else jnp.zeros(b, jnp.int32)
            )
            acc = jnp.mean(
                (jnp.argmax(scores, axis=-1) == targets).astype(jnp.float32)
            )
            return loss, acc

        (loss, accuracy), (dq_all, dp_all) = jax.value_and_grad(
            rep_loss, argnums=(0, 1), has_aux=True
        )(q_all, p_all)
        dq_stack = dq_all.reshape(q_stack.shape)
        dp_stack = dp_all.reshape(p_stack.shape)

        # ---- pass 2: pull rep cotangents back to parameter gradients ----
        def bwd(grads_acc, inp):
            if rngs is not None:
                mb, r, dq, dp = inp
            else:
                mb, _unused, dq, dp = inp
                r = None
            _, vjp = jax.vjp(lambda prm: embed_pair(prm, mb, r), params)
            (gp,) = vjp((dq, dp))
            return jax.tree_util.tree_map(jnp.add, grads_acc, gp), None

        grads0 = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, x.dtype), params
        )
        xs2 = (batch, rngs if rngs is not None else jnp.zeros((accum,)),
               dq_stack, dp_stack)
        grads, _ = jax.lax.scan(bwd, grads0, xs2)

        return loss, {"accuracy": accuracy}, grads

    return grad_fn
