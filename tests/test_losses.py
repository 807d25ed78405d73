"""Loss math tests: hand-computed values, torch cross-checks, and the
cross-device all_gather path on a virtual 8-device mesh (SURVEY.md §4 item 1-2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from rankpo_tpu.losses import (
    info_nce_loss,
    rankpo_batch_loss,
    rankpo_loss,
    sft_loss,
    similarity_scores,
)
from rankpo_tpu.losses.contrastive import validate_temperature


def _np_softmax_ce(logits, targets):
    logits = logits - logits.max(-1, keepdims=True)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    return -np.mean(logp[np.arange(len(targets)), targets])


class TestInfoNCE:
    def test_inbatch_targets_arange_times_group(self):
        """The target-index rule of modeling.py:301-302."""
        rng = np.random.RandomState(0)
        b, g, h = 4, 3, 8
        q = rng.randn(b, h).astype(np.float32)
        p = rng.randn(b * g, h).astype(np.float32)
        t = 0.05
        loss, scores = info_nce_loss(
            jnp.asarray(q), jnp.asarray(p), temperature=t, use_inbatch_neg=True
        )
        expected_scores = q @ p.T / t
        np.testing.assert_allclose(np.asarray(scores), expected_scores, rtol=1e-5)
        expected = _np_softmax_ce(expected_scores, np.arange(b) * g)
        np.testing.assert_allclose(float(loss), expected, rtol=1e-5)

    def test_no_inbatch_grouped_target_zero(self):
        """modeling.py:305-311: per-group scores with positive at index 0."""
        rng = np.random.RandomState(1)
        b, g, h = 3, 4, 8
        q = rng.randn(b, h).astype(np.float32)
        p = rng.randn(b * g, h).astype(np.float32)
        loss, scores = info_nce_loss(
            jnp.asarray(q), jnp.asarray(p), temperature=0.1, use_inbatch_neg=False
        )
        expected_scores = np.einsum("bh,bgh->bg", q, p.reshape(b, g, h)) / 0.1
        np.testing.assert_allclose(
            np.asarray(scores), expected_scores, rtol=1e-5
        )
        expected = _np_softmax_ce(expected_scores, np.zeros(b, int))
        np.testing.assert_allclose(float(loss), expected, rtol=1e-5)

    def test_torch_cross_entropy_parity(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(2)
        b, g, h = 4, 2, 16
        q = rng.randn(b, h).astype(np.float32)
        p = rng.randn(b * g, h).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        p /= np.linalg.norm(p, axis=-1, keepdims=True)
        loss, _ = info_nce_loss(
            jnp.asarray(q), jnp.asarray(p), temperature=0.02, use_inbatch_neg=True
        )
        tq, tp = torch.tensor(q), torch.tensor(p)
        scores = tq @ tp.T / 0.02
        target = torch.arange(b, dtype=torch.long) * g
        ref = torch.nn.functional.cross_entropy(scores, target)
        np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)

    def test_cross_device_equals_global(self, data_mesh):
        """all_gather path inside shard_map == single-device on the full batch
        (negatives_cross_device semantics, modeling.py:287-290)."""
        rng = np.random.RandomState(3)
        b, g, h = 16, 2, 8  # global batch divisible by 8 devices
        q = rng.randn(b, h).astype(np.float32)
        p = rng.randn(b * g, h).astype(np.float32)

        global_loss, _ = info_nce_loss(
            jnp.asarray(q), jnp.asarray(p), temperature=0.05
        )

        @jax.jit
        def sharded(qd, pd):
            def inner(qs, ps):
                loss, _ = info_nce_loss(
                    qs, ps, temperature=0.05, axis_name="data"
                )
                return loss

            f = shard_map(
                inner,
                mesh=data_mesh,
                in_specs=(P("data"), P("data")),
                out_specs=P(),
            )
            return f(qd, pd)

        loss = sharded(jnp.asarray(q), jnp.asarray(p))
        np.testing.assert_allclose(float(loss), float(global_loss), rtol=1e-5)

    def test_cross_device_gradient_exact(self, data_mesh):
        """Collective VJP: sharded gradient == global gradient (the property the
        reference approximates with the SimCLR trick + DDP averaging)."""
        rng = np.random.RandomState(4)
        b, g, h = 8, 2, 4
        q = rng.randn(b, h).astype(np.float32)
        p = rng.randn(b * g, h).astype(np.float32)

        def global_loss(q, p):
            return info_nce_loss(q, p, temperature=0.1)[0]

        gq, gp = jax.grad(global_loss, argnums=(0, 1))(
            jnp.asarray(q), jnp.asarray(p)
        )

        def sharded_loss(qd, pd):
            def inner(qs, ps):
                return info_nce_loss(qs, ps, temperature=0.1, axis_name="data")[0]

            return shard_map(
                inner, mesh=data_mesh, in_specs=(P("data"), P("data")), out_specs=P()
            )(qd, pd)

        sq, sp = jax.jit(jax.grad(sharded_loss, argnums=(0, 1)))(
            jnp.asarray(q), jnp.asarray(p)
        )
        np.testing.assert_allclose(np.asarray(sq), np.asarray(gq), atol=1e-5)
        np.testing.assert_allclose(np.asarray(sp), np.asarray(gp), atol=1e-5)

    def test_temperature_guards(self):
        assert validate_temperature(False, 0.02) == 1.0
        assert validate_temperature(True, 0.02) == 0.02
        with pytest.raises(ValueError):
            validate_temperature(True, 0.7)


class TestRankPO:
    def test_sigmoid_hand_value(self):
        """−logσ(β·((c−r)/T − γ/β)) with ls=0."""
        c = jnp.array([0.8])
        r = jnp.array([0.6])
        beta, temp, gbr = 2.0, 0.1, 0.0
        out = rankpo_loss(
            c, r, beta=beta, temperature=temp, gamma_beta_ratio=gbr,
            loss_type="sigmoid",
        )
        adv = (0.8 - 0.6) / 0.1
        expected = -np.log(1 / (1 + np.exp(-beta * adv)))
        np.testing.assert_allclose(float(out[0]), expected, rtol=1e-5)

    def test_label_smoothing(self):
        c = jnp.array([0.5])
        r = jnp.array([0.1])
        ls = 0.2
        out = rankpo_loss(
            c, r, beta=1.0, temperature=1.0, loss_type="sigmoid", label_smoothing=ls
        )
        z = 0.4
        sig = lambda x: 1 / (1 + np.exp(-x))
        expected = -np.log(sig(z)) * (1 - ls) - np.log(sig(-z)) * ls
        np.testing.assert_allclose(float(out[0]), expected, rtol=1e-5)

    def test_hinge(self):
        c = jnp.array([0.3, 0.9])
        r = jnp.array([0.2, 0.1])
        out = rankpo_loss(
            c, r, beta=2.0, temperature=1.0, loss_type="hinge"
        )
        expected = np.maximum(1 - 2.0 * np.array([0.1, 0.8]), 0.0)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-6)

    def test_reference_model_margin_subtraction(self):
        c, r = jnp.array([0.9]), jnp.array([0.2])
        rc, rr = jnp.array([0.5]), jnp.array([0.3])
        with_ref = rankpo_loss(
            c, r, rc, rr, beta=1.0, temperature=1.0, loss_type="sigmoid"
        )
        # equivalent to reference-free with adv already reduced by ref margin
        equiv = rankpo_loss(
            jnp.array([0.9 - 0.5]), jnp.array([0.2 - 0.3]),
            beta=1.0, temperature=1.0, loss_type="sigmoid",
        )
        np.testing.assert_allclose(np.asarray(with_ref), np.asarray(equiv), rtol=1e-6)

    def test_torch_logsigmoid_parity(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(5)
        c = rng.randn(16).astype(np.float32)
        r = rng.randn(16).astype(np.float32)
        beta, temp, gbr, ls = 2.0, 0.1, 0.3, 0.1
        ours = rankpo_loss(
            jnp.asarray(c), jnp.asarray(r), beta=beta, temperature=temp,
            gamma_beta_ratio=gbr, loss_type="sigmoid", label_smoothing=ls,
        )
        tc, tr = torch.tensor(c), torch.tensor(r)
        logits = (tc - tr) / temp - gbr
        F = torch.nn.functional
        ref = -F.logsigmoid(beta * logits) * (1 - ls) - F.logsigmoid(-beta * logits) * ls
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5)

    def test_sft_loss_own_temperature(self):
        """The SFT branch divides raw scores by T independently
        (rankpo_trainer.py:500) — not the advantage."""
        scores = jnp.array([[0.9, 0.3], [0.2, 0.8]])
        t = 0.1
        out = sft_loss(scores, t)
        expected = _np_softmax_ce(np.asarray(scores) / t, np.zeros(2, int))
        np.testing.assert_allclose(float(out), expected, rtol=1e-5)

    def test_batch_loss_metrics(self):
        scores = jnp.array([[0.9, 0.3], [0.2, 0.8]])
        loss, metrics = rankpo_batch_loss(
            scores, beta=2.0, temperature=0.1, loss_type="sigmoid",
            rankpo_weight=1.0, sft_weight=0.5,
        )
        assert "rankpo_loss" in metrics and "sft_loss" in metrics
        np.testing.assert_allclose(
            float(loss),
            float(metrics["rankpo_loss"]) + 0.5 * float(metrics["sft_loss"]),
            rtol=1e-6,
        )
        np.testing.assert_allclose(float(metrics["rewards/accuracies"]), 0.5)
        np.testing.assert_allclose(
            float(metrics["scores/margins"]), (0.6 - 0.6) / 2, atol=1e-6
        )

    def test_similarity_scores(self):
        q = jnp.array([[1.0, 0.0], [0.0, 1.0]])
        p = jnp.array([[1.0, 0.0], [0.5, 0.5]])
        s = similarity_scores(q, p)
        np.testing.assert_allclose(np.asarray(s), [[1.0, 0.5], [0.0, 0.5]])
