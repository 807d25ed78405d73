"""Blockwise 8-bit AdamW (train/optim8bit.py): storage really is 8-bit,
updates track fp32 AdamW closely, training converges, ZeRO-1 shards the
quantized state, and the adafactor option works end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from rankpo_tpu.train.optim8bit import adamw8bit, scale_by_adam8bit


class TestQuantizedState:
    def test_state_dtypes_and_shapes(self):
        params = {"w": jnp.zeros((10, 300)), "b": jnp.zeros((7,))}
        tx = scale_by_adam8bit(block=256)
        state = tx.init(params)
        assert state.mu_q["w"].dtype == jnp.int8
        assert state.nu_q["w"].dtype == jnp.uint8
        assert state.mu_q["w"].shape == (12, 256)  # 3000 -> 12 blocks
        assert state.mu_scale["w"].shape == (12,)
        assert state.mu_q["b"].shape == (1, 256)  # padded

    def test_memory_is_quarter_of_fp32(self):
        params = {"w": jnp.zeros((1024, 1024), jnp.float32)}
        tx = scale_by_adam8bit(block=256)
        state = tx.init(params)
        moment_bytes = sum(
            x.size * x.dtype.itemsize
            for tree in (state.mu_q, state.mu_scale, state.nu_q,
                         state.nu_scale)
            for x in jax.tree_util.tree_leaves(tree)
        )
        fp32_moment_bytes = 2 * params["w"].size * 4
        assert moment_bytes < fp32_moment_bytes * 0.27  # 2x int8 + scales

    def test_first_update_matches_adam_exactly(self):
        # after one step from zero state, quantization error is the only
        # divergence; the update direction must match fp32 Adam tightly
        params = {"w": jnp.ones((4, 130))}
        g = {"w": jnp.asarray(np.random.RandomState(0).randn(4, 130), jnp.float32)}
        tx8 = scale_by_adam8bit(block=256)
        tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        u8, _ = tx8.update(g, tx8.init(params), params)
        u, _ = tx.update(g, tx.init(params), params)
        np.testing.assert_allclose(
            np.asarray(u8["w"]), np.asarray(u["w"]), atol=5e-2, rtol=5e-2
        )

    def test_moments_survive_quantization_over_steps(self):
        # run K steps with CONSTANT gradient: mu converges to g, nu to g^2;
        # an over-lossy code would drift. Check the implied update ~ sign(g).
        rng = np.random.RandomState(1)
        g = {"w": jnp.asarray(rng.randn(8, 64) * 3.0, jnp.float32)}
        params = {"w": jnp.zeros((8, 64))}
        tx = scale_by_adam8bit(block=256)
        state = tx.init(params)
        for _ in range(20):
            upd, state = tx.update(g, state, params)
        expect = np.sign(np.asarray(g["w"]))
        got = np.asarray(upd["w"])
        # ~6-7% relative error is the log-code design point (20-octave mu,
        # 40-octave nu); a lossier code (e.g. the linear one this replaced)
        # lands far outside this bound
        np.testing.assert_allclose(got, expect, atol=0.1)


@pytest.mark.slow
class TestConvergenceParity:
    def _train(self, optim_name):
        # tiny least-squares: loss curves of adamw vs adamw8bit must agree
        rng = np.random.RandomState(0)
        X = jnp.asarray(rng.randn(64, 16), jnp.float32)
        w_true = jnp.asarray(rng.randn(16, 4), jnp.float32)
        Y = X @ w_true

        def loss_fn(w):
            return jnp.mean((X @ w - Y) ** 2)

        if optim_name == "adamw8bit":
            tx = adamw8bit(1e-2, weight_decay=0.0)
        else:
            tx = optax.adamw(1e-2, weight_decay=0.0)
        w = jnp.zeros((16, 4))
        state = tx.init(w)
        losses = []
        for _ in range(200):
            loss, g = jax.value_and_grad(loss_fn)(w)
            upd, state = tx.update(g, state, w)
            w = optax.apply_updates(w, upd)
            losses.append(float(loss))
        return losses

    def test_loss_curves_match(self):
        base = self._train("adamw")
        q8 = self._train("adamw8bit")
        assert q8[-1] < base[0] * 0.05  # it converges
        # final losses agree with the fp32 optimizer (measured: 0.537 vs
        # 0.573 on this problem) and the whole curve stays close
        assert q8[-1] < base[-1] * 1.5
        for a, b in zip(base[::20], q8[::20]):
            assert b < max(a * 2.0, 1e-4)


@pytest.mark.slow
class TestTrainerIntegration:
    @pytest.mark.parametrize("optim", ["adamw8bit", "adafactor"])
    def test_trainer_step_and_zero1_sharding(self, data_mesh, tmp_path, optim):
        from rankpo_tpu.core.mesh import DATA_AXIS
        from rankpo_tpu.models import init_params, tiny_llama_config
        from rankpo_tpu.train import TrainConfig, Trainer, make_contrastive_loss_fn

        model_cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(0), model_cfg)
        loss_fn = make_contrastive_loss_fn(
            model_cfg, temperature=0.05, compute_dtype=jnp.float32
        )
        cfg = TrainConfig(
            output_dir=str(tmp_path), learning_rate=1e-3,
            warmup_steps=0, warmup_ratio=0.0, lr_scheduler_type="constant",
            per_device_train_batch_size=1, zero1=True, optim=optim,
            save_strategy="no",
        )
        trainer = Trainer(loss_fn=loss_fn, params=params, mesh=data_mesh,
                          config=cfg, total_steps=4)
        if optim == "adamw8bit":
            # quantized moment codes are data-sharded like any moment
            inner = trainer.state.opt_state[1][0]
            leaf = inner.mu_q["layers"]["q_proj"]["kernel"]
            assert leaf.dtype == jnp.int8
            assert DATA_AXIS in tuple(leaf.sharding.spec), leaf.sharding.spec
        rng = np.random.RandomState(0)
        b = data_mesh.devices.size
        batch = {
            "query": {
                "input_ids": rng.randint(5, 256, (1, b, 16)).astype(np.int32),
                "attention_mask": np.ones((1, b, 16), np.int32),
            },
            "passage": {
                "input_ids": rng.randint(5, 256, (1, b * 2, 16)).astype(np.int32),
                "attention_mask": np.ones((1, b * 2, 16), np.int32),
            },
        }
        losses = [
            float(trainer.train_step(batch, jax.random.key(1))["loss"])
            for _ in range(6)
        ]
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_checkpoint_round_trip_bit_exact(self, data_mesh, tmp_path):
        """int8/uint8 moment codes + scales must survive the orbax opt-state
        round trip bit-exactly (save_only_model=False path) — quantized
        dtypes through the checkpointer are a real risk surface."""
        import jax.numpy as jnp

        from rankpo_tpu.models import init_params, tiny_llama_config
        from rankpo_tpu.train import (
            TrainConfig, Trainer, make_contrastive_loss_fn,
        )

        model_cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(0), model_cfg)
        loss_fn = make_contrastive_loss_fn(
            model_cfg, temperature=0.05, compute_dtype=jnp.float32
        )
        cfg = TrainConfig(
            output_dir=str(tmp_path), learning_rate=1e-3, warmup_steps=0,
            warmup_ratio=0.0, lr_scheduler_type="constant",
            per_device_train_batch_size=1, zero1=True, optim="adamw8bit",
            save_strategy="steps", save_steps=2, save_only_model=False,
        )
        tr = Trainer(loss_fn=loss_fn, params=params, mesh=data_mesh,
                     config=cfg, total_steps=4)
        rng = np.random.RandomState(0)
        b = data_mesh.devices.size
        batch = {
            "query": {
                "input_ids": rng.randint(5, 256, (1, b, 16)).astype(np.int32),
                "attention_mask": np.ones((1, b, 16), np.int32),
            },
            "passage": {
                "input_ids": rng.randint(5, 256, (1, b * 2, 16)).astype(np.int32),
                "attention_mask": np.ones((1, b * 2, 16), np.int32),
            },
        }
        for _ in range(2):
            tr.train_step(batch, jax.random.key(1))
        ck = tr.save_checkpoint(2, 0)
        tr2 = Trainer(loss_fn=loss_fn, params=params, mesh=data_mesh,
                      config=cfg, total_steps=4)
        tr2.resume_from(ck)
        ref, res = tr.state.opt_state[1][0], tr2.state.opt_state[1][0]
        for field in ("mu_q", "mu_scale", "nu_q", "nu_scale"):
            a = np.asarray(getattr(ref, field)["layers"]["q_proj"]["kernel"])
            c = np.asarray(getattr(res, field)["layers"]["q_proj"]["kernel"])
            assert a.dtype == c.dtype
            np.testing.assert_array_equal(a, c)
        assert int(res.count) == 2
        out = tr2.train_step(batch, jax.random.key(2))
        assert bool(jnp.isfinite(out["loss"]))

    def test_unknown_optim_raises(self, tmp_path):
        from rankpo_tpu.train.config import TrainConfig
        from rankpo_tpu.train.state import make_optimizer

        with pytest.raises(ValueError, match="optim"):
            make_optimizer(
                TrainConfig(output_dir=str(tmp_path), optim="sgd"), 10
            )
