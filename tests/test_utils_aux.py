"""Aux subsystem tests: process splitter semantics, NaN-guard updates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankpo_tpu.utils.distributed import split_between_processes


class TestSplitBetweenProcesses:
    def test_contiguous_default(self):
        """Reference docstring example (utils.py:199-204): ceil split to the
        first processes, last process repeats."""
        inputs = [1, 2, 3, 4, 5, 6, 7, 8, 9]
        got = [
            split_between_processes(inputs, process_index=i, process_count=4)
            for i in range(4)
        ]
        assert got[0] == [1, 2, 3]
        assert got[1] == [4, 5, 6]
        assert got[2] == [7, 8, 9]
        assert got[3] == [9]  # start beyond end -> repeat last

    def test_evenly_split(self):
        """Reference example (utils.py:207-212)."""
        inputs = [1, 2, 3, 4, 5, 6, 7, 8, 9]
        got = [
            split_between_processes(
                inputs, evenly_split=True, process_index=i, process_count=4
            )
            for i in range(4)
        ]
        assert got == [[1, 2, 3], [4, 5], [6, 7], [8, 9]]

    def test_padding_equalizes(self):
        inputs = [1, 2, 3, 4, 5]
        got = [
            split_between_processes(
                inputs, apply_padding=True, evenly_split=True,
                process_index=i, process_count=4,
            )
            for i in range(4)
        ]
        assert all(len(g) == 2 for g in got)
        assert got[3] == [5, 5]

    def test_dict_input(self):
        inputs = {"a": [1, 2, 3, 4], "b": ["w", "x", "y", "z"]}
        got = split_between_processes(inputs, process_index=1, process_count=2)
        assert got == {"a": [3, 4], "b": ["y", "z"]}

    def test_dict_length_mismatch_raises(self):
        with pytest.raises(ValueError):
            split_between_processes(
                {"a": [1], "b": [1, 2]}, process_index=0, process_count=2
            )

    def test_single_process_passthrough(self):
        inputs = [1, 2]
        assert split_between_processes(inputs, process_index=0,
                                       process_count=1) is inputs


class TestNaNGuard:
    def test_nonfinite_step_keeps_params(self, data_mesh, tmp_path):
        from rankpo_tpu.train import TrainConfig, Trainer

        params = {"w": jnp.ones((8, 8))}

        def loss_fn(p, batch, rng):
            # loss is NaN whenever the batch flag says so
            flag = batch["flag"][0]
            loss = jnp.sum(p["w"] ** 2) * jnp.where(flag > 0, jnp.nan, 1.0)
            return loss, {}

        cfg = TrainConfig(
            output_dir=str(tmp_path), learning_rate=0.1, warmup_ratio=0.0,
            lr_scheduler_type="constant", per_device_train_batch_size=1,
            skip_nonfinite_updates=True, save_strategy="no", max_grad_norm=0.0,
        )
        trainer = Trainer(loss_fn=loss_fn, params=params, mesh=data_mesh,
                          config=cfg, total_steps=4)
        before = np.asarray(jax.device_get(trainer.state.params["w"]))

        bad = {"flag": np.ones((1, 8), np.int32)}
        metrics = trainer.train_step(bad, jax.random.key(0))
        assert not np.isfinite(metrics["loss"])
        after_bad = np.asarray(jax.device_get(trainer.state.params["w"]))
        np.testing.assert_array_equal(after_bad, before)  # update skipped

        good = {"flag": np.zeros((1, 8), np.int32)}
        trainer.train_step(good, jax.random.key(0))
        after_good = np.asarray(jax.device_get(trainer.state.params["w"]))
        assert not np.array_equal(after_good, before)  # real update applied


class TestFlopsAccounting:
    """Analytic model-FLOPs math (utils/flops.py) — the total_flos analog
    (reference contrastive_trainer.py:546,674-675)."""

    def _cfg(self):
        from rankpo_tpu.models.config import EncoderConfig

        return EncoderConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, vocab_size=64,
            hidden_act="silu",
        )

    def test_encoder_fwd_flops_hand_computed(self):
        from rankpo_tpu.utils.flops import encoder_fwd_flops

        cfg = self._cfg()
        h, f, s = 64, 128, 8
        head_dim = h // 4
        q_dim, kv_dim = 4 * head_dim, 2 * head_dim
        proj = 2 * h * (q_dim + 2 * kv_dim) + 2 * q_dim * h
        mlp = 6 * h * f  # gated silu: gate + up + down
        attn = 4 * q_dim * (s / 2)  # causal
        expect = 2 * (proj + mlp + attn) * s  # L=2 layers, s tokens
        assert encoder_fwd_flops(cfg, s, causal=True) == expect
        # non-causal doubles only the attention term
        expect_nc = 2 * (proj + mlp + 4 * q_dim * s) * s
        assert encoder_fwd_flops(cfg, s, causal=False) == expect_nc

    def test_sample_flops_composition(self):
        from rankpo_tpu.utils.flops import (
            contrastive_sample_flops,
            encoder_fwd_flops,
            rankpo_sample_flops,
        )

        cfg = self._cfg()
        fq = encoder_fwd_flops(cfg, 8)
        fp = encoder_fwd_flops(cfg, 16)
        assert contrastive_sample_flops(
            cfg, query_len=8, passage_len=16, group_size=3
        ) == 3.0 * (fq + 3 * fp)
        # reference model adds one forward (4x vs 3x)
        rf = rankpo_sample_flops(cfg, query_len=8, passage_len=16,
                                 reference_free=True)
        with_ref = rankpo_sample_flops(cfg, query_len=8, passage_len=16,
                                       reference_free=False)
        assert rf == 3.0 * (fq + 2 * fp)
        assert with_ref == 4.0 * (fq + 2 * fp)

    def test_peak_override(self, monkeypatch):
        from rankpo_tpu.utils import flops

        monkeypatch.setenv("RANKPO_PEAK_TFLOPS", "197")
        assert flops.peak_flops_per_chip() == 197e12
