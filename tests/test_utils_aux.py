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
