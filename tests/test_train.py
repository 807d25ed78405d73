"""Trainer tests on the virtual 8-device mesh: end-to-end smoke for both
stages, grad-accumulation equivalence, ZeRO-1 sharding, schedules, resume."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from rankpo_tpu.core.mesh import DATA_AXIS, MeshConfig, make_mesh
from rankpo_tpu.data import (
    ContrastiveCollator,
    ContrastiveDataset,
    HashTokenizer,
    PairPreferenceDataset,
    RankPOCollator,
)
from rankpo_tpu.losses.contrastive import info_nce_block_loss, info_nce_loss
from rankpo_tpu.models import init_params, tiny_llama_config, save_pretrained
from rankpo_tpu.train import (
    TrainConfig,
    Trainer,
    make_contrastive_loss_fn,
    make_rankpo_loss_fn,
)
from rankpo_tpu.train.state import make_schedule


@pytest.fixture(scope="module")
def tok():
    return HashTokenizer(vocab_size=256)


def _contrastive_rows(n=32, n_neg=6):
    return [
        {
            "query": f"common topic {i} alpha beta",
            "positives": [f"common topic {i} gamma delta"],
            "negatives": [f"other {j} {i} unrelated" for j in range(n_neg)],
        }
        for i in range(n)
    ]


class TestBlockLoss:
    def test_one_block_equals_global(self):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(8, 16).astype(np.float32))
        p = jnp.asarray(rng.randn(16, 16).astype(np.float32))
        a, _ = info_nce_loss(q, p, temperature=0.1)
        b, _ = info_nce_block_loss(q, p, num_blocks=1, temperature=0.1)
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

    def test_blocks_mean_of_per_block_ce(self):
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(8, 16).astype(np.float32))
        p = jnp.asarray(rng.randn(16, 16).astype(np.float32))
        whole, _ = info_nce_block_loss(q, p, num_blocks=4, temperature=0.1)
        per = [
            info_nce_loss(q[2 * i : 2 * i + 2], p[4 * i : 4 * i + 4],
                          temperature=0.1)[0]
            for i in range(4)
        ]
        np.testing.assert_allclose(float(whole), float(np.mean(per)), rtol=1e-5)


class TestSchedule:
    def test_warmup_cosine(self):
        cfg = TrainConfig(learning_rate=1e-3, warmup_steps=10,
                          lr_scheduler_type="cosine")
        sched = make_schedule(cfg, total_steps=110)
        assert float(sched(0)) == 0.0
        np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
        assert float(sched(60)) < 1e-3
        assert float(sched(109)) < float(sched(60))

    def test_linear_and_constant(self):
        cfg = TrainConfig(learning_rate=1.0, warmup_steps=0, warmup_ratio=0.0,
                          lr_scheduler_type="linear")
        sched = make_schedule(cfg, total_steps=100)
        np.testing.assert_allclose(float(sched(50)), 0.5, rtol=1e-6)
        cfg = TrainConfig(learning_rate=2.0, warmup_steps=0, warmup_ratio=0.0,
                          lr_scheduler_type="constant")
        sched = make_schedule(cfg, total_steps=100)
        np.testing.assert_allclose(float(sched(99)), 2.0)


def _make_trainer(mesh, tmp_path, tok, accum=1, zero1=True, total_steps=8,
                  save_only_model=True, cfg_extra=None, trainer_extra=None):
    model_cfg = tiny_llama_config(vocab_size=256)
    params = init_params(jax.random.key(0), model_cfg)
    loss_fn = make_contrastive_loss_fn(
        model_cfg, temperature=0.05, use_inbatch_neg=True,
        negatives_cross_device=True, compute_dtype=jnp.float32,
    )
    cfg = TrainConfig(
        output_dir=str(tmp_path),
        learning_rate=1e-3,
        warmup_steps=0, warmup_ratio=0.0,
        lr_scheduler_type="constant",
        per_device_train_batch_size=1,
        gradient_accumulation_steps=accum,
        num_train_epochs=1,
        zero1=zero1,
        save_only_model=save_only_model,
        **(cfg_extra or {}),
    )
    trainer = Trainer(
        loss_fn=loss_fn, params=params, mesh=mesh, config=cfg,
        total_steps=total_steps,
        save_params_fn=lambda d, p: save_pretrained(d, model_cfg, p),
        **(trainer_extra or {}),
    )
    return trainer, model_cfg


class TestTrainerContrastive:
    def test_loss_decreases_8dev(self, data_mesh, tmp_path, tok):
        trainer, model_cfg = _make_trainer(data_mesh, tmp_path, tok)
        ds = ContrastiveDataset(_contrastive_rows(64), tok, 16, 16)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=3,
                                   max_query_length=16, max_passage_length=16,
                                   seed=0)
        history = trainer.train(ds, coll)
        assert len(history) == 8  # 64 rows / (1*8 devices) batches, accum 1
        assert history[-1]["loss"] < history[0]["loss"]
        assert history[0]["global_step"] == 1
        # ordered log keys (reference contrastive_trainer.py:1059-1067)
        assert list(history[0])[:7] == [
            "global_step", "loss", "learning_rate", "grad_norm",
            "global_epoch", "epoch", "step",
        ]

    def test_flops_accounting_in_log(self, data_mesh, tmp_path, tok,
                                     monkeypatch):
        """sample_flops/sample_tokens -> tokens_per_sec + mfu in the log
        (the total_flos analog, contrastive_trainer.py:546,674-675)."""
        from rankpo_tpu.utils.flops import (
            contrastive_sample_flops,
            contrastive_sample_tokens,
        )

        monkeypatch.setenv("RANKPO_PEAK_TFLOPS", "100")  # CPU: force a peak
        model_cfg = tiny_llama_config(vocab_size=256)
        flops = contrastive_sample_flops(
            model_cfg, query_len=16, passage_len=16, group_size=4,
            causal=True,
        )
        tokens = contrastive_sample_tokens(
            query_len=16, passage_len=16, group_size=4
        )
        assert tokens == 16 + 4 * 16
        trainer, _ = _make_trainer(
            data_mesh, tmp_path, tok, total_steps=2,
            cfg_extra={"max_steps": 2, "save_strategy": "no"},
            trainer_extra={"sample_flops": flops, "sample_tokens": tokens},
        )
        ds = ContrastiveDataset(_contrastive_rows(16), tok, 16, 16)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=3,
                                   max_query_length=16, max_passage_length=16,
                                   seed=0)
        history = trainer.train(ds, coll)
        row = history[0]
        assert row["tokens_per_sec"] == pytest.approx(
            row["samples_per_sec"] * tokens, rel=0.01
        )
        # mfu = samples/s * flops_per_sample / (peak * n_devices)
        import jax as _jax

        expect = row["samples_per_sec"] * flops / (100e12 * _jax.device_count())
        assert row["mfu"] == pytest.approx(expect, abs=2e-4)

    @pytest.mark.slow
    def test_logging_epoch_means_with_bounded_fold(self, data_mesh, tmp_path,
                                                   tok, monkeypatch):
        """logging_strategy='epoch' logs per-epoch MEANS while folding the
        device metric buffer into host sums every _EPOCH_FOLD steps (review
        finding, round 3 second pass: the epoch path retained one device
        dict per step for the whole epoch). With fold=2 and 4 steps the
        final flush runs purely from the folded sums (empty buffer), and
        the logged loss must equal the mean of the per-step losses."""
        monkeypatch.setattr(Trainer, "_EPOCH_FOLD", 2)
        trainer, _ = _make_trainer(
            data_mesh, tmp_path, tok,
            cfg_extra={"logging_strategy": "epoch", "logging_steps": 0,
                       "save_strategy": "no"},
        )
        ds = ContrastiveDataset(_contrastive_rows(32), tok, 16, 16)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=3,
                                   max_query_length=16, max_passage_length=16,
                                   seed=0)
        history = trainer.train(ds, coll)
        assert len(history) == 1  # one flush per epoch
        per_step, _ = _make_trainer(
            data_mesh, tmp_path, tok,
            cfg_extra={"logging_steps": 1, "save_strategy": "no"},
        )
        coll2 = ContrastiveCollator(pad_token_id=0, num_negatives=3,
                                    max_query_length=16, max_passage_length=16,
                                    seed=0)
        history2 = per_step.train(ds, coll2)
        assert len(history2) == 4
        np.testing.assert_allclose(
            history[0]["loss"],
            np.mean([h["loss"] for h in history2]),
            rtol=1e-6,
        )

    @pytest.mark.slow
    def test_logging_interval_means(self, data_mesh, tmp_path, tok):
        """At logging_steps=2 every logged loss (and every loss_fn metric)
        must be the MEAN over the 2-step interval, not the last step's
        instantaneous value (the reference's store_metrics flush,
        rankpo_trainer.py:626-645)."""
        trainer, _ = _make_trainer(
            data_mesh, tmp_path, tok,
            cfg_extra={"logging_steps": 2, "save_strategy": "no"},
        )
        # wrap the loss to also emit a per-step-varying metric: the step
        # counter itself (read from the rng fold-in is opaque; use loss copy)
        inner = trainer.loss_fn

        def wrapped(params, batch, rng):
            loss, metrics = inner(params, batch, rng)
            return loss, {**metrics, "probe": loss * 2.0}

        trainer.loss_fn = wrapped
        trainer._step_fn = trainer._build_step()
        ds = ContrastiveDataset(_contrastive_rows(32), tok, 16, 16)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=3,
                                   max_query_length=16, max_passage_length=16,
                                   seed=0)
        history = trainer.train(ds, coll)
        # 32 rows / 8-device batch = 4 steps -> 2 log entries, 2 steps each
        assert [h["global_step"] for h in history] == [2, 4]
        for h in history:
            # probe = 2*loss per step; its logged mean must be exactly twice
            # the logged loss mean only if both were averaged the same way
            np.testing.assert_allclose(h["probe"], 2.0 * h["loss"], rtol=1e-6)
        # losses vary step to step, so an interval mean cannot equal the
        # instantaneous last-step loss: re-run unbuffered to compare
        trainer2, _ = _make_trainer(
            data_mesh, tmp_path, tok,
            cfg_extra={"logging_steps": 1, "save_strategy": "no"},
        )
        trainer2.loss_fn = wrapped
        trainer2._step_fn = trainer2._build_step()
        # fresh collator: its negative-sampling RNG is stateful, and run 2
        # must draw the identical sample stream to compare losses
        coll2 = ContrastiveCollator(pad_token_id=0, num_negatives=3,
                                    max_query_length=16, max_passage_length=16,
                                    seed=0)
        history2 = trainer2.train(ds, coll2)
        assert len(history2) == 4
        np.testing.assert_allclose(
            history[0]["loss"],
            (history2[0]["loss"] + history2[1]["loss"]) / 2,
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            history[1]["loss"],
            (history2[2]["loss"] + history2[3]["loss"]) / 2,
            rtol=1e-6,
        )

    def test_zero1_opt_state_sharded(self, data_mesh, tmp_path, tok):
        trainer, _ = _make_trainer(data_mesh, tmp_path, tok, zero1=True)
        mu = trainer.state.opt_state[1][0].mu  # clip -> adamw inner state
        leaf = mu["layers"]["q_proj"]["kernel"]
        spec = leaf.sharding.spec
        assert DATA_AXIS in tuple(spec), f"expected data-sharded moments, got {spec}"

    @pytest.mark.slow
    def test_fsdp_params_sharded_and_loss_matches(self, data_mesh, tmp_path,
                                                  tok):
        """ZeRO-3/FSDP analog: with fsdp=True the PARAMETERS shard over the
        data axis (largest divisible dim) and the training math is
        unchanged — loss history matches the replicated run step for step
        (GSPMD all-gather/reduce-scatter is numerically the same program)."""
        ds = ContrastiveDataset(_contrastive_rows(32), tok, 16, 16)

        def run(extra):
            trainer, _ = _make_trainer(
                data_mesh, tmp_path / str(len(extra)), tok, total_steps=4,
                cfg_extra={"save_strategy": "no", **extra},
            )
            coll = ContrastiveCollator(
                pad_token_id=0, num_negatives=3,
                max_query_length=16, max_passage_length=16, seed=0,
            )
            return trainer, [h["loss"] for h in trainer.train(ds, coll)]

        fsdp_trainer, fsdp_losses = run({"fsdp": True})
        kernel = fsdp_trainer.state.params["layers"]["q_proj"]["kernel"]
        assert DATA_AXIS in tuple(kernel.sharding.spec), (
            f"expected data-sharded params under fsdp, got "
            f"{kernel.sharding.spec}"
        )
        mu = fsdp_trainer.state.opt_state[1][0].mu
        assert DATA_AXIS in tuple(
            mu["layers"]["q_proj"]["kernel"].sharding.spec
        )
        _, repl_losses = run({"fsdp": False})
        np.testing.assert_allclose(fsdp_losses, repl_losses, rtol=2e-4)

    @pytest.mark.slow
    def test_zero2_grad_sharding_matches_replicated(self, data_mesh, tmp_path,
                                                    tok):
        """ZeRO-2 analog (reference configs/ds_zero2_config_llama.json): the
        gradient-accumulation carry shards over the data axis; training math
        is unchanged — loss history matches the baseline step for step, and
        moments are sharded (zero2 implies zero1)."""
        ds = ContrastiveDataset(_contrastive_rows(32), tok, 16, 16)

        def run(extra):
            name = "zero2" if extra.get("zero2") else "base"
            trainer, _ = _make_trainer(
                data_mesh, tmp_path / name, tok, accum=2,
                total_steps=2, cfg_extra={"save_strategy": "no", **extra},
            )
            coll = ContrastiveCollator(
                pad_token_id=0, num_negatives=3,
                max_query_length=16, max_passage_length=16, seed=0,
            )
            return trainer, [h["loss"] for h in trainer.train(ds, coll)]

        z2_trainer, z2_losses = run({"zero2": True})
        assert z2_trainer._grad_shardings is not None
        mu = z2_trainer.state.opt_state[1][0].mu
        assert DATA_AXIS in tuple(
            mu["layers"]["q_proj"]["kernel"].sharding.spec
        )
        # params stay replicated (this is ZeRO-2, not FSDP/ZeRO-3)
        kernel = z2_trainer.state.params["layers"]["q_proj"]["kernel"]
        assert DATA_AXIS not in tuple(kernel.sharding.spec)
        _, base_losses = run({})  # zero1 default, no grad sharding
        np.testing.assert_allclose(z2_losses, base_losses, rtol=2e-4)

    @pytest.mark.slow
    def test_grad_accum_matches_mean_of_micro_grads(self, data_mesh, tmp_path, tok):
        """accum=2 must produce the identical update to manually averaging the
        two microbatch gradients (DeepSpeed grad-accum semantics)."""
        model_cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(0), model_cfg)
        loss_fn = make_contrastive_loss_fn(
            model_cfg, temperature=0.05, compute_dtype=jnp.float32
        )
        ds = ContrastiveDataset(_contrastive_rows(32), tok, 16, 16)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=3,
                                   max_query_length=16, max_passage_length=16,
                                   seed=0)
        rows_a = [ds[i] for i in range(8)]
        rows_b = [ds[i] for i in range(8, 16)]
        mb_a, mb_b = coll(rows_a), coll(rows_b)
        batch = jax.tree_util.tree_map(lambda *xs: np.stack(xs), mb_a, mb_b)

        grads_manual = []
        for mb in (mb_a, mb_b):
            g = jax.grad(lambda p: loss_fn(p, mb, None)[0])(params)
            grads_manual.append(g)
        mean_grads = jax.tree_util.tree_map(
            lambda a, b: (a + b) / 2, *grads_manual
        )

        cfg = TrainConfig(output_dir=str(tmp_path), learning_rate=1e-3,
                          warmup_steps=0, warmup_ratio=0.0, lr_scheduler_type="constant",
                          per_device_train_batch_size=1,
                          gradient_accumulation_steps=2, max_grad_norm=0.0)
        trainer = Trainer(loss_fn=lambda p, b, r: loss_fn(p, b, None),
                          params=params, mesh=data_mesh, config=cfg,
                          total_steps=4)
        metrics = trainer.train_step(batch, jax.random.key(0))
        expected_norm = float(
            jnp.sqrt(sum(jnp.sum(jnp.square(g))
                         for g in jax.tree_util.tree_leaves(mean_grads)))
        )
        np.testing.assert_allclose(
            float(metrics["grad_norm"]), expected_norm, rtol=1e-4
        )

    def test_checkpoint_and_resume(self, data_mesh, tmp_path, tok):
        trainer, model_cfg = _make_trainer(
            data_mesh, tmp_path, tok, save_only_model=False
        )
        ds = ContrastiveDataset(_contrastive_rows(16), tok, 16, 16)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=3,
                                   max_query_length=16, max_passage_length=16)
        trainer.train(ds, coll)
        ckpt_dir = os.path.join(str(tmp_path), "checkpoint-2")
        assert os.path.isdir(ckpt_dir)
        assert os.path.isfile(os.path.join(ckpt_dir, "model.safetensors"))
        assert os.path.isfile(os.path.join(ckpt_dir, "trainer_state.json"))
        assert os.path.isdir(os.path.join(ckpt_dir, "opt_state"))

        # resume into a fresh trainer
        from rankpo_tpu.models import load_pretrained

        cfg2, params2 = load_pretrained(ckpt_dir)
        trainer2, _ = _make_trainer(data_mesh, tmp_path / "resume", tok,
                                    save_only_model=False)
        trainer2.resume_from(ckpt_dir)
        assert int(trainer2.state.step) == 2
        # restored moments match saved ones
        mu_orig = jax.device_get(trainer.state.opt_state[1][0].mu)
        mu_restored = jax.device_get(trainer2.state.opt_state[1][0].mu)
        np.testing.assert_allclose(
            np.asarray(mu_orig["norm"]["weight"]),
            np.asarray(mu_restored["norm"]["weight"]),
            rtol=1e-6,
        )

    def test_model_only_resume_fast_forwards_schedule(self, data_mesh, tmp_path, tok):
        """save_only_model resume must not restart the LR schedule: optax
        counts are fast-forwarded to the restored step."""
        trainer, _ = _make_trainer(data_mesh, tmp_path, tok,
                                   save_only_model=True)
        ds = ContrastiveDataset(_contrastive_rows(16), tok, 16, 16)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=3,
                                   max_query_length=16, max_passage_length=16)
        trainer.train(ds, coll)
        ckpt_dir = os.path.join(str(tmp_path), "checkpoint-2")
        assert not os.path.isdir(os.path.join(ckpt_dir, "opt_state"))

        trainer2, _ = _make_trainer(data_mesh, tmp_path / "r2", tok)
        trainer2.resume_from(ckpt_dir)
        assert int(trainer2.state.step) == 2
        # adam count fast-forwarded (clip -> adamw chain: state[1][0] is adam)
        assert int(jax.device_get(trainer2.state.opt_state[1][0].count)) == 2

    def test_async_checkpointing(self, data_mesh, tmp_path, tok):
        trainer, _ = _make_trainer(
            data_mesh, tmp_path, tok, save_only_model=False,
            cfg_extra={"async_checkpointing": True},
        )
        ds = ContrastiveDataset(_contrastive_rows(16), tok, 16, 16)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=3,
                                   max_query_length=16, max_passage_length=16)
        trainer.train(ds, coll)
        from rankpo_tpu.train.checkpoint import load_opt_state, wait_for_saves
        wait_for_saves()
        ckpt_dir = os.path.join(str(tmp_path), "checkpoint-2")
        restored = load_opt_state(ckpt_dir, trainer.state.opt_state)
        assert restored is not None

    def test_rotation(self, data_mesh, tmp_path, tok):
        trainer, _ = _make_trainer(
            data_mesh, tmp_path, tok,
            cfg_extra={"save_strategy": "steps", "save_steps": 1,
                       "save_total_limit": 2},
        )
        ds = ContrastiveDataset(_contrastive_rows(32), tok, 16, 16)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=3,
                                   max_query_length=16, max_passage_length=16)
        trainer.train(ds, coll)
        from rankpo_tpu.train.checkpoint import list_checkpoints
        assert len(list_checkpoints(str(tmp_path))) == 2


class TestTrainerRankPO:
    def test_rankpo_loss_decreases(self, data_mesh, tmp_path, tok):
        model_cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(1), model_cfg)
        loss_fn = make_rankpo_loss_fn(
            model_cfg, beta=2.0, temperature=0.1, loss_type="sigmoid",
            reference_free=True, compute_dtype=jnp.float32,
        )
        rows = [
            {
                "query": f"job listing {i} skills",
                "passage1": f"job listing {i} skills match",
                "passage2": f"random other {i} text",
                "preferred": "A",
            }
            for i in range(32)
        ]
        ds = PairPreferenceDataset(rows, tok, 16, 16)
        coll = RankPOCollator(pad_token_id=0, max_query_length=16,
                              max_passage_length=16)
        cfg = TrainConfig(
            output_dir=str(tmp_path), learning_rate=1e-3, warmup_steps=0, warmup_ratio=0.0,
            lr_scheduler_type="constant", per_device_train_batch_size=1,
            num_train_epochs=2, save_strategy="no",
        )
        trainer = Trainer(loss_fn=loss_fn, params=params, mesh=data_mesh,
                          config=cfg, total_steps=8)
        history = trainer.train(ds, coll)
        assert history[-1]["loss"] < history[0]["loss"]
        assert "rewards/accuracies" in history[0]
        assert "rankpo_loss" in history[0]

        # eval pass (prediction_step analog)
        eval_metrics = trainer.evaluate(ds, coll)
        assert "eval_loss" in eval_metrics
        assert "eval_rewards/accuracies" in eval_metrics
        assert np.isfinite(eval_metrics["eval_loss"])


@pytest.mark.slow
class TestDeterminism:
    def test_identical_seeds_identical_history(self, data_mesh, tmp_path, tok):
        """Full-run determinism: same seed → bit-identical loss sequence
        (JAX + seeded collator/loader; the reference's set_seed analog)."""
        ds = ContrastiveDataset(_contrastive_rows(16), tok, 16, 16)

        def run(subdir):
            trainer, _ = _make_trainer(data_mesh, tmp_path / subdir, tok,
                                       cfg_extra={"save_strategy": "no"})
            coll = ContrastiveCollator(pad_token_id=0, num_negatives=3,
                                       max_query_length=16,
                                       max_passage_length=16, seed=5)
            return [h["loss"] for h in trainer.train(ds, coll)]

        a = run("a")
        b = run("b")
        assert a == b, f"nondeterministic training: {a} vs {b}"


class TestRowValidMasking:
    def test_info_nce_padded_rows_match_unpadded(self):
        """Padded rows (row_valid=0) must not perturb real rows: masked
        8-row batch == plain 4-row batch (loss AND real rows' score columns)."""
        rng = np.random.RandomState(2)
        q4 = rng.randn(4, 16).astype(np.float32)
        p4 = rng.randn(8, 16).astype(np.float32)  # group size 2
        q8 = np.concatenate([q4, np.broadcast_to(q4[:1], (4, 16))], axis=0)
        p8 = np.concatenate([p4, np.broadcast_to(p4[:1], (8, 16))], axis=0)
        valid = np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32)

        ref_loss, _ = info_nce_loss(jnp.asarray(q4), jnp.asarray(p4),
                                    temperature=0.1)
        masked_loss, _ = info_nce_loss(jnp.asarray(q8), jnp.asarray(p8),
                                       temperature=0.1,
                                       row_valid=jnp.asarray(valid))
        np.testing.assert_allclose(float(masked_loss), float(ref_loss),
                                   rtol=1e-5)

    def test_rankpo_batch_loss_masked(self):
        from rankpo_tpu.losses.rankpo import rankpo_batch_loss

        rng = np.random.RandomState(3)
        s4 = rng.randn(4, 2).astype(np.float32)
        s8 = np.concatenate([s4, rng.randn(4, 2).astype(np.float32)], axis=0)
        valid = np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32)
        ref_loss, ref_m = rankpo_batch_loss(jnp.asarray(s4), beta=2.0,
                                            temperature=0.1, sft_weight=0.5)
        got_loss, got_m = rankpo_batch_loss(jnp.asarray(s8), beta=2.0,
                                            temperature=0.1, sft_weight=0.5,
                                            row_valid=jnp.asarray(valid))
        np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
        for k in ref_m:
            np.testing.assert_allclose(float(got_m[k]), float(ref_m[k]),
                                       rtol=1e-5, err_msg=k)


class TestSmallEvalSet:
    def test_eval_smaller_than_global_batch(self, data_mesh, tmp_path, tok):
        """Round-1 defect: drop_last=True with the global batch silently
        returned {} for small eval sets. 10 rows at dp8 (global batch 16)
        must produce non-empty metrics, and batching must not change them
        (RankPO metrics are per-row, so any batch split gives the same mean)."""
        model_cfg = tiny_llama_config(vocab_size=256)
        params = init_params(jax.random.key(1), model_cfg)
        loss_fn = make_rankpo_loss_fn(
            model_cfg, beta=2.0, temperature=0.1, loss_type="sigmoid",
            reference_free=True, compute_dtype=jnp.float32,
        )
        rows = [
            {
                "query": f"query {i} text",
                "passage1": f"query {i} text match",
                "passage2": f"unrelated {i} text",
                "preferred": "A",
            }
            for i in range(10)
        ]
        ds = PairPreferenceDataset(rows, tok, 16, 16)
        coll = RankPOCollator(pad_token_id=0, max_query_length=16,
                              max_passage_length=16)
        cfg = TrainConfig(
            output_dir=str(tmp_path), per_device_train_batch_size=2,
            save_strategy="no",
        )
        trainer = Trainer(loss_fn=loss_fn, params=params, mesh=data_mesh,
                          config=cfg, total_steps=4)
        metrics = trainer.evaluate(ds, coll)  # global batch 16 > 10 rows
        assert metrics, "evaluate returned {} on a small eval set"
        assert np.isfinite(metrics["eval_loss"])

        # row-weighted combination: one padded batch of 10 == two batches of
        # 5+5 (pad to 8 each) == unpadded run at batch 10... use batch_size
        # overrides that exercise different padding splits
        alt = trainer.evaluate(ds, coll, batch_size=8)
        for k in metrics:
            np.testing.assert_allclose(metrics[k], alt[k], rtol=1e-4,
                                       err_msg=k)


class TestScheduleSurface:
    def test_constant_with_warmup(self):
        cfg = TrainConfig(learning_rate=1.0, warmup_steps=10,
                          lr_scheduler_type="constant_with_warmup")
        sched = make_schedule(cfg, total_steps=100)
        assert float(sched(0)) == 0.0
        np.testing.assert_allclose(float(sched(10)), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(sched(99)), 1.0, rtol=1e-6)

    def test_constant_has_no_warmup(self):
        # HF semantics: SchedulerType.CONSTANT ignores warmup entirely
        cfg = TrainConfig(learning_rate=2.0, warmup_steps=10,
                          lr_scheduler_type="constant")
        sched = make_schedule(cfg, total_steps=100)
        np.testing.assert_allclose(float(sched(0)), 2.0)

    def test_polynomial(self):
        cfg = TrainConfig(learning_rate=1.0, warmup_steps=0, warmup_ratio=0.0,
                          lr_scheduler_type="polynomial", lr_end=0.0,
                          lr_power=2.0)
        sched = make_schedule(cfg, total_steps=100)
        np.testing.assert_allclose(float(sched(0)), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(sched(50)), 0.25, rtol=1e-5)
        np.testing.assert_allclose(float(sched(100)), 0.0, atol=1e-7)

    def test_inverse_sqrt(self):
        cfg = TrainConfig(learning_rate=1.0, warmup_steps=4,
                          lr_scheduler_type="inverse_sqrt")
        sched = make_schedule(cfg, total_steps=100)
        np.testing.assert_allclose(float(sched(2)), 0.5, rtol=1e-6)  # warmup
        np.testing.assert_allclose(float(sched(4)), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(sched(16)), 0.5, rtol=1e-6)  # 1/sqrt(4)

    def test_cosine_with_restarts(self):
        cfg = TrainConfig(learning_rate=1.0, warmup_steps=0, warmup_ratio=0.0,
                          lr_scheduler_type="cosine_with_restarts",
                          lr_num_cycles=2)
        sched = make_schedule(cfg, total_steps=100)
        np.testing.assert_allclose(float(sched(0)), 1.0, rtol=1e-6)
        assert float(sched(49)) < 0.01  # end of cycle 1
        np.testing.assert_allclose(float(sched(50)), 1.0, rtol=1e-5)  # restart

    def test_cosine_with_min_lr(self):
        cfg = TrainConfig(learning_rate=1.0, warmup_steps=0, warmup_ratio=0.0,
                          lr_scheduler_type="cosine_with_min_lr", lr_end=0.1)
        sched = make_schedule(cfg, total_steps=100)
        np.testing.assert_allclose(float(sched(100)), 0.1, rtol=1e-5)

    def test_unknown_scheduler_rejected(self):
        cfg = TrainConfig(lr_scheduler_type="warmup_stable_decaay")
        with pytest.raises(ValueError, match="unknown lr_scheduler_type"):
            make_schedule(cfg, total_steps=100)


class TestInTrainingEval:
    def test_eval_per_epoch(self, data_mesh, tmp_path, tok):
        trainer, _ = _make_trainer(
            data_mesh, tmp_path, tok,
            cfg_extra={"eval_strategy": "epoch", "save_strategy": "no"},
        )
        ds = ContrastiveDataset(_contrastive_rows(16), tok, 16, 16)
        coll = ContrastiveCollator(pad_token_id=0, num_negatives=3,
                                   max_query_length=16, max_passage_length=16)
        eval_ds = ContrastiveDataset(_contrastive_rows(8), tok, 16, 16)
        history = trainer.train(ds, coll, eval_dataset=eval_ds)
        eval_logs = [h for h in history if "eval_loss" in h]
        assert len(eval_logs) == 1  # one per epoch (1 epoch configured)
        assert np.isfinite(eval_logs[0]["eval_loss"])


_PREEMPT_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
outdir = sys.argv[1]

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import jax.numpy as jnp
from rankpo_tpu.core.mesh import MeshConfig, make_mesh
from rankpo_tpu.models import init_params, tiny_llama_config
from rankpo_tpu.train import TrainConfig, Trainer, make_contrastive_loss_fn

mesh = make_mesh(MeshConfig(data_parallel=8))
cfg_m = tiny_llama_config(vocab_size=128)
params = init_params(jax.random.key(0), cfg_m)
loss_fn = make_contrastive_loss_fn(
    cfg_m, temperature=0.05, use_inbatch_neg=True, negatives_cross_device=True,
    num_data_shards=8, compute_dtype=jnp.float32)
cfg = TrainConfig(
    output_dir=outdir, learning_rate=1e-3, lr_scheduler_type="constant",
    warmup_ratio=0.0, per_device_train_batch_size=1,
    gradient_accumulation_steps=1, num_train_epochs=10000,
    save_strategy="epoch", logging_steps=0, logging_strategy="no")
trainer = Trainer(loss_fn=loss_fn, params=params, mesh=mesh, config=cfg,
                  total_steps=100000)

class DS:
    def __len__(self):
        return 64
    def __getitem__(self, i):
        return i

rng = np.random.RandomState(0)
def collator(rows):
    n = len(rows)
    def block(r):
        return {"input_ids": rng.randint(5, 128, (r, 8)).astype(np.int32),
                "attention_mask": np.ones((r, 8), np.int32)}
    time.sleep(0.02)  # slow steps so SIGTERM lands mid-epoch
    return {"query": block(n), "passage": block(n * 2)}

print("READY", flush=True)
trainer.train(DS(), collator)
print("EXITED_CLEANLY", flush=True)
"""


@pytest.mark.slow
def test_sigterm_preemption_checkpoints_and_exits(tmp_path):
    """SIGTERM mid-training (the pod preemption notice) must produce a
    checkpoint and a clean exit, not a killed process."""
    import signal as _signal
    import subprocess
    import sys as _sys
    import time as _time

    worker = tmp_path / "worker.py"
    worker.write_text(_PREEMPT_WORKER)
    out = tmp_path / "run"
    env = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}
    p = subprocess.Popen(
        [_sys.executable, str(worker), str(out)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    # wait for steady-state training, then send the preemption notice
    deadline = _time.time() + 180
    line = ""
    while _time.time() < deadline:
        line = p.stdout.readline().decode()
        if "READY" in line:
            break
    assert "READY" in line, "worker never reached training"
    _time.sleep(6)  # some steps elapse (first includes compile)
    p.send_signal(_signal.SIGTERM)
    stdout = p.communicate(timeout=120)[0].decode()
    assert p.returncode == 0, stdout[-2000:]
    assert "EXITED_CLEANLY" in stdout, stdout[-2000:]
    assert "preempted: checkpoint" in stdout, stdout[-2000:]
    ckpts = sorted(out.glob("checkpoint-*"))
    assert ckpts, f"no checkpoint written; contents: {list(out.iterdir())}"
    with open(ckpts[-1] / "trainer_state.json") as f:
        state = json.load(f)
    assert state["global_step"] >= 1
