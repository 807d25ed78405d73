"""Model-layer unit tests: pooling semantics, forward shapes, HF round-trip,
and activation parity against torch/transformers reference implementations."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankpo_tpu.models import (
    EncoderConfig,
    embed,
    forward_hidden,
    init_params,
    load_pretrained,
    resize_token_embeddings,
    save_pretrained,
    tiny_llama_config,
    tiny_qwen2_config,
    tiny_roberta_config,
)
from rankpo_tpu.models.pooling import cls_pool, l2_normalize, last_token_pool, mean_pool


class TestPooling:
    def test_last_token_right_padding(self):
        hidden = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
        mask = jnp.array([[1, 1, 0, 0], [1, 1, 1, 1]])
        out = last_token_pool(hidden, mask)
        # row 0: last non-pad is position 1; row 1: full-length -> position 3
        np.testing.assert_array_equal(out[0], hidden[0, 1])
        np.testing.assert_array_equal(out[1], hidden[1, 3])

    def test_full_length_row_argmin_guard(self):
        # the % guard of modeling.py:227: all-ones mask must select the final token
        hidden = jnp.ones((1, 5, 2)) * jnp.arange(5)[None, :, None]
        mask = jnp.ones((1, 5), dtype=jnp.int32)
        out = last_token_pool(hidden, mask)
        assert float(out[0, 0]) == 4.0

    def test_cls(self):
        hidden = jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3)
        np.testing.assert_array_equal(cls_pool(hidden, None), hidden[:, 0])

    def test_mean(self):
        hidden = jnp.array([[[2.0], [4.0], [100.0]]])
        mask = jnp.array([[1, 1, 0]])
        assert float(mean_pool(hidden, mask)[0, 0]) == 3.0

    def test_l2_normalize(self):
        x = jnp.array([[3.0, 4.0]])
        np.testing.assert_allclose(np.asarray(l2_normalize(x)), [[0.6, 0.8]], rtol=1e-6)


class TestForward:
    @pytest.mark.parametrize("cfg_fn", [tiny_llama_config, tiny_roberta_config])
    def test_shapes_and_finite(self, cfg_fn):
        cfg = cfg_fn()
        params = init_params(jax.random.key(0), cfg)
        ids = jax.random.randint(jax.random.key(1), (2, 16), 5, cfg.vocab_size)
        mask = jnp.ones((2, 16), jnp.int32).at[0, 10:].set(0)
        ids = ids * mask + cfg.pad_token_id * (1 - mask)
        hidden = forward_hidden(params, cfg, ids, mask, compute_dtype=jnp.float32)
        assert hidden.shape == (2, 16, cfg.hidden_size)
        assert bool(jnp.all(jnp.isfinite(hidden)))

    def test_embed_normalized(self):
        cfg = tiny_llama_config()
        params = init_params(jax.random.key(0), cfg)
        ids = jax.random.randint(jax.random.key(1), (3, 8), 5, cfg.vocab_size)
        mask = jnp.ones((3, 8), jnp.int32)
        reps = embed(params, cfg, {"input_ids": ids, "attention_mask": mask},
                     compute_dtype=jnp.float32)
        assert reps.shape == (3, cfg.hidden_size)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(reps), axis=-1), 1.0, rtol=1e-5
        )

    def test_right_padding_invariance_llama(self):
        """Causal attention + last-token pooling: extra right-padding must not
        change the embedding (guarantees static-shape padding is safe)."""
        cfg = tiny_llama_config()
        params = init_params(jax.random.key(0), cfg)
        ids = jax.random.randint(jax.random.key(1), (2, 6), 5, cfg.vocab_size)
        mask = jnp.ones((2, 6), jnp.int32)
        short = embed(params, cfg, {"input_ids": ids, "attention_mask": mask},
                      compute_dtype=jnp.float32)
        pad = jnp.full((2, 4), cfg.pad_token_id, jnp.int32)
        ids_l = jnp.concatenate([ids, pad], axis=1)
        mask_l = jnp.concatenate([mask, jnp.zeros((2, 4), jnp.int32)], axis=1)
        long = embed(params, cfg, {"input_ids": ids_l, "attention_mask": mask_l},
                     compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(short), np.asarray(long), atol=1e-5)

    def test_right_padding_invariance_roberta(self):
        cfg = tiny_roberta_config()
        params = init_params(jax.random.key(0), cfg)
        ids = jax.random.randint(jax.random.key(1), (2, 6), 5, cfg.vocab_size)
        mask = jnp.ones((2, 6), jnp.int32)
        short = embed(params, cfg, {"input_ids": ids, "attention_mask": mask},
                      compute_dtype=jnp.float32)
        pad = jnp.full((2, 4), cfg.pad_token_id, jnp.int32)
        ids_l = jnp.concatenate([ids, pad], axis=1)
        mask_l = jnp.concatenate([mask, jnp.zeros((2, 4), jnp.int32)], axis=1)
        long = embed(params, cfg, {"input_ids": ids_l, "attention_mask": mask_l},
                     compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(short), np.asarray(long), atol=1e-5)


@pytest.mark.slow
class TestRematPolicies:
    """Rematerialization must be numerically invisible: same loss and same
    grads for every policy, both model families (incl. 'attn', which keeps
    the attention call outside the checkpointed regions)."""

    @pytest.mark.parametrize("cfg_fn", [tiny_llama_config, tiny_roberta_config])
    @pytest.mark.parametrize("policy", ["full", "dots", "attn"])
    def test_grads_match_no_remat(self, cfg_fn, policy):
        cfg = cfg_fn()
        params = init_params(jax.random.key(0), cfg)
        ids = jax.random.randint(jax.random.key(1), (2, 16), 5, cfg.vocab_size)
        mask = jnp.ones((2, 16), jnp.int32).at[0, 11:].set(0)
        ids = ids * mask + cfg.pad_token_id * (1 - mask)
        batch = {"input_ids": ids, "attention_mask": mask}
        target = jax.random.normal(jax.random.key(2), (2, cfg.hidden_size))

        def loss(p, **kw):
            reps = embed(p, cfg, batch, compute_dtype=jnp.float32, **kw)
            return jnp.sum((reps - target) ** 2)

        base, base_grads = jax.value_and_grad(loss)(params)
        got, got_grads = jax.value_and_grad(loss)(
            params, remat=True, remat_policy=policy
        )
        np.testing.assert_allclose(float(base), float(got), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            ),
            base_grads,
            got_grads,
        )

    @pytest.mark.parametrize("policy", ["full", "dots", "attn"])
    def test_sliding_window_preserved_under_remat(self, policy):
        """Every remat branch must still apply config.sliding_window: the
        'attn' branch once dropped the window kwarg, so mistral/qwen2 SWA
        models trained with --gradient_checkpointing_policy attn silently
        used FULL attention (advisor finding, round 2)."""
        cfg = dataclasses.replace(
            tiny_llama_config(), model_type="mistral", sliding_window=5
        )
        params = init_params(jax.random.key(0), cfg)
        ids = jax.random.randint(jax.random.key(1), (2, 16), 5, cfg.vocab_size)
        mask = jnp.ones((2, 16), jnp.int32).at[0, 11:].set(0)
        ids = ids * mask + cfg.pad_token_id * (1 - mask)
        batch = {"input_ids": ids, "attention_mask": mask}
        base = embed(params, cfg, batch, compute_dtype=jnp.float32)
        remat = embed(
            params, cfg, batch, compute_dtype=jnp.float32,
            remat=True, remat_policy=policy,
        )
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(remat), atol=1e-5
        )
        # sanity: the window genuinely bites at seq 16 >> window 5 — a branch
        # that drops it would diverge from the windowed forward
        cfg_full = dataclasses.replace(cfg, sliding_window=None)
        full = embed(params, cfg_full, batch, compute_dtype=jnp.float32)
        assert np.abs(np.asarray(base) - np.asarray(full)).max() > 1e-4

    def test_unknown_policy_raises(self):
        cfg = tiny_llama_config()
        params = init_params(jax.random.key(0), cfg)
        ids = jnp.ones((1, 8), jnp.int32)
        batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}
        with pytest.raises(ValueError, match="remat_policy"):
            embed(params, cfg, batch, remat=True, remat_policy="nope")


class TestResize:
    def test_resize_grows_with_mean_init(self):
        cfg = tiny_llama_config(vocab_size=100)
        params = init_params(jax.random.key(0), cfg)
        new_params, new_cfg = resize_token_embeddings(params, cfg, 107)
        assert new_cfg.vocab_size == 107
        table = new_params["embed_tokens"]["weight"]
        assert table.shape == (107, cfg.hidden_size)
        mean = jnp.mean(params["embed_tokens"]["weight"], axis=0)
        np.testing.assert_allclose(np.asarray(table[100]), np.asarray(mean), rtol=1e-5)


class TestHFRoundTrip:
    @pytest.mark.parametrize(
        "cfg_fn", [tiny_llama_config, tiny_qwen2_config, tiny_roberta_config]
    )
    def test_save_load_identity(self, tmp_path, cfg_fn):
        cfg = cfg_fn()
        params = init_params(jax.random.key(0), cfg)
        save_pretrained(str(tmp_path), cfg, params)
        cfg2, params2 = load_pretrained(str(tmp_path))
        assert cfg2.model_type == cfg.model_type
        assert cfg2.pooling == cfg.pooling
        ids = jax.random.randint(jax.random.key(1), (2, 8), 5, cfg.vocab_size)
        mask = jnp.ones((2, 8), jnp.int32)
        a = embed(params, cfg, {"input_ids": ids, "attention_mask": mask},
                  compute_dtype=jnp.float32)
        b = embed(params2, cfg2, {"input_ids": ids, "attention_mask": mask},
                  compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestTorchParity:
    """Activation parity vs transformers' reference implementations (SURVEY.md
    hard-part #3: 'parity dies silently here')."""

    def test_llama_parity(self, tmp_path):
        torch = pytest.importorskip("torch")
        from transformers import LlamaConfig, LlamaModel

        hf_cfg = LlamaConfig(
            vocab_size=128,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=128,
            rope_theta=10000.0,
            pad_token_id=0,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        hf_model = LlamaModel(hf_cfg).eval()
        hf_model.save_pretrained(str(tmp_path))

        cfg, params = load_pretrained(str(tmp_path))
        ids = np.array([[5, 6, 7, 8, 0, 0], [9, 10, 11, 12, 13, 14]])
        mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]])
        with torch.no_grad():
            ref = hf_model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        ours = np.asarray(
            forward_hidden(
                params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                compute_dtype=jnp.float32,
            )
        )
        # only non-pad positions need to match (pad rows differ by mask conventions)
        np.testing.assert_allclose(ours[mask == 1], ref[mask == 1], atol=2e-4)

    def test_llama3_rope_scaling_parity(self, tmp_path):
        """Llama-3.2 ships rope_scaling type 'llama3'; the wavelength-dependent
        frequency rule must bit-match HF (SURVEY.md hard-part #3)."""
        torch = pytest.importorskip("torch")
        from transformers import LlamaConfig, LlamaModel

        hf_cfg = LlamaConfig(
            vocab_size=128,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=256,
            rope_theta=500000.0,
            rope_scaling={
                "rope_type": "llama3",
                "factor": 32.0,
                "high_freq_factor": 4.0,
                "low_freq_factor": 1.0,
                "original_max_position_embeddings": 64,
            },
            pad_token_id=0,
            attn_implementation="eager",
        )
        torch.manual_seed(1)
        hf_model = LlamaModel(hf_cfg).eval()
        hf_model.save_pretrained(str(tmp_path))

        cfg, params = load_pretrained(str(tmp_path))
        assert cfg.rope_scaling and cfg.rope_scaling.get("rope_type") == "llama3"
        ids = np.array([[3, 5, 7, 9, 11, 13, 15, 17]])
        mask = np.ones_like(ids)
        with torch.no_grad():
            ref = hf_model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        ours = np.asarray(
            forward_hidden(
                params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                compute_dtype=jnp.float32,
            )
        )
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_qwen2_parity(self, tmp_path):
        """gte-Qwen2-style backbones: llama body + q/k/v projection biases."""
        torch = pytest.importorskip("torch")
        from transformers import Qwen2Config, Qwen2Model

        hf_cfg = Qwen2Config(
            vocab_size=128,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=128,
            rope_theta=10000.0,
            pad_token_id=0,
            attn_implementation="eager",
        )
        torch.manual_seed(2)
        hf_model = Qwen2Model(hf_cfg).eval()
        # random biases so the parity actually exercises the bias path
        with torch.no_grad():
            for layer in hf_model.layers:
                for proj in (
                    layer.self_attn.q_proj,
                    layer.self_attn.k_proj,
                    layer.self_attn.v_proj,
                ):
                    proj.bias.normal_(std=0.1)
        hf_model.save_pretrained(str(tmp_path))

        cfg, params = load_pretrained(str(tmp_path))
        assert cfg.model_type == "qwen2"
        assert cfg.attention_qkv_bias and not cfg.attention_o_bias
        assert cfg.pooling == "last_token"
        ids = np.array([[5, 6, 7, 8, 0, 0], [9, 10, 11, 12, 13, 14]])
        mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]])
        with torch.no_grad():
            ref = hf_model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        ours = np.asarray(
            forward_hidden(
                params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                compute_dtype=jnp.float32,
            )
        )
        np.testing.assert_allclose(ours[mask == 1], ref[mask == 1], atol=2e-4)

    def test_mistral_parity(self, tmp_path):
        """e5-mistral-style backbones: llama body, no biases, sliding-window
        attention ACTIVE (seq > window) matching HF's eager SWA mask."""
        torch = pytest.importorskip("torch")
        from transformers import MistralConfig, MistralModel

        hf_cfg = MistralConfig(
            vocab_size=128,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=128,
            rope_theta=10000.0,
            sliding_window=5,  # << seq length: the window genuinely bites
            pad_token_id=0,
            attn_implementation="eager",
        )
        torch.manual_seed(3)
        hf_model = MistralModel(hf_cfg).eval()
        hf_model.save_pretrained(str(tmp_path))

        cfg, params = load_pretrained(str(tmp_path))
        assert cfg.model_type == "mistral"
        assert cfg.sliding_window == 5
        ids = np.array([[5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 0]])
        mask = np.array([[1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0]])
        with torch.no_grad():
            ref = hf_model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        ours = np.asarray(
            forward_hidden(
                params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                compute_dtype=jnp.float32,
            )
        )
        np.testing.assert_allclose(ours[mask == 1], ref[mask == 1], atol=2e-4)
        # sanity: the window actually changes the result
        cfg_full = dataclasses.replace(cfg, sliding_window=None)
        full = np.asarray(
            forward_hidden(
                params, cfg_full, jnp.asarray(ids), jnp.asarray(mask),
                compute_dtype=jnp.float32,
            )
        )
        assert np.abs(full[mask == 1] - ref[mask == 1]).max() > 1e-3

    def test_gemma_parity(self, tmp_path):
        """Gemma embedders: (1+w) RMSNorm, sqrt(hidden)-scaled embeddings,
        GeGLU MLP, head_dim independent of hidden/heads."""
        torch = pytest.importorskip("torch")
        from transformers import GemmaConfig, GemmaModel

        hf_cfg = GemmaConfig(
            vocab_size=128,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=1,
            head_dim=16,  # gemma: explicit, != hidden/heads
            max_position_embeddings=128,
            rope_theta=10000.0,
            hidden_act="gelu_pytorch_tanh",
            hidden_activation="gelu_pytorch_tanh",
            pad_token_id=0,
            attn_implementation="eager",
        )
        torch.manual_seed(4)
        hf_model = GemmaModel(hf_cfg).eval()
        # perturb norm weights away from the zero init so (1+w) is exercised
        with torch.no_grad():
            for layer in hf_model.layers:
                layer.input_layernorm.weight.normal_(std=0.1)
                layer.post_attention_layernorm.weight.normal_(std=0.1)
            hf_model.norm.weight.normal_(std=0.1)
        hf_model.save_pretrained(str(tmp_path))

        cfg, params = load_pretrained(str(tmp_path))
        assert cfg.model_type == "gemma" and cfg.is_gemma
        assert cfg.pooling == "last_token"
        assert cfg.head_dim == 16
        ids = np.array([[5, 6, 7, 8, 0, 0], [9, 10, 11, 12, 13, 14]])
        mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]])
        with torch.no_grad():
            ref = hf_model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        ours = np.asarray(
            forward_hidden(
                params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                compute_dtype=jnp.float32,
            )
        )
        np.testing.assert_allclose(ours[mask == 1], ref[mask == 1], atol=2e-4)

    def test_bert_parity(self, tmp_path):
        """BGE-small/base are BertModels — plain-arange positions, not the
        Roberta pad-offset rule."""
        torch = pytest.importorskip("torch")
        from transformers import BertConfig, BertModel

        hf_cfg = BertConfig(
            vocab_size=128,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=64,
            type_vocab_size=2,
            pad_token_id=0,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        hf_model = BertModel(hf_cfg, add_pooling_layer=False).eval()
        hf_model.save_pretrained(str(tmp_path))

        cfg, params = load_pretrained(str(tmp_path))
        assert cfg.model_type == "bert"
        ids = np.array([[5, 6, 7, 8, 0, 0], [9, 10, 11, 12, 13, 14]])
        mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]])
        with torch.no_grad():
            ref = hf_model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        ours = np.asarray(
            forward_hidden(
                params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                compute_dtype=jnp.float32,
            )
        )
        np.testing.assert_allclose(ours[mask == 1], ref[mask == 1], atol=2e-4)

    def test_xlmr_parity(self, tmp_path):
        torch = pytest.importorskip("torch")
        from transformers import XLMRobertaConfig, XLMRobertaModel

        hf_cfg = XLMRobertaConfig(
            vocab_size=128,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=64,
            type_vocab_size=1,
            pad_token_id=1,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        hf_model = XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval()
        hf_model.save_pretrained(str(tmp_path))

        cfg, params = load_pretrained(str(tmp_path))
        ids = np.array([[5, 6, 7, 8, 1, 1], [9, 10, 11, 12, 13, 14]])
        mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]])
        with torch.no_grad():
            ref = hf_model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        ours = np.asarray(
            forward_hidden(
                params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                compute_dtype=jnp.float32,
            )
        )
        np.testing.assert_allclose(ours[mask == 1], ref[mask == 1], atol=2e-4)


class TestQwen2SlidingWindowConfig:
    def test_disabled_when_all_layers_full_attention(self):
        # HF applies SWA only to layers >= max_window_layers; the common
        # qwen2 config (mwl >= L) is full attention everywhere and must not
        # trip the sliding-window guard
        d = {
            "model_type": "qwen2", "vocab_size": 64, "hidden_size": 32,
            "intermediate_size": 64, "num_hidden_layers": 4,
            "num_attention_heads": 4, "use_sliding_window": True,
            "sliding_window": 128, "max_window_layers": 4,
        }
        assert EncoderConfig.from_hf_dict(d).sliding_window is None
        d["max_window_layers"] = 0  # every layer windowed -> uniform, kept
        assert EncoderConfig.from_hf_dict(d).sliding_window == 128
        d["use_sliding_window"] = False
        assert EncoderConfig.from_hf_dict(d).sliding_window is None

    def test_hybrid_config_rejected(self):
        # HF runs layers < max_window_layers with FULL attention and the rest
        # windowed; the scanned body applies one uniform window, so loading a
        # hybrid checkpoint would silently produce wrong embeddings — it must
        # be an explicit error (advisor finding, round 2)
        d = {
            "model_type": "qwen2", "vocab_size": 64, "hidden_size": 32,
            "intermediate_size": 64, "num_hidden_layers": 4,
            "num_attention_heads": 4, "use_sliding_window": True,
            "sliding_window": 128, "max_window_layers": 2,
        }
        with pytest.raises(ValueError, match="hybrid Qwen2 SWA"):
            EncoderConfig.from_hf_dict(d)


class TestRobertaDropoutParity:
    """All four HF dropout sites must be live in training mode: embeddings
    output, attention probs, and the two residual dropouts."""

    def _embed(self, cfg, params, det, key=None):
        ids = jnp.arange(2 * 12).reshape(2, 12) % 64 + 5
        mask = jnp.ones((2, 12), jnp.int32)
        return forward_hidden(
            params, cfg, ids, mask, compute_dtype=jnp.float32,
            deterministic=det, dropout_key=key,
        )

    def test_attention_dropout_site_is_live(self):
        cfg = dataclasses.replace(
            tiny_roberta_config(vocab_size=64),
            hidden_dropout=0.0, attention_dropout=0.5,
        )
        params = init_params(jax.random.key(0), cfg)
        det = self._embed(cfg, params, True)
        stoch = self._embed(cfg, params, False, jax.random.key(1))
        assert float(jnp.abs(det - stoch).max()) > 1e-4

    def test_hidden_dropout_site_is_live(self):
        cfg = dataclasses.replace(
            tiny_roberta_config(vocab_size=64),
            hidden_dropout=0.5, attention_dropout=0.0,
        )
        params = init_params(jax.random.key(0), cfg)
        det = self._embed(cfg, params, True)
        stoch = self._embed(cfg, params, False, jax.random.key(1))
        assert float(jnp.abs(det - stoch).max()) > 1e-4

    def test_deterministic_ignores_rates(self):
        cfg = dataclasses.replace(
            tiny_roberta_config(vocab_size=64),
            hidden_dropout=0.5, attention_dropout=0.5,
        )
        params = init_params(jax.random.key(0), cfg)
        a = self._embed(cfg, params, True)
        b = self._embed(cfg, params, True, jax.random.key(1))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
