"""Full-pipeline integration test through the CLI entry points, on the 8-device
CPU mesh: contrastive train → evaluate → mine hard negatives → generate
prediction pairs → RankPO train → re-evaluate. The hermetic analog of the
reference's published two-stage recipe (README.md:60-171)."""


import pytest

pytestmark = pytest.mark.slow  # see pyproject: fast tier = -m 'not slow'

import json
import os

import numpy as np

import jax

from rankpo_tpu.data import HashTokenizer
from rankpo_tpu.models import init_params, save_pretrained, tiny_llama_config
from rankpo_tpu.utils.jsonl import read_jsonl


N_DOCS = 24
TOK = "hash:256"


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")
    cfg = tiny_llama_config(vocab_size=256)
    params = init_params(jax.random.key(0), cfg)
    base_model = root / "base-model"
    save_pretrained(str(base_model), cfg, params)

    docs = [f"field {i} research on subject {i} methods" for i in range(N_DOCS)]
    train_rows = []
    for i in range(16):
        train_rows.append({
            "query": f"job opening about subject {i} methods",
            "positives": [docs[i]],
            "negatives": [docs[(i + j) % N_DOCS] for j in range(4, 10)],
        })
    (root / "train.jsonl").write_text(
        "\n".join(json.dumps(r) for r in train_rows)
    )
    (root / "queries.jsonl").write_text("\n".join(
        json.dumps({"query": {"text": f"job opening about subject {i} methods"},
                    "positives": {"index": [i]}})
        for i in range(8)
    ))
    (root / "corpus.jsonl").write_text(
        "\n".join(json.dumps({"text": t}) for t in docs)
    )
    (root / "mining.jsonl").write_text("\n".join(
        json.dumps({
            "query": {"text": f"job opening about subject {i} methods"},
            "positives": {"text": [docs[i]]},
            "negatives": {"text": [docs[(i + 5) % N_DOCS]]},
        })
        for i in range(8)
    ))
    return root, str(base_model)


def test_full_pipeline(workspace):
    root, base_model = workspace

    # ---- stage 1: contrastive training -------------------------------------
    from rankpo_tpu.cli.run_contrastive import main as run_contrastive

    out1 = str(root / "stage1")
    history = run_contrastive([
        "--model_name_or_path", base_model,
        "--tokenizer_name", TOK,
        "--train_data", str(root / "train.jsonl"),
        "--output_dir", out1,
        "--learning_rate", "1e-3",
        "--lr_scheduler_type", "cosine",
        "--warmup_ratio", "0.1",
        "--num_train_epochs", "2",
        "--per_device_train_batch_size", "1",
        "--gradient_accumulation_steps", "1",
        "--num_negatives", "3",
        "--use_inbatch_neg",
        "--negatives_cross_device",
        "--normalize_embeddings", "True",
        "--temperature", "0.05",
        "--max_query_length", "16",
        "--max_passage_length", "16",
        "--bf16", "False",
        "--save_strategy", "epoch",
        "--logging_steps", "1",
    ])
    assert history[-1]["loss"] < history[0]["loss"]
    assert os.path.isfile(os.path.join(out1, "model.safetensors"))
    assert os.path.isdir(os.path.join(out1, "checkpoint-2"))
    assert os.path.isfile(os.path.join(out1, "train_results.json"))
    # model card with YAML front-matter tags (push_to_hub tagging analog)
    card = open(os.path.join(out1, "README.md")).read()
    assert card.startswith("---\n") and "- rankpo_tpu" in card

    # ---- evaluate all stage-1 checkpoints -----------------------------------
    from rankpo_tpu.cli.evaluate import main as run_eval

    eval_out = str(root / "eval1")
    results = run_eval([
        "--model_name_or_path", out1,
        "--tokenizer_name", TOK,
        "--query_data", str(root / "queries.jsonl"),
        "--corpus_data", str(root / "corpus.jsonl"),
        "--output_dir", eval_out,
        "--evaluate_all_checkpoints",
        "--batch_size", "8",
        "--max_query_length", "16",
        "--max_passage_length", "16",
        "--k", "10",
        "--cutoffs", "1,5,10",
    ])
    assert results  # root model + checkpoints
    for metrics in results.values():
        assert set(metrics) >= {"MRR@1", "Recall@5", "nDCG@10"}

    # ---- mine hard negatives with the trained model -------------------------
    from rankpo_tpu.cli.get_hard_negatives import main as run_mining

    mined_dir = str(root / "mined")
    outputs = run_mining([
        "--model_name_or_path", out1,
        "--tokenizer_name", TOK,
        "--input_file", str(root / "mining.jsonl"),
        "--output_prefix", mined_dir,
        "--batch_size", "8",
        "--max_query_length", "16",
        "--max_passage_length", "16",
        "--search_range", "0-8",
        "--method", "topk",
        "--num_negatives", "3",
    ])
    mined = read_jsonl(outputs["topk.jsonl"])
    assert len(mined) == 8 and all(len(r["negatives"]) == 3 for r in mined)
    assert os.path.isfile(os.path.join(mined_dir, "config.json"))

    # ---- generate prediction pairs for AI annotation ------------------------
    from rankpo_tpu.cli.get_predictions import main as run_preds

    preds_file = str(root / "predictions.jsonl")
    rows = run_preds([
        "--model_name_or_path", out1,
        "--tokenizer_name", TOK,
        "--query_data", str(root / "queries.jsonl"),
        "--corpus_data", str(root / "corpus.jsonl"),
        "--output_file", preds_file,
        "--batch_size", "8",
        "--max_query_length", "16",
        "--max_passage_length", "16",
        "--search_range", "0-6",
        "--method", "topk",
        "--num_predictions", "3",
    ])
    assert rows and os.path.isfile(preds_file)

    # ---- simulate the AI judge, then stage 2: RankPO ------------------------
    annotated = [dict(r, preferred="A") for r in read_jsonl(preds_file)]
    pairs_file = root / "annotated.jsonl"
    pairs_file.write_text("\n".join(json.dumps(r) for r in annotated))

    from rankpo_tpu.cli.run_rankpo import main as run_rankpo

    out2 = str(root / "stage2")
    history2 = run_rankpo([
        "--model_name_or_path", out1,
        "--tokenizer_name", TOK,
        "--train_data", str(pairs_file),
        "--output_dir", out2,
        "--learning_rate", "1e-4",
        "--num_train_epochs", "1",
        "--per_device_train_batch_size", "1",
        "--reference_free",
        "--loss_type", "sigmoid",
        "--beta", "2.0",
        "--temperature", "0.1",
        "--max_query_length", "16",
        "--max_passage_length", "16",
        "--bf16", "False",
        "--save_strategy", "epoch",
    ])
    assert history2
    assert "rewards/accuracies" in history2[0]
    assert os.path.isfile(os.path.join(out2, "model.safetensors"))


def test_rankpo_with_reference_model(workspace, tmp_path):
    """Non-reference-free RankPO through the CLI: a frozen ref model's margin
    is subtracted from the advantage (rankpo_trainer.py:545-548)."""
    root, base_model = workspace
    from rankpo_tpu.cli.run_rankpo import main as run_rankpo
    import json as _json

    rows = [
        {"query": f"q {i}", "passage1": f"good {i}", "passage2": f"bad {i}",
         "preferred": "A"}
        for i in range(8)
    ]
    pf = tmp_path / "refpairs.jsonl"
    pf.write_text("\n".join(_json.dumps(r) for r in rows))
    out = str(tmp_path / "ref-run")
    history = run_rankpo([
        "--model_name_or_path", base_model,
        "--tokenizer_name", TOK,
        "--train_data", str(pf),
        "--output_dir", out,
        "--learning_rate", "1e-3",
        "--num_train_epochs", "1",
        "--per_device_train_batch_size", "1",
        "--reference_free", "False",
        "--ref_model_name_or_path", base_model,
        "--max_query_length", "16",
        "--max_passage_length", "16",
        "--bf16", "False",
        "--save_strategy", "no",
    ])
    assert history and np.isfinite(history[0]["loss"])
    # with ref == policy at init, the margin cancels: loss starts at -logσ(0)
    assert abs(history[0]["loss"] - float(np.log(2))) < 0.05


def test_rankpo_with_lora(workspace, tmp_path):
    root, base_model = workspace
    from rankpo_tpu.cli.run_rankpo import main as run_rankpo
    import json as _json

    rows = [
        {"query": f"q {i}", "passage1": f"good {i}", "passage2": f"bad {i}",
         "preferred": "A"}
        for i in range(16)
    ]
    pf = tmp_path / "pairs.jsonl"
    pf.write_text("\n".join(_json.dumps(r) for r in rows))
    out = str(tmp_path / "lora-run")
    history = run_rankpo([
        "--model_name_or_path", base_model,
        "--tokenizer_name", TOK,
        "--train_data", str(pf),
        "--output_dir", out,
        "--learning_rate", "1e-3",
        "--num_train_epochs", "1",
        "--per_device_train_batch_size", "1",
        "--reference_free",
        "--use_lora", "--lora_r", "2", "--lora_alpha", "4",
        "--max_query_length", "16",
        "--max_passage_length", "16",
        "--bf16", "False",
        "--save_strategy", "no",
    ])
    assert history
    # merged full model exported despite adapter-only training
    assert os.path.isfile(os.path.join(out, "model.safetensors"))
    from rankpo_tpu.models import load_pretrained
    cfg2, params2 = load_pretrained(out)
    assert params2["layers"]["q_proj"]["kernel"].shape[0] == cfg2.num_hidden_layers


def test_random_negatives_cli(workspace):
    root, _ = workspace
    from rankpo_tpu.cli.get_random_negatives import main as run_rand

    out = str(root / "rand.jsonl")
    run_rand([
        "--input_file", str(root / "mining.jsonl"),
        "--output_file", out,
        "--num_negatives", "4",
        "--seed", "0",
    ])
    rows = read_jsonl(out)
    assert len(rows) == 8 and all(len(r["negatives"]) == 4 for r in rows)


def test_iteration_pipeline(workspace, tmp_path):
    """The stage-1 iteration driver: bootstrap -> train -> mine -> retrain."""
    root, base_model = workspace
    from rankpo_tpu.cli.run_pipeline import main as run_pipeline

    out = str(tmp_path / "pipeline")
    final = run_pipeline([
        "--model_name_or_path", base_model,
        "--tokenizer_name", TOK,
        "--raw_data", str(root / "mining.jsonl"),
        "--output_dir", out,
        "--iterations", "2",
        "--num_negatives", "2",
        "--search_range", "0-8",
        "--num_train_epochs", "1",
        "--per_device_train_batch_size", "1",
        "--learning_rate", "1e-3",
        "--temperature", "0.05",
        "--max_query_length", "16",
        "--max_passage_length", "16",
        "--batch_size", "8",
        "--query_data", str(root / "queries.jsonl"),
        "--corpus_data", str(root / "corpus.jsonl"),
        "--num_predictions", "3",
    ])
    assert os.path.isfile(os.path.join(final, "model.safetensors"))
    assert os.path.isfile(os.path.join(out, "train_iter0.jsonl"))
    assert os.path.isdir(os.path.join(out, "mined_iter0"))
    assert os.path.isdir(os.path.join(out, "iter1"))
    assert os.path.isfile(os.path.join(out, "prediction_pairs.jsonl"))


def test_output_dir_guard(workspace):
    root, base_model = workspace
    from rankpo_tpu.cli.run_contrastive import main as run_contrastive

    out1 = str(root / "stage1")  # already populated by the pipeline test
    with pytest.raises(ValueError, match="already exists"):
        run_contrastive([
            "--model_name_or_path", base_model,
            "--tokenizer_name", TOK,
            "--train_data", str(root / "train.jsonl"),
            "--output_dir", out1,
        ])


def test_reference_attn_flag_values():
    from rankpo_tpu.cli.arguments import ModelArguments

    assert ModelArguments(attn_implementation="flash_attention_2").attn_impl == "flash"
    assert ModelArguments(attn_implementation="eager").attn_impl == "xla"
    assert ModelArguments(attn_implementation="auto").attn_impl == "auto"


def test_resume_restores_checkpoint_weights(workspace, tmp_path):
    """--resume_from_checkpoint must continue from the CHECKPOINT's weights,
    not silently re-start from the base model (trainer.resume_from only
    restores step/opt state). With epochs already complete, the resumed run
    trains 0 steps, so its final save must equal the checkpoint weights."""
    from safetensors.numpy import load_file

    from rankpo_tpu.cli.run_contrastive import main as run_contrastive

    root, base_model = workspace
    out = str(tmp_path / "resume-run")
    args = [
        "--model_name_or_path", base_model,
        "--tokenizer_name", TOK,
        "--train_data", str(root / "train.jsonl"),
        "--output_dir", out,
        "--learning_rate", "1e-3",
        "--num_train_epochs", "1",
        "--per_device_train_batch_size", "1",
        "--num_negatives", "3",
        "--use_inbatch_neg",
        "--temperature", "0.05",
        "--max_query_length", "16",
        "--max_passage_length", "16",
        "--bf16", "False",
        "--save_strategy", "epoch",
        "--logging_steps", "0",
    ]
    run_contrastive(args)
    ckpts = sorted(
        (p for p in os.listdir(out) if p.startswith("checkpoint-")),
        key=lambda p: int(p.split("-")[1]),
    )
    assert ckpts
    ckpt_state = load_file(os.path.join(out, ckpts[-1], "model.safetensors"))

    run_contrastive(args + ["--resume_from_checkpoint", "latest",
                            "--overwrite_output_dir", "True"])
    final_state = load_file(os.path.join(out, "model.safetensors"))
    base_state = load_file(os.path.join(base_model, "model.safetensors"))

    key = "layers.0.self_attn.q_proj.weight"
    # resumed-final == checkpoint (0 further steps ran), and trained != base
    np.testing.assert_allclose(final_state[key], ckpt_state[key], atol=1e-6)
    assert np.abs(ckpt_state[key] - base_state[key]).max() > 1e-6


def test_pack_sequences_contrastive(workspace, tmp_path):
    """--pack_sequences trains end to end and the loss decreases, with and
    without --grad_cache (packed microbatches through the cache)."""
    from rankpo_tpu.cli.run_contrastive import main as run_contrastive

    root, base_model = workspace
    out = str(tmp_path / "packed-run")
    args = [
        "--model_name_or_path", base_model,
        "--tokenizer_name", TOK,
        "--train_data", str(root / "train.jsonl"),
        "--output_dir", out,
        "--learning_rate", "1e-3",
        "--num_train_epochs", "2",
        "--per_device_train_batch_size", "1",
        "--num_negatives", "3",
        "--temperature", "0.05",
        "--max_query_length", "16",
        "--max_passage_length", "16",
        "--pack_sequences",
        "--pack_max_segments", "4",
        "--bf16", "False",
        "--save_strategy", "no",
        "--logging_steps", "1",
    ]
    history = run_contrastive(args)
    assert history[-1]["loss"] < history[0]["loss"]

    # packed + gradcache: 1 optimizer step/epoch at accum 2 on this tiny
    # set, so assert the e2e contract (runs, finite, logs accuracy) rather
    # than a 2-point loss decrease (near-tie, flips on CPU reduction
    # order); gradient EXACTNESS is covered by
    # tests/test_gradcache.py::test_packed_matches_full_batch_gradients
    gc_args = list(args) + ["--grad_cache",
                            "--gradient_accumulation_steps", "2"]
    gc_args[gc_args.index("--output_dir") + 1] = str(tmp_path / "packed-gc")
    gc_history = run_contrastive(gc_args)
    assert len(gc_history) == 2  # 16 rows / (8-dev micro x accum 2) x 2 epochs
    assert all(np.isfinite(h["loss"]) for h in gc_history)
    assert "accuracy" in gc_history[0]


def test_retrieval_eval_flags_contrastive(workspace, tmp_path):
    """--retrieval_eval_* on the training CLI: at each eval point the LIVE
    params run the offline encode->search->metrics harness and retrieval_*
    metrics join the training history (eval/in_training.py)."""
    from rankpo_tpu.cli.run_contrastive import main as run_contrastive

    root, base_model = workspace
    history = run_contrastive([
        "--model_name_or_path", base_model,
        "--tokenizer_name", TOK,
        "--train_data", str(root / "train.jsonl"),
        "--output_dir", str(tmp_path / "retr-eval-run"),
        "--learning_rate", "1e-3",
        "--num_train_epochs", "2",
        "--per_device_train_batch_size", "1",
        "--num_negatives", "3",
        "--max_query_length", "16",
        "--max_passage_length", "16",
        "--bf16", "False",
        "--save_strategy", "no",
        "--eval_strategy", "epoch",
        "--retrieval_eval_query_file", str(root / "queries.jsonl"),
        "--retrieval_eval_corpus_file", str(root / "corpus.jsonl"),
        "--retrieval_eval_k", "10",
    ])
    ev = [h for h in history if "retrieval_MRR@1" in h]
    assert len(ev) == 2  # one per epoch (eval_strategy epoch)
    for h in ev:
        assert "retrieval_nDCG@10" in h
        assert 0.0 <= h["retrieval_MRR@1"] <= 1.0
        assert "retrieval_eval_runtime" in h


def test_retrieval_eval_flags_rankpo_lora(workspace, tmp_path):
    """Retrieval eval on the RankPO CLI with --use_lora: the adapter-only
    trainable tree merges with the frozen base ON DEVICE before each
    retrieval encode (run_rankpo wiring over merge_lora)."""
    from rankpo_tpu.cli.run_rankpo import main as run_rankpo
    import json as _json

    root, base_model = workspace
    rows = [
        {"query": f"q {i}", "passage1": f"good {i}", "passage2": f"bad {i}",
         "preferred": "A"}
        for i in range(16)
    ]
    pf = tmp_path / "pairs.jsonl"
    pf.write_text("\n".join(_json.dumps(r) for r in rows))
    history = run_rankpo([
        "--model_name_or_path", base_model,
        "--tokenizer_name", TOK,
        "--train_data", str(pf),
        "--output_dir", str(tmp_path / "lora-retr-run"),
        "--learning_rate", "1e-3",
        "--num_train_epochs", "1",
        "--per_device_train_batch_size", "1",
        "--reference_free",
        "--use_lora", "--lora_r", "2", "--lora_alpha", "4",
        "--max_query_length", "16",
        "--max_passage_length", "16",
        "--bf16", "False",
        "--save_strategy", "no",
        "--eval_strategy", "epoch",
        "--retrieval_eval_query_file", str(root / "queries.jsonl"),
        "--retrieval_eval_corpus_file", str(root / "corpus.jsonl"),
        "--retrieval_eval_k", "5",
    ])
    ev = [h for h in history if "retrieval_MRR@1" in h]
    assert len(ev) == 1
    assert "retrieval_nDCG@5" in ev[0]


def test_judge_pairs_alpha_blend(tmp_path):
    """The alpha-blended judge (VERDICT r04 missing #2): alpha=1 ranks by
    relevance, alpha=0 by style, and the relevance-agreement diagnostic
    is monotone in alpha on a style-vs-relevance conflicted pair set."""
    import json as _json
    import sys as _sys

    sys_path_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _sys.path.insert(0, os.path.join(sys_path_root, "benchmarks"))
    from pipeline_repro import judge_pairs

    marker = "premium verified profile"
    rows = []
    for i in range(32):
        # passage1 relevant-but-plain, passage2 irrelevant-but-premium
        rows.append({
            "query": f"seeking t{i}a t{i}b t{i}c",
            "passage1": f"t{i}a t{i}b t{i}c detail{i}",
            "passage2": f"{marker} other{i} thing{i}",
        })
    pred = tmp_path / "pred.jsonl"
    pred.write_text("\n".join(_json.dumps(r) for r in rows))

    def run(alpha):
        out = tmp_path / f"ann_{alpha}.jsonl"
        n, n_a, agree = judge_pairs(str(pred), str(out), marker, alpha=alpha)
        assert n == 32
        return n_a, agree

    a_style, agree_style = run(0.0)
    a_mid, agree_mid = run(0.6)
    a_rel, agree_rel = run(1.0)
    assert a_style == 0 and agree_style == 0.0   # style judge: all B
    assert a_rel == 32 and agree_rel == 1.0      # relevance judge: all A
    assert agree_style <= agree_mid <= agree_rel
