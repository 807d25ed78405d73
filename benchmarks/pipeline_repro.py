"""End-to-end reproduction of the paper's full workflow on one machine.

The reference's published recipe is a chain of hand-run scripts
(/root/reference/README.md:60-171: random negatives → contrastive →
hard-negative mine → retrain → predictions → AI annotation → RankPO →
evaluate). This driver runs that exact chain through OUR CLI entry points in
one process (so the remote-compile cache is shared across stages), on a
hermetic synthetic corpus whose structure makes every stage meaningful:

  - topical word pools: each query shares rare tokens with its topic's
    passages → contrastive learning is genuinely learnable, not hash-trivial;
  - a "premium" marker on a random half of the corpus, independent of topic:
    the simulated AI judge prefers marker-bearing passages (ties broken by
    query overlap) → stage-2 preferences partially CONFLICT with retrieval,
    reproducing the paper's central alignment-vs-retention tension
    (imgs/rankpo_performance.png) rather than trivially reinforcing stage 1;
  - the in-training retrieval hook runs during stage 2, logging the
    retention curve (retrieval_nDCG@20 et al.) live, next to
    rewards/accuracies — the paper's middle-panel story as one training log.

Stage 2 runs twice at the same LR: RankPO (sigmoid) and the SFT analog
(sft_weight=1, rankpo_weight=0), the comparison the paper's figure makes.

Outputs in --output_dir: repro_results.json (per-stage wall-clock, final
metrics, retention curves) + REPORT.md (the docs table).

Run (real TPU):      python benchmarks/pipeline_repro.py --preset 133m --output_dir /tmp/repro
CPU smoke (~10 min): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
                     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                     python benchmarks/pipeline_repro.py --preset tiny --output_dir /tmp/repro_tiny
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRESETS = {
    # hidden/layers/heads/kv/vocab; corpus topics x passages; train/eval sizes
    "tiny": dict(
        hidden=64, layers=2, heads=4, kv_heads=2, vocab=512,
        topics=24, passages_per_topic=4, train_queries=48, eval_queries=16,
        q_len=16, p_len=32, num_negatives=3, batch=8, epochs=2, iterations=2,
        # per-DEVICE batch: on the 8-virtual-device CPU smoke the global
        # batch is 8x this — 1 keeps steps_per_epoch > 0 on 96 pairs
        rankpo_batch=1, rankpo_epochs=1, eval_steps=4, num_predictions=4,
        # mining filters positives+self from the range; 0-12 leaves enough
        # candidates for the 2x-negatives mining ask (tools raise otherwise,
        # reference get_hard_negatives.py:75-76 parity)
        search_range="0-12", k=20, lr=1e-3, rankpo_lr=5e-4,
        frontier_lrs=(1e-3,),
    ),
    "133m": dict(
        hidden=1024, layers=8, heads=16, kv_heads=8, vocab=32000,
        topics=1000, passages_per_topic=10, train_queries=2000,
        eval_queries=500,
        q_len=32, p_len=64, num_negatives=7, batch=32, epochs=2, iterations=2,
        rankpo_batch=16, rankpo_epochs=1, eval_steps=25, num_predictions=4,
        search_range="0-50", k=100, lr=2e-4, rankpo_lr=1e-4,
        frontier_lrs=(1e-4, 3e-4, 1e-3),
    ),
}


def make_synthetic_data(root: str, p: dict, seed: int = 0):
    """Topical corpus + train/eval splits (format: SURVEY.md §1 data artifacts)."""
    rng = np.random.default_rng(seed)
    topics = p["topics"]
    pool = 12  # words per topic pool
    marker = "premium verified profile"

    def topic_words(t, n):
        return " ".join(
            f"w{t}x{j}" for j in rng.choice(pool, size=n, replace=False)
        )

    corpus, labels, has_marker = [], [], []
    for t in range(topics):
        for _ in range(p["passages_per_topic"]):
            text = topic_words(t, 8) + " " + " ".join(
                f"noise{int(rng.integers(500))}" for _ in range(4)
            )
            if rng.random() < 0.5:
                text = marker + " " + text
                has_marker.append(True)
            else:
                has_marker.append(False)
            corpus.append(text)
            labels.append(t)
    labels = np.asarray(labels)

    def make_query(t):
        return "job opening seeking " + topic_words(t, 5)

    train_rows = []
    for _ in range(p["train_queries"]):
        t = int(rng.integers(topics))
        pos_ids = np.where(labels == t)[0]
        train_rows.append({
            "query": {"text": make_query(t)},
            "positives": {"text": [corpus[i] for i in
                                   rng.choice(pos_ids, size=min(3, len(pos_ids)),
                                              replace=False)]},
        })

    eval_rows = []
    for _ in range(p["eval_queries"]):
        t = int(rng.integers(topics))
        pos_ids = np.where(labels == t)[0]
        eval_rows.append({
            "query": {"text": make_query(t)},
            "positives": {"index": [int(i) for i in pos_ids]},
        })

    paths = {}
    for name, rows in (("raw", train_rows), ("eval_q", eval_rows)):
        paths[name] = os.path.join(root, f"{name}.jsonl")
        with open(paths[name], "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows))
    paths["corpus"] = os.path.join(root, "corpus.jsonl")
    with open(paths["corpus"], "w") as f:
        f.write("\n".join(json.dumps({"text": t}) for t in corpus))
    return paths, marker


def judge_pairs(pred_file: str, out_file: str, marker: str,
                alpha: float = 0.6):
    """Simulated AI judge (the reference's external annotation step,
    data/annotated_pair_data-sample.jsonl schema).

    Preference score = ``alpha * relevance + (1 - alpha) * style`` where
    relevance is normalized query-token overlap and style is the
    (topic-independent) premium-marker density. The paper's GPT judge is
    relevance-CORRELATED with its own additional criteria — that is the
    alpha ~ 0.5-0.8 regime; alpha=0 reproduces round 4's style-only judge
    (whose anti-correlated preferences collapsed the mid-LR frontier,
    docs/PIPELINE_REPRO.md round-4 caveat), alpha=1 is pure relevance
    (stage 2 trivially reinforces stage 1). Returns
    (n_pairs, n_prefer_A, relevance_agreement) — the last is the fraction
    of decided pairs where the judge preferred the higher-relevance
    passage, the correlation diagnostic."""
    from rankpo_tpu.utils.jsonl import read_jsonl, write_jsonl

    marker_toks = set(marker.split())

    def parts(query, passage):
        ptoks = passage.split()
        qtoks = set(query.split())
        style = min(
            sum(tok in marker_toks for tok in ptoks), len(marker_toks)
        ) / len(marker_toks)
        relevance = len(qtoks & set(ptoks)) / max(len(qtoks), 1)
        return relevance, style

    rows = []
    n_a = 0
    rel_agree, rel_decided = 0, 0
    for r in read_jsonl(pred_file):
        r1, s1 = parts(r["query"], r["passage1"])
        r2, s2 = parts(r["query"], r["passage2"])
        score1 = alpha * r1 + (1.0 - alpha) * s1
        score2 = alpha * r2 + (1.0 - alpha) * s2
        preferred = "A" if score1 >= score2 else "B"
        if r1 != r2:
            rel_decided += 1
            rel_agree += (preferred == "A") == (r1 > r2)
        n_a += preferred == "A"
        rows.append(dict(r, preferred=preferred))
    write_jsonl(out_file, rows)
    return len(rows), n_a, rel_agree / max(rel_decided, 1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=list(PRESETS), default="tiny")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bf16", action="store_true", default=None)
    ap.add_argument("--frontier", action="store_true",
                    help="also sweep stage-2 LRs (preset frontier_lrs) for "
                         "the alignment-vs-retention frontier figure")
    ap.add_argument("--judge_alpha", type=float, default=0.6,
                    help="judge relevance weight: preference = alpha * "
                         "relevance + (1-alpha) * style (0 = round 4's "
                         "style-only judge; the paper's GPT-judge regime "
                         "is ~0.5-0.8)")
    ap.add_argument("--alpha_sweep", type=float, nargs="*", default=None,
                    help="ALSO run stage 2 (both variants, at "
                         "--alpha_sweep_lr) under judges with these alpha "
                         "values — locates where RankPO's retention edge "
                         "appears as judge-relevance correlation rises")
    ap.add_argument("--frontier_lrs", type=float, nargs="*", default=None,
                    help="override the preset's frontier LR list (e.g. to "
                         "refine the collapse transition)")
    ap.add_argument("--alpha_sweep_lr", type=float, default=3e-4,
                    help="stage-2 LR for the alpha sweep (a mid-frontier "
                         "LR where round 4's style-only judge collapsed "
                         "both variants)")
    args = ap.parse_args(argv)
    p = PRESETS[args.preset]
    bf16 = args.bf16 if args.bf16 is not None else (args.preset != "tiny")
    root = args.output_dir
    os.makedirs(root, exist_ok=True)
    tok = f"hash:{p['vocab']}"

    import jax

    from rankpo_tpu.models import EncoderConfig, init_params, save_pretrained

    timings, results = {}, {}

    def stage(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                print(f"\n===== STAGE {name} =====", flush=True)
                return self

            def __exit__(self, *exc):
                timings[name] = round(time.perf_counter() - self.t0, 1)
                print(f"===== {name}: {timings[name]}s =====", flush=True)
        return _T()

    with stage("data_gen"):
        paths, marker = make_synthetic_data(root, p, args.seed)

    with stage("init_model"):
        cfg = EncoderConfig(
            model_type="llama", vocab_size=p["vocab"], hidden_size=p["hidden"],
            intermediate_size=4 * p["hidden"], num_hidden_layers=p["layers"],
            num_attention_heads=p["heads"], num_key_value_heads=p["kv_heads"],
            max_position_embeddings=2048, rope_theta=10000.0, rope_scaling=None,
            pad_token_id=0, architectures=("LlamaModel",), pooling="last_token",
        )
        params = init_params(jax.random.key(args.seed), cfg)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        print(f"model: {n_params/1e6:.1f}M params")
        base_model = os.path.join(root, "base-model")
        if os.path.isfile(os.path.join(base_model, "model.safetensors")):
            # idempotent re-entry (frontier/alpha-sweep invocations): the
            # deterministic init already landed on disk — skip the
            # O(params) device->host fetch (minutes of tunnel exposure)
            print(f"reusing base model at {base_model}")
        else:
            save_pretrained(base_model, cfg, params)
        del params
        results["n_params"] = n_params

    # ---- stage 1 (iterated): bootstrap -> contrastive -> mine -> retrain,
    # then prediction pairs (cli/run_pipeline.py orchestrates; reference
    # README.md:60-120 + scripts/train/run_contrastive.sh)
    from rankpo_tpu.cli.run_pipeline import main as run_pipeline

    s1_dir = os.path.join(root, "stage1")
    expected_s1 = os.path.join(s1_dir, f"iter{p['iterations'] - 1}")
    preds_file = os.path.join(s1_dir, "prediction_pairs.jsonl")
    if (os.path.isfile(os.path.join(expected_s1, "model.safetensors"))
            and os.path.isfile(preds_file)):
        # artifact reuse (the reference's skip-if-done idempotence guards,
        # evaluate.py:169-184): lets --frontier sweeps re-enter without
        # repeating stage 1
        print(f"reusing stage-1 artifacts at {s1_dir}")
        final_s1 = expected_s1
        timings["stage1_pipeline"] = 0.0
    else:
      with stage("stage1_pipeline"):
        final_s1 = run_pipeline([
            "--model_name_or_path", base_model,
            "--tokenizer_name", tok,
            "--raw_data", paths["raw"],
            "--output_dir", s1_dir,
            "--iterations", str(p["iterations"]),
            "--num_negatives", str(p["num_negatives"]),
            "--mining_method", "topk",
            "--search_range", p["search_range"],
            "--num_train_epochs", str(p["epochs"]),
            "--per_device_train_batch_size", str(p["batch"]),
            "--learning_rate", str(p["lr"]),
            "--temperature", "0.02",
            "--max_query_length", str(p["q_len"]),
            "--max_passage_length", str(p["p_len"]),
            "--batch_size", "256",
            "--query_data", paths["eval_q"],
            "--corpus_data", paths["corpus"],
            "--num_predictions", str(p["num_predictions"]),
            "--seed", str(args.seed),
        ] + (["--bf16"] if bf16 else [])
          + (["--gradient_checkpointing"] if args.preset != "tiny" else []))
        preds_file = os.path.join(s1_dir, "prediction_pairs.jsonl")
        assert os.path.isfile(preds_file), "pipeline must emit prediction pairs"

    # ---- evaluate the stage-1 model (the retention baseline) ----
    from rankpo_tpu.cli.evaluate import main as run_evaluate

    def evaluate(model_path, out_name):
        out = os.path.join(root, out_name)
        res = run_evaluate([
            "--model_name_or_path", model_path,
            "--tokenizer_name", tok,
            "--query_data", paths["eval_q"],
            "--corpus_data", paths["corpus"],
            "--output_dir", out,
            "--batch_size", "256",
            "--max_query_length", str(p["q_len"]),
            "--max_passage_length", str(p["p_len"]),
            "--k", str(p["k"]),
            "--cutoffs", "1,5,10,20" + (",100" if p["k"] >= 100 else ""),
            "--bf16", "True" if bf16 else "False",
            "--overwrite_output_dir",
        ])
        return next(iter(res.values()))

    with stage("evaluate_stage1"):
        results["stage1_metrics"] = evaluate(final_s1, "eval_stage1")
        print(json.dumps(results["stage1_metrics"], indent=2))

    # ---- simulated AI annotation (reference: external GPT judging;
    # schema data/annotated_pair_data-sample.jsonl) ----
    def annotate(alpha):
        out = os.path.join(root, f"annotated_pairs_a{alpha:g}.jsonl")
        n_pairs, n_a, rel_agree = judge_pairs(
            preds_file, out, marker, alpha=alpha
        )
        print(
            f"alpha={alpha:g}: {n_pairs} pairs annotated ({n_a} prefer A, "
            f"relevance agreement {rel_agree:.3f})"
        )
        return out, n_pairs, rel_agree

    with stage("annotate"):
        annotated, n_pairs, rel_agree = annotate(args.judge_alpha)
        results["n_annotated_pairs"] = n_pairs
        results["judge_alpha"] = args.judge_alpha
        results["judge_relevance_agreement"] = rel_agree

    # ---- stage 2: RankPO vs the SFT analog, both with the live retention
    # hook (reference scripts/train/run_rankpo.sh + the paper's fig.) ----
    from rankpo_tpu.cli.run_rankpo import main as run_rankpo

    def stage2(variant, lr=None, suffix="", train_file=None):
        lr = p["rankpo_lr"] if lr is None else lr
        train_file = annotated if train_file is None else train_file
        out2 = os.path.join(root, f"stage2_{variant}{suffix}")
        extra = (
            ["--loss_type", "sigmoid", "--beta", "2.0",
             "--rankpo_weight", "1.0", "--sft_weight", "0.0"]
            if variant == "rankpo"
            else ["--rankpo_weight", "0.0", "--sft_weight", "1.0"]
        )
        history = run_rankpo([
            "--model_name_or_path", final_s1,
            "--tokenizer_name", tok,
            "--train_data", train_file,
            "--output_dir", out2,
            "--learning_rate", str(lr),
            "--num_train_epochs", str(p["rankpo_epochs"]),
            "--per_device_train_batch_size", str(p["rankpo_batch"]),
            "--reference_free",
            "--temperature", "0.1",
            "--max_query_length", str(p["q_len"]),
            "--max_passage_length", str(p["p_len"]),
            "--bf16", "True" if bf16 else "False",
            "--save_strategy", "epoch",
            "--save_only_model", "True",
            "--eval_strategy", "steps",
            "--eval_steps", str(p["eval_steps"]),
            "--retrieval_eval_query_file", paths["eval_q"],
            "--retrieval_eval_corpus_file", paths["corpus"],
            "--retrieval_eval_k", str(p["k"]),
            "--overwrite_output_dir",
        ] + extra)
        curve = [
            {k: v for k, v in h.items()
             if k.startswith("retrieval_") or k in
             ("global_step", "rewards/accuracies", "loss")}
            for h in history if any(k.startswith("retrieval_") for k in h)
        ]
        return out2, history, curve

    def pref_accuracy(history):
        accs = [h["rewards/accuracies"] for h in history
                if "rewards/accuracies" in h]
        return float(np.mean(accs[-10:])) if accs else None

    for variant in ("rankpo", "sft"):
        with stage(f"stage2_{variant}"):
            out2, history, curve = stage2(variant)
            results[f"{variant}_retention_curve"] = curve
            results[f"{variant}_final_pref_accuracy"] = pref_accuracy(history)
        with stage(f"evaluate_{variant}"):
            results[f"{variant}_metrics"] = evaluate(out2, f"eval_{variant}")
            print(json.dumps(results[f"{variant}_metrics"], indent=2))

    # --- alignment-vs-retention FRONTIER: stage 2 at a sweep of LRs (the
    # reference's actual headline figure, imgs/rankpo_performance.png:
    # scripts/evaluate/run_rankpo_evaluate.sh sweeps lrs x seeds the same
    # way) -- RankPO's claim is better retention AT matched alignment as
    # LR pushes alignment up and SFT's retrieval collapses
    if args.frontier:
        frontier = []
        for lr in (args.frontier_lrs or p["frontier_lrs"]):
            for variant in ("rankpo", "sft"):
                tag = f"{variant}_lr{lr:g}"
                with stage(f"frontier_{tag}"):
                    out2, history, _ = stage2(variant, lr=lr,
                                              suffix=f"_lr{lr:g}")
                    m = evaluate(out2, f"eval_{tag}")
                    frontier.append({
                        "variant": variant, "lr": lr,
                        "pref_accuracy": pref_accuracy(history),
                        "nDCG@20": m.get("nDCG@20"),
                        "MRR@10": m.get("MRR@10"),
                    })
                    print(json.dumps(frontier[-1]))
        results["frontier"] = frontier

    # --- judge-alpha sweep: where does RankPO's retention edge appear as
    # the judge's relevance correlation rises? (round 4's alpha=0 judge
    # collapsed both variants at mid LR — VERDICT r04 missing #2)
    if args.alpha_sweep:
        sweep = []
        for alpha in args.alpha_sweep:
            ann_a, _, rel_agree_a = annotate(alpha)
            for variant in ("rankpo", "sft"):
                tag = f"{variant}_a{alpha:g}"
                with stage(f"alpha_{tag}"):
                    out2, history, _ = stage2(
                        variant, lr=args.alpha_sweep_lr,
                        suffix=f"_a{alpha:g}", train_file=ann_a,
                    )
                    m = evaluate(out2, f"eval_{tag}")
                    sweep.append({
                        "alpha": alpha, "variant": variant,
                        "lr": args.alpha_sweep_lr,
                        "judge_relevance_agreement": rel_agree_a,
                        "pref_accuracy": pref_accuracy(history),
                        "nDCG@20": m.get("nDCG@20"),
                        "MRR@10": m.get("MRR@10"),
                    })
                    print(json.dumps(sweep[-1]))
        results["alpha_sweep"] = sweep

    results["timings_s"] = timings
    results["preset"] = args.preset
    with open(os.path.join(root, "repro_results.json"), "w") as f:
        json.dump(results, f, indent=2)

    # ---- REPORT.md ----
    nd = "nDCG@20"
    lines = [
        "# Pipeline reproduction report",
        "",
        f"preset `{args.preset}` — {results['n_params']/1e6:.1f}M params, "
        f"{p['topics']*p['passages_per_topic']} corpus docs, "
        f"{p['train_queries']} train queries, {p['eval_queries']} eval queries",
        "",
        "## Per-stage wall-clock",
        "", "| stage | seconds |", "|---|---|",
    ]
    lines += [f"| {k} | {v} |" for k, v in timings.items()]
    lines += [
        "", "## Retrieval metrics (final eval)",
        "", "| model | " + " | ".join(
            k for k in results["stage1_metrics"]) + " |",
        "|---|" + "---|" * len(results["stage1_metrics"]),
    ]
    for name in ("stage1", "rankpo", "sft"):
        m = results[f"{name}_metrics"]
        lines.append(f"| {name} | " + " | ".join(
            f"{v:.4f}" for v in m.values()) + " |")
    lines += [
        "",
        "## Alignment vs retention",
        "",
        f"| variant | final pref accuracy | final {nd} |",
        "|---|---|---|",
    ]
    for name in ("rankpo", "sft"):
        acc = results[f"{name}_final_pref_accuracy"]
        ndv = results[f"{name}_metrics"].get(nd)
        lines.append(f"| {name} | {acc if acc is None else f'{acc:.3f}'} | "
                     f"{ndv:.4f} |")
    if results.get("frontier"):
        lines += [
            "", "## Alignment-vs-retention frontier (stage-2 LR sweep)", "",
            f"judge alpha = {results['judge_alpha']:g} "
            f"(relevance agreement "
            f"{results['judge_relevance_agreement']:.3f})", "",
            f"| variant | lr | pref accuracy | {nd} | MRR@10 |",
            "|---|---|---|---|---|",
        ]
        for f_ in results["frontier"]:
            lines.append(
                f"| {f_['variant']} | {f_['lr']:g} | "
                f"{f_['pref_accuracy']:.3f} | {f_[nd]:.4f} | "
                f"{f_['MRR@10']:.4f} |"
            )
    if results.get("alpha_sweep"):
        lines += [
            "", "## Judge-alpha sweep (relevance-correlation ablation)", "",
            f"stage-2 lr = {args.alpha_sweep_lr:g}; alpha = judge's "
            "relevance weight (0 = style-only, round 4's judge)", "",
            f"| alpha | judge rel. agreement | variant | pref accuracy | "
            f"{nd} | MRR@10 |",
            "|---|---|---|---|---|---|",
        ]
        for f_ in results["alpha_sweep"]:
            lines.append(
                f"| {f_['alpha']:g} | "
                f"{f_['judge_relevance_agreement']:.3f} | {f_['variant']} | "
                f"{f_['pref_accuracy']:.3f} | {f_[nd]:.4f} | "
                f"{f_['MRR@10']:.4f} |"
            )
    lines += ["", "## Retention curves (in-training hook, stage 2)", ""]
    for name in ("rankpo", "sft"):
        lines.append(f"### {name}")
        lines.append("")
        curve = results[f"{name}_retention_curve"]
        if curve:
            keys = [k for k in curve[0] if k != "global_step"]
            lines.append("| global_step | " + " | ".join(keys) + " |")
            lines.append("|---|" + "---|" * len(keys))
            for c in curve:
                lines.append(
                    f"| {c.get('global_step', '?')} | "
                    + " | ".join(f"{c.get(k, float('nan')):.4f}" for k in keys)
                    + " |")
        lines.append("")
    with open(os.path.join(root, "REPORT.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"\nwrote {root}/repro_results.json and {root}/REPORT.md")
    return results


if __name__ == "__main__":
    main()
