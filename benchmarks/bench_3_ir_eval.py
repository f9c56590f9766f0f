"""IR evaluation: recall@10 / MRR / nDCG@10 vs cosine + paired t-tests.

Port of the reference's MS MARCO (BeIR) protocol (tests/test_3_beir.py):
corpus cap, x100 scaling, graph {eps 10, k 25, topk 15, p 2, sigma None},
TAU=0.62, per-query metrics for cosine vs lambda-aware with paired t-tests,
JSON export in the reference's beir_evaluation_results.json schema
(tests/output/1761063134_v0_17_beir-msmarco/) so runs diff directly.

Data: real embeddings when ARROWSPACE_DATA_DIR holds the exported
{msmarco_corpus,msmarco_queries,msmarco_qrels}.{npy,json} files (the
reference's embedding stage output, tests/test_3_beir.py:66-82); otherwise
a synthetic heteroscedastic-cluster corpus with single-relevant queries —
per-cluster norm jitter gives lambda information cosine doesn't carry, so
the protocol is discriminative across tau/eps (see protocols.py).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.protocols import (ambiguous_single_relevant_queries,
                                  force_cpu_if_requested,
                                  heteroscedastic_clusters, load_beir_export,
                                  out_dir, save_json, spectral_margin_protocol,
                                  timed)

force_cpu_if_requested()

from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.eval.ir import evaluate_run, paired_t_test

TAU = 0.62
K_EVAL = 10
GRAPH_PARAMS = {"eps": 10.0, "k": 25, "topk": 15, "p": 2.0, "sigma": None}
N_EVAL_QUERIES = 200
SCALING = 100.0   # reference test_3_beir.py:19 (x100, lambda collapses at x1)


def load_protocol_data(seed_q: int = 3):
    """(corpus, queries, relevant, dataset_name) — real export or synthetic.

    ARROWSPACE_IR_REGIME selects the synthetic regime:
      "degrade" (default) — ambiguous-distractor queries where tau < 1
        trades recall for difficulty (the reference tau-SWEEP direction,
        recall 0.91 -> 0.89 -> 0.86);
      "margin" — planted hard negatives where tau=0.62 IMPROVES MRR/nDCG
        with recall tied (the reference FLAGSHIP direction, MRR +2.37%).
    Both regimes exist in the reference's recorded data (BASELINE.md).
    """
    import os
    real = load_beir_export("msmarco")
    if real is not None:
        corpus, queries, relevant = real
        # The reference scales embeddings x100 before build (test_3:190).
        return (corpus * SCALING, queries * SCALING, relevant,
                "MS MARCO (BeIR)")
    # BENCH_GROUPS=2048 reproduces the reference protocol's 81k x 768
    # scale (81,039 passages, BASELINE.md); the default stays
    # CPU-tractable.
    n_groups = int(os.environ.get("BENCH_GROUPS", 120))
    if os.environ.get("ARROWSPACE_IR_REGIME", "degrade") == "margin":
        corpus, queries, relevant, n_hn = spectral_margin_protocol(
            n_groups=n_groups, per_group=40, dim=768,
            n_queries=N_EVAL_QUERIES, seed=seed_q)
        return (corpus, queries, relevant,
                f"synthetic-spectral-margin(hn={n_hn})")
    corpus, _, _, _ = heteroscedastic_clusters(
        n_groups=n_groups, per_group=40, dim=768)
    queries, relevant = ambiguous_single_relevant_queries(
        corpus, N_EVAL_QUERIES, seed=seed_q, distractor_weight=(0.40, 0.85))
    return corpus, queries, relevant, "synthetic-heteroscedastic"


def run_eval(corpus, queries, relevant, graph_params=GRAPH_PARAMS, tau=TAU):
    """Build once, evaluate cosine (tau=1.0) and lambda-aware (tau) runs."""
    (aspace, gl), t_build = timed(ArrowSpaceBuilder.build, graph_params,
                                  corpus)
    runs = {}
    for name, t in [("cosine", 1.0), ("lambda_aware", tau)]:
        retrieved = [[i for i, _ in aspace.search(q, gl, t)]
                     for q in queries]
        runs[name] = evaluate_run(retrieved, relevant, k=K_EVAL)
    return runs, t_build, (aspace, gl)


def _metrics(run):
    return {"recall@10": run["mean_recall@k"], "mrr": run["mean_mrr"],
            "ndcg@10": run["mean_ndcg@k"]}


def _improvements(base, other):
    out = {}
    for key, b, o in [("recall@10_pct", base["mean_recall@k"],
                       other["mean_recall@k"]),
                      ("mrr_pct", base["mean_mrr"], other["mean_mrr"]),
                      ("ndcg@10_pct", base["mean_ndcg@k"],
                       other["mean_ndcg@k"])]:
        out[key] = 100.0 * (o - b) / b if b else 0.0
    return out


def main():
    corpus, queries, relevant, dataset = load_protocol_data()
    print(f"dataset: {dataset}, corpus: {corpus.shape}, "
          f"queries: {len(queries)}")

    runs, t_build, _ = run_eval(corpus, queries, relevant)
    print(f"build: {t_build:.2f}s")
    t_mrr, p_mrr = paired_t_test(runs["cosine"]["mrr"],
                                 runs["lambda_aware"]["mrr"])
    t_nd, p_nd = paired_t_test(runs["cosine"]["ndcg@k"],
                               runs["lambda_aware"]["ndcg@k"])

    # Reference beir_evaluation_results.json schema
    # (tests/output/1761063134_v0_17_beir-msmarco/), plus the t-tests the
    # reference prints to its text report.
    results = {
        "dataset": dataset,
        "dataset_size": int(corpus.shape[0]),
        "num_queries": len(queries),
        "tau": TAU,
        "metrics": {
            "cosine": _metrics(runs["cosine"]),
            "lambda_aware": _metrics(runs["lambda_aware"]),
            "improvements": _improvements(runs["cosine"],
                                          runs["lambda_aware"]),
        },
        "build_time_s": t_build,
        "t_test": {"mrr": {"t": t_mrr, "p": p_mrr},
                   "ndcg": {"t": t_nd, "p": p_nd}},
    }
    print({k: results["metrics"][k] for k in results["metrics"]})
    save_json(out_dir("ir_eval") / "beir_evaluation_results.json", results)


if __name__ == "__main__":
    main()
