"""IR evaluation: recall@10 / MRR / nDCG@10 vs cosine + paired t-tests.

Port of the reference's MS MARCO (BeIR) protocol (tests/test_3_beir.py):
corpus cap, x100 scaling, graph {eps 10, k 25, topk 15, p 2, sigma None},
TAU=0.62, per-query metrics for cosine vs lambda-aware with paired t-tests,
JSON export.  Synthetic clustered fallback with planted qrels.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.protocols import (force_cpu_if_requested, out_dir, save_json,
                                  synthetic_duplicates, timed,
                                  try_load_real_embeddings)

force_cpu_if_requested()

from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.eval.ir import (evaluate_run, paired_t_test)

TAU = 0.62
K_EVAL = 10
GRAPH_PARAMS = {"eps": 10.0, "k": 25, "topk": 15, "p": 2.0, "sigma": None}
N_EVAL_QUERIES = 50


def run_eval(corpus, groups, graph_params=GRAPH_PARAMS, tau=TAU,
             n_queries=N_EVAL_QUERIES, seed=3):
    (aspace, gl), t_build = timed(ArrowSpaceBuilder.build, graph_params,
                                  corpus)
    rng = np.random.default_rng(seed)
    per_group = len(next(iter(groups))) if groups else 0
    qidx = rng.choice(corpus.shape[0], size=n_queries, replace=False)
    # Ambiguous queries: each mixes in a distractor cluster's direction so
    # retrieval is genuinely hard and metrics move across configs (pure
    # in-cluster noise leaves high-dim clusters trivially separable).
    distractor = corpus[rng.permutation(qidx)]
    queries = (0.7 * corpus[qidx] + 0.68 * distractor
               + 0.1 * np.abs(corpus).mean() * rng.normal(
                   size=(n_queries, corpus.shape[1])))

    runs = {}
    for name, t in [("cosine", 1.0), ("lambda", tau)]:
        retrieved = [[i for i, _ in aspace.search(q, gl, t)]
                     for q in queries]
        relevant = [groups[qi // per_group] - {qi} for qi in qidx]
        runs[name] = evaluate_run(retrieved, relevant, k=K_EVAL)
    return runs, t_build, (aspace, gl)


def main():
    emb = try_load_real_embeddings("msmarco")
    if emb is not None:
        corpus, groups = emb, None
        raise SystemExit("real-embedding mode requires qrels; "
                         "use the synthetic protocol")
    corpus, groups = synthetic_duplicates(
        n_groups=400, per_group=50, dim=768, noise=0.3, scaling=100.0)
    print(f"corpus: {corpus.shape}")

    runs, t_build, _ = run_eval(corpus, groups)
    t_mrr, p_mrr = paired_t_test(runs["cosine"]["mrr"], runs["lambda"]["mrr"])
    t_nd, p_nd = paired_t_test(runs["cosine"]["ndcg@k"],
                               runs["lambda"]["ndcg@k"])

    results = {
        "protocol": "ir_eval (test_3 port)",
        "n_items": int(corpus.shape[0]),
        "build_time_s": t_build,
        "tau": TAU,
        "cosine": {k: v for k, v in runs["cosine"].items()
                   if k.startswith("mean") or k in ("k", "n_queries")},
        "lambda": {k: v for k, v in runs["lambda"].items()
                   if k.startswith("mean") or k in ("k", "n_queries")},
        "t_test": {"mrr": {"t": t_mrr, "p": p_mrr},
                   "ndcg": {"t": t_nd, "p": p_nd}},
    }
    print(results)
    save_json(out_dir("ir_eval") / "beir_evaluation_results.json", results)


if __name__ == "__main__":
    main()
