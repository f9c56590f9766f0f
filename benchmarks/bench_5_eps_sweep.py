"""Eps sweep with per-config build-time and failure tracking (port of
tests/test_5_msmarco_eps_sweep.py: eps = BASE_EPS * {0.5, 1.0, 1.5}; each
config's failure is isolated and recorded as FAILED, the sweep continues).

Output uses the recorded reference artifact's results_by_eps schema
(tests/output/1761065864_v0_17_msmarco_epssweep/beir_eps_sweep_results.json),
where nDCG@10 moves across eps (0.5955 / 0.5986 / 0.5997).  Here eps reaches
the lambdas through the reduction stage (the reference binding passes eps
into with_dims_reduction, src/lib.rs:283): different eps -> different
centroid budget -> different feature-Laplacian signals -> different
lambdas -> the tau=0.62 metrics move.  tests/test_sweep_response.py pins
the non-degeneracy.
"""

import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.protocols import (ambiguous_single_relevant_queries,
                                  force_cpu_if_requested,
                                  heteroscedastic_clusters, load_beir_export,
                                  out_dir, save_json, timed)

force_cpu_if_requested()

from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.eval.ir import evaluate_run

BASE_EPS = 10.0
EPS_VALUES = [BASE_EPS * m for m in (0.5, 1.0, 1.5)]   # test_5:19-23
TAU = 0.62
K_EVAL = 10
N_EVAL_QUERIES = 200


def main():
    import os
    real = load_beir_export("msmarco")
    if real is not None:
        corpus, queries, relevant = real
        corpus, queries = corpus * 100.0, queries * 100.0
        dataset = "MS MARCO (BeIR)"
    else:
        # BENCH_GROUPS=2048 reproduces the reference sweep's 81k x 768
        # scale (81,039 passages — BASELINE.md); the default stays
        # CPU-tractable.
        n_groups = int(os.environ.get("BENCH_GROUPS", 120))
        corpus, _, _, _ = heteroscedastic_clusters(
            n_groups=n_groups, per_group=40, dim=768)
        queries, relevant = ambiguous_single_relevant_queries(
            corpus, N_EVAL_QUERIES, seed=5, distractor_weight=(0.40, 0.85))
        dataset = f"synthetic-heteroscedastic-{corpus.shape[0]}"
    print(f"dataset: {dataset} {corpus.shape}")

    results_by_eps = {}
    successful, failed = [], []
    for eps in EPS_VALUES:
        gp = {"eps": eps, "k": 25, "topk": 15, "p": 2.0, "sigma": None}
        try:
            (aspace, gl), t_build = timed(ArrowSpaceBuilder.build, gp, corpus)
            retrieved = [[i for i, _ in aspace.search(q, gl, TAU)]
                         for q in queries]
            run = evaluate_run(retrieved, relevant, k=K_EVAL)
            results_by_eps[str(eps)] = {
                "eps": eps, "build_status": "SUCCESS",
                "build_time": t_build,
                "metrics": {"recall@10": run["mean_recall@k"],
                            "mrr": run["mean_mrr"],
                            "ndcg@10": run["mean_ndcg@k"]}}
            successful.append(eps)
        except Exception as e:  # failure isolation (reference test_5:181-216)
            results_by_eps[str(eps)] = {"eps": eps, "build_status": "FAILED",
                                        "error": repr(e)}
            failed.append(eps)
            traceback.print_exc()
        print(f"eps={eps}: {results_by_eps[str(eps)]}")

    ok = {e: results_by_eps[str(e)]["metrics"] for e in successful}
    best = {}
    if ok:
        for key, label in [("recall@10", "best_recall"), ("mrr", "best_mrr"),
                           ("ndcg@10", "best_ndcg")]:
            e = max(ok, key=lambda v: ok[v][key])
            best[label] = {"eps": e, "value": ok[e][key]}

    results = {
        "dataset": dataset,
        "dataset_size": int(corpus.shape[0]),
        "num_queries": len(queries),
        "tau": TAU,
        "scaling": 100.0,
        "eps_sweep": {"base_eps": BASE_EPS, "tested_values": EPS_VALUES,
                      "successful_values": successful,
                      "failed_values": failed},
        "results_by_eps": results_by_eps,
        "best_configs": best,
    }
    save_json(out_dir("eps_sweep") / "beir_eps_sweep_results.json", results)


if __name__ == "__main__":
    main()
