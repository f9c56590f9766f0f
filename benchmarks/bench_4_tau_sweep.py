"""Tau sweep over the IR protocol (port of tests/test_4_msmarco_tau_sweep.py).

The recorded reference run sweeps tau {1.0, 0.62, 0.42} and its metrics
respond monotonically — recall@10 0.91 -> 0.89 -> 0.86
(tests/output/1761063804_v0_17_msmarco_tausweep/beir_tau_sweep_results.json);
output uses that artifact's results_by_mode schema.  The synthetic protocol
reproduces the qualitative response (heteroscedastic clusters: lambda is
informative, and diluting cosine with the lambda-proximity term degrades
single-relevant retrieval monotonically); tests/test_sweep_response.py pins
the shape.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.protocols import (ambiguous_single_relevant_queries,
                                  force_cpu_if_requested,
                                  heteroscedastic_clusters, load_beir_export,
                                  out_dir, save_json, timed)

force_cpu_if_requested()

from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.eval.ir import evaluate_run, paired_t_test

# Mode names + taus from the recorded reference artifact.
TAU_MODES = {"cosine": 1.0, "taumode": 0.62, "extra-taumode": 0.42}
K_EVAL = 10
GRAPH_PARAMS = {"eps": 10.0, "k": 25, "topk": 15, "p": 2.0, "sigma": None}
N_EVAL_QUERIES = 200


def main():
    real = load_beir_export("msmarco")
    if real is not None:
        corpus, queries, relevant = real
        corpus, queries = corpus * 100.0, queries * 100.0
        dataset = "MS MARCO (BeIR)"
    else:
        # BENCH_GROUPS=2048 reproduces the reference sweep's 81k x 768
        # scale; the default stays CPU-tractable.
        import os
        n_groups = int(os.environ.get("BENCH_GROUPS", 120))
        corpus, _, _, _ = heteroscedastic_clusters(
            n_groups=n_groups, per_group=40, dim=768)
        queries, relevant = ambiguous_single_relevant_queries(
            corpus, N_EVAL_QUERIES, seed=3, distractor_weight=(0.40, 0.85))
        dataset = f"synthetic-heteroscedastic-{corpus.shape[0]}"
    (aspace, gl), t_build = timed(ArrowSpaceBuilder.build, GRAPH_PARAMS,
                                  corpus)
    print(f"dataset: {dataset} {corpus.shape}, build: {t_build:.2f}s")

    results_by_mode = {}
    baseline = None
    for mode, tau in TAU_MODES.items():
        retrieved = [[i for i, _ in aspace.search(q, gl, tau)]
                     for q in queries]
        run = evaluate_run(retrieved, relevant, k=K_EVAL)
        entry = {"tau": tau,
                 "metrics": {"recall@10": run["mean_recall@k"],
                             "mrr": run["mean_mrr"],
                             "ndcg@10": run["mean_ndcg@k"]}}
        if baseline is None:
            baseline = run
        else:
            imp = {}
            for key, b, o in [
                    ("recall@10_pct", baseline["mean_recall@k"],
                     run["mean_recall@k"]),
                    ("mrr_pct", baseline["mean_mrr"], run["mean_mrr"]),
                    ("ndcg@10_pct", baseline["mean_ndcg@k"],
                     run["mean_ndcg@k"])]:
                imp[key] = 100.0 * (o - b) / b if b else 0.0
            entry["improvements_vs_cosine"] = imp
            t, p = paired_t_test(baseline["ndcg@k"], run["ndcg@k"])
            entry["ndcg_t_test"] = {"t": t, "p": p}
        results_by_mode[mode] = entry
        print(f"{mode} (tau={tau}): {entry['metrics']}")

    results = {
        "dataset": dataset,
        "dataset_size": int(corpus.shape[0]),
        "num_queries": len(queries),
        "graph_params": GRAPH_PARAMS,
        "tau_modes": TAU_MODES,
        "results_by_mode": results_by_mode,
        "build_time_s": t_build,
    }
    save_json(out_dir("tau_sweep") / "beir_tau_sweep_results.json", results)


if __name__ == "__main__":
    main()
