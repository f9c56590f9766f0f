"""Tau sweep over the IR protocol (port of tests/test_4_msmarco_tau_sweep.py:
tau in {1.0, 0.62, 0.51}, improvements vs cosine, best-tau analysis)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.protocols import (force_cpu_if_requested, out_dir, save_json,
                                  synthetic_duplicates, timed)

force_cpu_if_requested()

from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.eval.ir import evaluate_run, paired_t_test

TAUS = [1.0, 0.62, 0.51]   # reference test_4:18-22
K_EVAL = 10
GRAPH_PARAMS = {"eps": 10.0, "k": 25, "topk": 15, "p": 2.0, "sigma": None}


def main():
    corpus, groups = synthetic_duplicates(
        n_groups=300, per_group=50, dim=768, noise=0.3, scaling=100.0)
    (aspace, gl), t_build = timed(ArrowSpaceBuilder.build, GRAPH_PARAMS,
                                  corpus)
    print(f"build: {t_build:.2f}s")

    rng = np.random.default_rng(4)
    per_group = 50
    qidx = rng.choice(corpus.shape[0], size=50, replace=False)
    # Ambiguous queries: each mixes in a distractor cluster's direction so
    # retrieval is genuinely hard and metrics move across configs (pure
    # in-cluster noise leaves high-dim clusters trivially separable).
    distractor = corpus[rng.permutation(qidx)]
    queries = (0.7 * corpus[qidx] + 0.68 * distractor
               + 0.1 * np.abs(corpus).mean() * rng.normal(
                   size=(50, corpus.shape[1])))
    relevant = [groups[qi // per_group] - {qi} for qi in qidx]

    sweep = {}
    baseline = None
    for tau in TAUS:
        retrieved = [[i for i, _ in aspace.search(q, gl, tau)]
                     for q in queries]
        run = evaluate_run(retrieved, relevant, k=K_EVAL)
        entry = {k: v for k, v in run.items() if k.startswith("mean")}
        if tau == 1.0:
            baseline = run
        else:
            t, p = paired_t_test(baseline["ndcg@k"], run["ndcg@k"])
            entry["ndcg_vs_cosine_t"] = t
            entry["ndcg_vs_cosine_p"] = p
            entry["ndcg_improvement_pct"] = (
                100.0 * (entry["mean_ndcg@k"] - baseline["mean_ndcg@k"])
                / max(baseline["mean_ndcg@k"], 1e-12))
        sweep[str(tau)] = entry
        print(f"tau={tau}: {entry}")

    best_tau = max(sweep, key=lambda t: sweep[t]["mean_ndcg@k"])
    results = {"protocol": "tau_sweep (test_4 port)",
               "build_time_s": t_build, "sweep": sweep, "best_tau": best_tau}
    save_json(out_dir("tau_sweep") / "beir_tau_sweep_results.json", results)


if __name__ == "__main__":
    main()
