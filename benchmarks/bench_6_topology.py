"""Topology-aware metrics: cosine vs lambda retrieval (port of
tests/test_6_beir_new_score.py): independent cosine k-NN graph (knn_k=15) +
greedy-modularity communities; G-RBP, TD-nDCG, IT-ERR, MRR-Topo, SQI@k,
RBO-S with the reference's weight vectors."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.protocols import (force_cpu_if_requested, out_dir, save_json,
                                  synthetic_duplicates, timed)

force_cpu_if_requested()

from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.eval.topology import (build_topology_graph,
                                            compute_topology_factor, g_rbp,
                                            it_err, mrr_topo, rbo_stability,
                                            sqi, td_ndcg)

TAU = 0.62
K_RESULTS = 20
K_EVAL = 10
KNN_K = 15                  # reference test_6:241
GRAPH_PARAMS = {"eps": 10.0, "k": 25, "topk": K_RESULTS, "p": 2.0,
                "sigma": None}
N_EVAL_QUERIES = 10


def main():
    corpus, groups = synthetic_duplicates(
        n_groups=60, per_group=25, dim=256, noise=0.25, scaling=100.0)
    print(f"corpus: {corpus.shape}")
    (aspace, gl), t_build = timed(ArrowSpaceBuilder.build, GRAPH_PARAMS,
                                  corpus)
    print(f"build: {t_build:.2f}s")

    xu = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    g, n2c = build_topology_graph(xu, knn_k=KNN_K)
    print(f"topology graph: {g.number_of_nodes()} nodes, "
          f"{g.number_of_edges()} edges")

    rng = np.random.default_rng(6)
    qidx = rng.choice(corpus.shape[0], N_EVAL_QUERIES, replace=False)

    agg = {m: {"cosine": [], "lambda": []}
           for m in ("g_rbp", "td_ndcg", "it_err", "mrr_topo", "sqi")}
    rbos = []
    for qi in qidx:
        q = corpus[qi] * 1.02
        relevant = groups[qi // 25]
        runs = {
            "cosine": [i for i, _ in aspace.search(q, gl, 1.0)],
            "lambda": [i for i, _ in aspace.search(q, gl, TAU)],
        }
        rbos.append(rbo_stability(runs["cosine"], runs["lambda"]))
        for name, retrieved in runs.items():
            rel = [1.0 if d in relevant else 0.0 for d in retrieved]
            tf = compute_topology_factor(g, int(qi), retrieved, n2c)
            agg["g_rbp"][name].append(g_rbp(rel, tf, k=K_EVAL))
            agg["td_ndcg"][name].append(td_ndcg(rel, tf, k=K_EVAL))
            agg["it_err"][name].append(it_err(rel, tf, k=K_EVAL,
                                              max_grade=1.0))
            agg["mrr_topo"][name].append(mrr_topo(rel, tf))
            agg["sqi"][name].append(sqi(g, retrieved, int(qi), n2c,
                                        k=K_EVAL))

    results = {"protocol": "topology_metrics (test_6 port)",
               "build_time_s": t_build, "tau": TAU,
               "rbo_stability": float(np.mean(rbos))}
    for m, vals in agg.items():
        c, l = float(np.mean(vals["cosine"])), float(np.mean(vals["lambda"]))
        results[m] = {"cosine": c, "lambda": l,
                      "improvement_pct": 100.0 * (l - c) / max(abs(c), 1e-12)}
        print(f"{m}: cosine={c:.4f} lambda={l:.4f}")
    save_json(out_dir("topology") / "results.json", results)


if __name__ == "__main__":
    main()
