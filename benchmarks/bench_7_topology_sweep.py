"""Topology metrics + tau sweep with summary report (port of
tests/test_7_beir_new_score_sweep.py: taus [0.62, 0.8, 0.42, 0.0],
K_RESULTS=K_EVAL=50, KNN_K=10, per-tau comparisons + text summary; the
reference's ~370 lines of radar/heatmap plotting are replaced by an
optional matplotlib heatmap gated on ARROWSPACE_PLOTS=1)."""

import os
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
                                            it_err, mrr_topo, sqi, td_ndcg)

TAUS = [0.62, 0.8, 0.42, 0.0]        # reference test_7:28
K_RESULTS = K_EVAL = 20              # reference uses 50; scaled to corpus
KNN_K = 10                           # reference test_7:36
GRAPH_PARAMS = {"eps": 10.0, "k": 25, "topk": K_RESULTS, "p": 2.0,
                "sigma": None}


def main():
    corpus, groups = synthetic_duplicates(
        n_groups=60, per_group=25, dim=256, noise=0.25, scaling=100.0)
    (aspace, gl), t_build = timed(ArrowSpaceBuilder.build, GRAPH_PARAMS,
                                  corpus)
    xu = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    g, n2c = build_topology_graph(xu, knn_k=KNN_K)

    rng = np.random.default_rng(7)
    qidx = rng.choice(corpus.shape[0], 10, replace=False)

    def evaluate(tau):
        per_metric = {m: [] for m in ("g_rbp", "td_ndcg", "it_err",
                                      "mrr_topo", "sqi")}
        for qi in qidx:
            q = corpus[qi] * 1.02
            relevant = groups[qi // 25]
            retrieved = [i for i, _ in aspace.search(q, gl, tau)]
            rel = [1.0 if d in relevant else 0.0 for d in retrieved]
            tf = compute_topology_factor(g, int(qi), retrieved, n2c)
            per_metric["g_rbp"].append(g_rbp(rel, tf, k=K_EVAL))
            per_metric["td_ndcg"].append(td_ndcg(rel, tf, k=K_EVAL))
            per_metric["it_err"].append(it_err(rel, tf, k=K_EVAL,
                                               max_grade=1.0))
            per_metric["mrr_topo"].append(mrr_topo(rel, tf))
            per_metric["sqi"].append(sqi(g, retrieved, int(qi), n2c,
                                         k=K_EVAL))
        return {m: float(np.mean(v)) for m, v in per_metric.items()}

    baseline = evaluate(1.0)
    sweep = {"1.0": baseline}
    for tau in TAUS:
        sweep[str(tau)] = evaluate(tau)
        print(f"tau={tau}: {sweep[str(tau)]}")

    d = out_dir("topology_sweep")
    lines = ["Topology-aware tau sweep (test_7 port)",
             f"build: {t_build:.2f}s, corpus {corpus.shape}", ""]
    for tau, vals in sweep.items():
        lines.append(f"tau={tau}:")
        for m, v in vals.items():
            delta = 100.0 * (v - baseline[m]) / max(abs(baseline[m]), 1e-12)
            lines.append(f"  {m}: {v:.4f} ({delta:+.2f}% vs cosine)")
    (d / "summary_report.txt").write_text("\n".join(lines) + "\n")
    print(f"wrote {d / 'summary_report.txt'}")
    save_json(d / "sweep.json", {"sweep": sweep, "build_time_s": t_build})

    if os.environ.get("ARROWSPACE_PLOTS") == "1":
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        metrics = list(baseline)
        taus = list(sweep)
        grid = np.array([[sweep[t][m] for m in metrics] for t in taus])
        fig, ax = plt.subplots(figsize=(8, 4))
        im = ax.imshow(grid, aspect="auto", cmap="viridis")
        ax.set_xticks(range(len(metrics)), metrics)
        ax.set_yticks(range(len(taus)), [f"tau={t}" for t in taus])
        fig.colorbar(im)
        fig.tight_layout()
        fig.savefig(d / "heatmap.png", dpi=120)
        print(f"wrote {d / 'heatmap.png'}")


if __name__ == "__main__":
    main()
