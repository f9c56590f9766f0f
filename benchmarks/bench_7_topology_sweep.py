"""Topology metrics + tau sweep with summary report and plots (port of
tests/test_7_beir_new_score_sweep.py: taus [0.62, 0.8, 0.42, 0.0],
K_RESULTS=K_EVAL=50, KNN_K=10, per-tau comparisons + text summary +
the reference's artifact set — radar chart, metric heatmap, per-query
bars (reference test_7:500-878).  ARROWSPACE_PLOTS=0 disables plots."""

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
        means = {m: float(np.mean(v)) for m, v in per_metric.items()}
        return means, per_metric

    baseline, baseline_pq = evaluate(1.0)
    sweep, per_query = {"1.0": baseline}, {"1.0": baseline_pq}
    for tau in TAUS:
        sweep[str(tau)], per_query[str(tau)] = evaluate(tau)
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

    if os.environ.get("ARROWSPACE_PLOTS", "1") != "0":
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        metrics = list(baseline)
        taus = list(sweep)

        # Metric x tau heatmap (reference test_7 heatmaps).
        grid = np.array([[sweep[t][m] for m in metrics] for t in taus])
        fig, ax = plt.subplots(figsize=(8, 4))
        im = ax.imshow(grid, aspect="auto", cmap="viridis")
        ax.set_xticks(range(len(metrics)), metrics)
        ax.set_yticks(range(len(taus)), [f"tau={t}" for t in taus])
        ax.set_title("Topology metrics across tau")
        fig.colorbar(im)
        fig.tight_layout()
        fig.savefig(d / "heatmap.png", dpi=120)
        plt.close(fig)
        print(f"wrote {d / 'heatmap.png'}")

        # Radar chart: one polygon per tau over the 5 topology metrics
        # (reference test_7 radar charts).
        ang = np.linspace(0, 2 * np.pi, len(metrics), endpoint=False)
        ang_c = np.concatenate([ang, ang[:1]])
        fig, ax = plt.subplots(figsize=(6, 6),
                               subplot_kw=dict(projection="polar"))
        for t in taus:
            vals = [sweep[t][m] for m in metrics]
            vals_c = vals + vals[:1]
            ax.plot(ang_c, vals_c, label=f"tau={t}")
            ax.fill(ang_c, vals_c, alpha=0.08)
        ax.set_xticks(ang, metrics)
        ax.set_title("Topology metric profile per tau")
        ax.legend(loc="upper right", bbox_to_anchor=(1.25, 1.1))
        fig.tight_layout()
        fig.savefig(d / "radar.png", dpi=120)
        plt.close(fig)
        print(f"wrote {d / 'radar.png'}")

        # Per-query bars: cosine vs the best non-cosine tau on TD-nDCG
        # (reference test_7 per-query bar charts).
        best_tau = max((str(t) for t in TAUS),
                       key=lambda t: sweep[t]["td_ndcg"])
        width = 0.4
        x = np.arange(len(qidx))
        fig, ax = plt.subplots(figsize=(8, 3.5))
        ax.bar(x - width / 2, per_query["1.0"]["td_ndcg"], width,
               label="cosine (tau=1.0)")
        ax.bar(x + width / 2, per_query[best_tau]["td_ndcg"], width,
               label=f"tau={best_tau}")
        ax.set_xticks(x, [str(int(q)) for q in qidx], rotation=45)
        ax.set_xlabel("query id")
        ax.set_ylabel("TD-nDCG")
        ax.legend()
        fig.tight_layout()
        fig.savefig(d / "per_query_td_ndcg.png", dpi=120)
        plt.close(fig)
        print(f"wrote {d / 'per_query_td_ndcg.png'}")


if __name__ == "__main__":
    main()
