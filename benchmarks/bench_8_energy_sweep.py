"""EnergyMaps diffusion sweep (port of tests/test_8_CVE_db_sweep.py):
eta {0.05, 0.15, 0.25} x steps {4, 6, 8}, OPTICAL_TOKENS=40; relevant set :=
top-10 of a standard build; search_energy(k=20, w_l=1.0, w_D=0.5); MRR /
MAP / recall / nDCG vs the standard baseline; per-config failure isolation;
CSV grid."""

import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.protocols import (force_cpu_if_requested,
                                  heteroscedastic_clusters, out_dir,
                                  save_csv, save_json, timed)

force_cpu_if_requested()

from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.eval.ir import (average_precision, mrr, ndcg_at_k,
                                      recall_at_k)

ETAS = [0.05, 0.15, 0.25]    # reference test_8:30-32
STEPS = [4, 6, 8]
OPTICAL_TOKENS = 40
GRAPH_PARAMS = {"eps": 1.31, "k": 25, "topk": 15, "p": 2.0, "sigma": 0.535}
K_SEARCH = 20
N_QUERIES = 15


def run_sweep(corpus, etas=ETAS, steps_list=STEPS, n_queries=N_QUERIES):
    # Standard-build top-10 defines the relevant set (reference test_8:237).
    (aspace_std, gl_std), t_std = timed(ArrowSpaceBuilder.build,
                                        GRAPH_PARAMS, corpus)
    rng = np.random.default_rng(8)
    qidx = rng.choice(corpus.shape[0], n_queries, replace=False)
    # Directional perturbation at constant magnitude: lambda is
    # magnitude-sensitive by design (TAUMODE), so a pure-scaling query
    # (x1.02) shifts every energy systematically; direction noise keeps
    # the query inside its item's energy cell like a re-embedded near
    # duplicate would be.
    gq = rng.normal(size=(n_queries, corpus.shape[1]))
    gq /= np.linalg.norm(gq, axis=1, keepdims=True)
    norms = np.linalg.norm(corpus[qidx], axis=1, keepdims=True)
    queries = corpus[qidx] + 0.05 * norms * gq
    relevant = [set(i for i, _ in aspace_std.search(q, gl_std, 1.0)[:10])
                for q in queries]

    rows = []
    for eta in etas:
        for steps in steps_list:
            cfg = {"optical_tokens": OPTICAL_TOKENS, "eta": eta,
                   "steps": steps}
            try:
                (aspace_e, gl_e), t_e = timed(
                    ArrowSpaceBuilder.build_energy, corpus, cfg,
                    GRAPH_PARAMS)
                mrrs, maps, recs, ndcgs, recs20 = [], [], [], [], []
                for q, rel in zip(queries, relevant):
                    hits = [i for i, _ in aspace_e.search_energy(
                        q, gl_e, K_SEARCH, 1.0, 0.5)]
                    mrrs.append(mrr(hits, rel))
                    maps.append(average_precision(hits, rel))
                    recs.append(recall_at_k(hits, rel, 10))
                    ndcgs.append(ndcg_at_k(hits, rel, 10))
                    recs20.append(recall_at_k(hits, rel, 20))
                # Column names/order follow the reference artifact
                # (tests/output/1761234699_v0_18_energymaps_8_sweep/
                # diffusion_sweep_results.csv) so runs diff directly;
                # status/graph_nodes are appended extras.
                rows.append({
                    "eta": eta, "steps": steps,
                    "build_time": round(t_e, 2),
                    "avg_mrr": round(float(np.mean(mrrs)), 4),
                    "avg_map": round(float(np.mean(maps)), 4),
                    "avg_ndcg": round(float(np.mean(ndcgs)), 4),
                    "avg_recall@10": round(float(np.mean(recs)), 4),
                    "avg_recall@20": round(float(np.mean(recs20)), 4),
                    "status": "OK", "graph_nodes": gl_e.nnodes,
                })
            except Exception as e:   # isolation (reference test_8:293-295)
                rows.append({"eta": eta, "steps": steps, "status": "FAILED",
                             "error": repr(e)})
                traceback.print_exc()
            print(rows[-1])
    return rows, t_std


def _plot_heatmap(rows, d):
    """eta x steps MRR heatmap (reference test_8:347-425)."""
    import os
    if os.environ.get("ARROWSPACE_PLOTS", "1") == "0":
        return
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    ok = [r for r in rows if r["status"] == "OK"]
    etas = sorted({r["eta"] for r in ok})
    steps = sorted({r["steps"] for r in ok})
    grid = np.full((len(etas), len(steps)), np.nan)
    for r in ok:
        grid[etas.index(r["eta"]), steps.index(r["steps"])] = r["avg_mrr"]
    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(grid, aspect="auto", cmap="viridis", vmin=0, vmax=1)
    ax.set_xticks(range(len(steps)), [f"steps={s}" for s in steps])
    ax.set_yticks(range(len(etas)), [f"eta={e}" for e in etas])
    for i in range(len(etas)):
        for j in range(len(steps)):
            if np.isfinite(grid[i, j]):
                ax.text(j, i, f"{grid[i, j]:.2f}", ha="center",
                        va="center", color="white")
    ax.set_title("EnergyMaps diffusion sweep — MRR")
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(d / "diffusion_sweep_heatmap.png", dpi=120)
    plt.close(fig)
    print(f"wrote {d / 'diffusion_sweep_heatmap.png'}")


def main():
    # Heteroscedastic clusters: per-cluster norm/noise jitter spreads the
    # energies so the (cosine-free) energy index has signal to route on.
    corpus, _, _, _ = heteroscedastic_clusters(
        n_groups=80, per_group=21, dim=384, scaling=12.0)
    print(f"corpus: {corpus.shape}")
    rows, t_std = run_sweep(corpus)
    d = out_dir("energy_sweep")
    save_csv(d / "diffusion_sweep_results.csv", rows)
    _plot_heatmap(rows, d)
    ok = [r for r in rows if r["status"] == "OK"]
    best = max(ok, key=lambda r: r["avg_mrr"]) if ok else None
    save_json(d / "summary.json",
              {"protocol": "energy_sweep (test_8 port)",
               "standard_build_s": t_std, "best": best})


if __name__ == "__main__":
    main()
