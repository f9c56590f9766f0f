"""The honest lambda quality case: which corpus statistics make
lambda-aware search beat cosine, and by how much (VERDICT r3 item 4).

Background.  The reference's flagship quality result is real-data:
MS MARCO MRR +2.37% / nDCG@10 +1.78% at tau=0.62 with recall@10 tied
(reference tests/output/1761063134_v0_17_beir-msmarco/
beir_evaluation_results.json, protocol tests/test_3_beir.py:224-381).
On NEUTRAL synthetic data (equal-norm isotropic clusters) lambda-aware
LOSES slightly (recorded 1786935188_ir_eval: MRR -1.87%) — the lambda
channel carries no information there and tau<1 only dilutes cosine.
This study characterizes the transition: it sweeps the two planted
mechanisms the reference corpus plausibly has —

  * norm heteroscedasticity (per-cluster norm dispersion; raw MiniLM
    embeddings are NOT unit-norm and the reference builds on raw x100
    embeddings, test_3_beir.py:190), and
  * hard cosine negatives (wrong-cluster items within a small cosine
    margin of the relevant item — the canonical IR failure mode)

— and at every sweep point records both the measured quality delta
(MRR/nDCG vs cosine, paired t-test) and GENERATOR-AGNOSTIC corpus
statistics (protocols.corpus_stats: norm_cv, log_norm_std, anisotropy,
TwoNN intrinsic dim).  The artifact therefore maps MEASURABLE statistics
-> expected lambda delta: compute corpus_stats on your own embedding
export and read off the regime.  docs/QUALITY.md is the runbook;
tests/test_recorded_artifacts.py pins the recorded sweep's shape.

Output: benchmarks/output/<ts>_lambda_regimes/lambda_regimes.json
Env: ARROWSPACE_CPU=1 to force CPU; BENCH_SEEDS / BENCH_QUERIES to
resize.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.protocols import (corpus_stats, force_cpu_if_requested,
                                  out_dir, save_json,
                                  spectral_margin_protocol)

force_cpu_if_requested()

from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.eval.ir import evaluate_run, paired_t_test

TAU = 0.62
K_EVAL = 10
GRAPH_PARAMS = {"eps": 10.0, "k": 25, "topk": 15, "p": 2.0, "sigma": None}
DIM = 256
N_GROUPS = 24
PER_GROUP = 40

# Sweep axes.  scale_ratio r -> scale_range (1/sqrt(r), sqrt(r)); r=1 is
# the equal-norm (cosine-sufficient) corpus.  hn_frac is the fraction of
# queries with a planted hard cosine negative in a different-norm cluster.
SCALE_AXIS = [1.0, 1.3, 1.8, 3.0]        # at hn_frac = 0.15
HN_AXIS = [0.0, 0.08, 0.25]              # at scale_ratio = 3.0
NEUTRAL = ("neutral", 1.0, 0.0)          # no mechanism at all: small loss


def one_point(scale_ratio: float, hn_frac: float, seed: int,
              n_queries: int):
    r = np.sqrt(scale_ratio)
    corpus, queries, relevant, n_hn = spectral_margin_protocol(
        n_groups=N_GROUPS, per_group=PER_GROUP, dim=DIM,
        n_queries=n_queries, seed=seed, hn_frac=hn_frac,
        scale_range=(1.0 / r, r),
        min_scale_ratio=min(1.25, max(scale_ratio, 1.0)))
    aspace, gl = ArrowSpaceBuilder.build(GRAPH_PARAMS, corpus)
    runs = {}
    for name, t in [("cosine", 1.0), ("lambda_aware", TAU)]:
        retrieved = [[i for i, _ in aspace.search(q, gl, t)]
                     for q in queries]
        runs[name] = evaluate_run(retrieved, relevant, k=K_EVAL)
    _, p_mrr = paired_t_test(runs["cosine"]["mrr"],
                             runs["lambda_aware"]["mrr"])
    lam = np.asarray(aspace.lambdas())
    stats = corpus_stats(corpus)
    stats["lambda_cv"] = float(lam.std() / max(lam.mean(), 1e-30))
    return {
        "scale_ratio": scale_ratio, "hn_frac": hn_frac, "seed": seed,
        "n_hard_negatives_planted": int(n_hn),
        "stats": stats,
        "cosine": {"mrr": runs["cosine"]["mean_mrr"],
                   "ndcg@10": runs["cosine"]["mean_ndcg@k"],
                   "recall@10": runs["cosine"]["mean_recall@k"]},
        "lambda_aware": {"mrr": runs["lambda_aware"]["mean_mrr"],
                         "ndcg@10": runs["lambda_aware"]["mean_ndcg@k"],
                         "recall@10": runs["lambda_aware"]["mean_recall@k"]},
        "delta_mrr_pct": 100.0 * (runs["lambda_aware"]["mean_mrr"]
                                  - runs["cosine"]["mean_mrr"])
                         / max(runs["cosine"]["mean_mrr"], 1e-30),
        "delta_ndcg_pct": 100.0 * (runs["lambda_aware"]["mean_ndcg@k"]
                                   - runs["cosine"]["mean_ndcg@k"])
                          / max(runs["cosine"]["mean_ndcg@k"], 1e-30),
        "p_mrr": p_mrr,
    }


def main():
    seeds = [int(s) for s in
             os.environ.get("BENCH_SEEDS", "11,12,13").split(",")]
    n_queries = int(os.environ.get("BENCH_QUERIES", 60))
    points = []
    configs = ([("scale_axis", r, 0.15) for r in SCALE_AXIS]
               + [("hn_axis", 3.0, h) for h in HN_AXIS]
               + [NEUTRAL])
    for tag, r, h in configs:
        per_seed = []
        for s in seeds:
            res = one_point(r, h, s, n_queries)
            res["axis"] = tag
            per_seed.append(res)
            print(f"{tag:10s} scale={r:4.2f} hn={h:4.2f} seed={s}: "
                  f"dMRR {res['delta_mrr_pct']:+6.2f}% "
                  f"dnDCG {res['delta_ndcg_pct']:+6.2f}% "
                  f"(norm_cv {res['stats']['norm_cv']:.3f}, "
                  f"lam_cv {res['stats']['lambda_cv']:.3f}, "
                  f"p {res['p_mrr']:.3g})", flush=True)
        points.extend(per_seed)

    # Aggregate per config for the headline table.
    agg = []
    for tag, r, h in configs:
        sel = [p for p in points
               if p["axis"] == tag and p["scale_ratio"] == r
               and p["hn_frac"] == h]
        agg.append({
            "axis": tag, "scale_ratio": r, "hn_frac": h,
            "mean_delta_mrr_pct": float(np.mean(
                [p["delta_mrr_pct"] for p in sel])),
            "min_delta_mrr_pct": float(np.min(
                [p["delta_mrr_pct"] for p in sel])),
            "mean_delta_ndcg_pct": float(np.mean(
                [p["delta_ndcg_pct"] for p in sel])),
            "mean_norm_cv": float(np.mean(
                [p["stats"]["norm_cv"] for p in sel])),
            "mean_lambda_cv": float(np.mean(
                [p["stats"]["lambda_cv"] for p in sel])),
            "mean_recall_gap_pct": float(np.mean(
                [100.0 * (p["lambda_aware"]["recall@10"]
                          - p["cosine"]["recall@10"])
                 / max(p["cosine"]["recall@10"], 1e-30) for p in sel])),
        })
        a = agg[-1]
        print(f"== {tag:10s} scale={r:4.2f} hn={h:4.2f}: "
              f"mean dMRR {a['mean_delta_mrr_pct']:+6.2f}% "
              f"(min {a['min_delta_mrr_pct']:+6.2f}%), "
              f"norm_cv {a['mean_norm_cv']:.3f}", flush=True)

    results = {
        "protocol": "spectral_margin_protocol sweep over "
                    "(scale_ratio, hn_frac); see module docstring",
        "tau": TAU, "k_eval": K_EVAL, "graph_params": GRAPH_PARAMS,
        "dim": DIM, "n_groups": N_GROUPS, "per_group": PER_GROUP,
        "seeds": seeds, "n_queries": n_queries,
        "aggregate": agg, "points": points,
    }
    save_json(out_dir("lambda_regimes") / "lambda_regimes.json", results)


if __name__ == "__main__":
    main()
