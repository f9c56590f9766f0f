"""Config-sensitivity pins: the tau/eps sweeps must MOVE, with the
reference's qualitative shape.

Reference recorded response (the parity spec):
  * tau sweep 1.0 -> 0.62 -> 0.42: recall@10 0.91 -> 0.89 -> 0.86,
    nDCG/MRR decreasing alongside
    (tests/output/1761063804_v0_17_msmarco_tausweep/beir_tau_sweep_results.json)
  * eps sweep 5 / 10 / 15 at tau=0.62: nDCG 0.5955 / 0.5986 / 0.5997 —
    metrics differ per eps
    (tests/output/1761065864_v0_17_msmarco_epssweep/beir_eps_sweep_results.json)

The synthetic heteroscedastic protocol (benchmarks/protocols.py) is designed
to exhibit the same response: per-cluster norm jitter spreads lambda across
clusters (cosine can't see it), single-relevant ambiguous queries sit at the
ranking margin, and eps reaches the lambdas through the reduction stage's
centroid budget (reference passes eps into with_dims_reduction,
src/lib.rs:283).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.protocols import (ambiguous_single_relevant_queries,
                                  heteroscedastic_clusters)
from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.eval.ir import evaluate_run
from pyarrowspace_tpu.reduction.pipeline import select_k

N_GROUPS, PER_GROUP, DIM = 120, 40, 192   # 4800 items >= reduction_min_n
N_QUERIES = 150


@pytest.fixture(scope="module")
def protocol():
    corpus, _, _, _ = heteroscedastic_clusters(N_GROUPS, PER_GROUP, DIM)
    queries, relevant = ambiguous_single_relevant_queries(
        corpus, N_QUERIES, seed=7, distractor_weight=0.6)
    return corpus, queries, relevant


def _run(aspace, gl, queries, relevant, tau):
    # One batched dispatch for all queries (identical rankings to the
    # per-query aspace.search loop, which tests/test_search.py pins) —
    # 150 single-query dispatches per sweep point dominated this file's
    # wall-clock.
    idx, _ = aspace.search_batch(np.asarray(queries), gl, tau)
    return evaluate_run([list(map(int, row)) for row in idx],
                        relevant, k=10)


def test_tau_sweep_monotone_response(protocol):
    """Diluting cosine with the lambda term degrades single-relevant
    retrieval monotonically across tau 1.0 -> 0.62 -> 0.42 (reference
    recorded shape)."""
    corpus, queries, relevant = protocol
    gp = {"eps": 10.0, "k": 25, "topk": 15, "p": 2.0, "sigma": None}
    aspace, gl = ArrowSpaceBuilder.build(gp, corpus)

    runs = {tau: _run(aspace, gl, queries, relevant, tau)
            for tau in (1.0, 0.62, 0.42)}
    mrr = [runs[t]["mean_mrr"] for t in (1.0, 0.62, 0.42)]
    ndcg = [runs[t]["mean_ndcg@k"] for t in (1.0, 0.62, 0.42)]
    rec = [runs[t]["mean_recall@k"] for t in (1.0, 0.62, 0.42)]

    assert mrr[0] > mrr[1] > mrr[2], f"MRR not strictly decreasing: {mrr}"
    assert ndcg[0] > ndcg[1] > ndcg[2], f"nDCG not strictly decreasing: {ndcg}"
    assert rec[0] >= rec[1] >= rec[2] and rec[0] > rec[2], (
        f"recall@10 not decreasing overall: {rec}")
    # The response is a perturbation, not a collapse (reference drops ~5%
    # from tau=1.0 to 0.42, not to zero).
    assert ndcg[2] > 0.8 * ndcg[0]


def test_eps_sweep_moves_lambdas_and_metrics(protocol):
    """eps reaches the lambdas via the reduction stage; different eps must
    produce different lambdas and different tau=0.62 metrics (the reference
    eps sweep moves nDCG at every step)."""
    corpus, queries, relevant = protocol
    runs, lams = {}, {}
    for eps in (5.0, 15.0):
        gp = {"eps": eps, "k": 25, "topk": 15, "p": 2.0, "sigma": None}
        aspace, gl = ArrowSpaceBuilder.build(gp, corpus)
        lams[eps] = np.asarray(aspace.lambdas())
        runs[eps] = _run(aspace, gl, queries, relevant, 0.62)

    assert not np.allclose(lams[5.0], lams[15.0]), (
        "eps change did not move the lambdas")
    assert float(np.abs(lams[5.0] - lams[15.0]).max()) > 1e-3
    moved = any(
        abs(runs[5.0][f"mean_{m}"] - runs[15.0][f"mean_{m}"]) > 1e-6
        for m in ("mrr", "ndcg@k", "recall@k"))
    assert moved, f"eps sweep metrics identical: {runs}"


def test_select_k_responds_to_eps():
    """K budget grows logarithmically with eps; eps=1.31 reproduces the
    reference's observed K range [178, 179] at the 313k corpus
    (suggested_eps.md:7-10)."""
    n_keep = int(round(313841 * 0.6))
    assert select_k(n_keep, 0) == 174          # eps-free heuristic
    assert select_k(n_keep, 0, 1.31) == 177    # closer to observed 178
    ks = [select_k(n_keep, 0, e) for e in (5.0, 10.0, 15.0)]
    assert ks[0] < ks[1] < ks[2]
    assert select_k(100, 0, 1e-3) >= 16        # clamp floor survives tiny eps
