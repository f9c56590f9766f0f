"""Known-value checks for the eval metric library (the parity yardstick)."""

import math

import numpy as np
import pytest

from pyarrowspace_tpu.eval.ir import (average_precision, dcg_at_k, mrr,
                                      ndcg_at_k, paired_t_test,
                                      precision_at_k, rank_agreement,
                                      recall_at_k, tail_analysis,
                                      evaluate_run)
from pyarrowspace_tpu.eval.topology import (build_topology_graph,
                                            compute_modularity_delta,
                                            compute_topology_factor, g_rbp,
                                            it_err, mrr_topo, rbo_stability,
                                            sqi, td_ndcg)


def test_recall_precision_mrr():
    retrieved = [5, 3, 9, 1, 7]
    relevant = {3, 1, 100}
    assert recall_at_k(retrieved, relevant, 5) == pytest.approx(2 / 3)
    assert recall_at_k(retrieved, relevant, 2) == pytest.approx(1 / 3)
    assert precision_at_k(retrieved, relevant, 5) == pytest.approx(2 / 5)
    assert mrr(retrieved, relevant) == pytest.approx(1 / 2)
    assert mrr(retrieved, {42}) == 0.0


def test_average_precision():
    # hits at ranks 1 and 3 of 2 relevant: AP = (1/1 + 2/3)/2
    assert average_precision([1, 2, 3], {1, 3}) == pytest.approx(
        (1.0 + 2 / 3) / 2)


def test_ndcg_known_value():
    # binary relevance, hit at ranks 1 and 3, two relevant total
    got = ndcg_at_k([1, 2, 3], {1, 3}, 3)
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert got == pytest.approx(dcg / idcg)
    assert ndcg_at_k([9, 8], {1}, 2) == 0.0
    # perfect ranking => 1.0
    assert ndcg_at_k([1, 3], {1, 3}, 2) == pytest.approx(1.0)


def test_dcg():
    assert dcg_at_k([3, 2, 1], 2) == pytest.approx(3 + 2 / math.log2(3))


def test_paired_t_test():
    a = [0.5, 0.6, 0.7, 0.4, 0.55]
    b = [x + 0.1 for x in a]
    t, p = paired_t_test(a, b)
    assert p < 0.01 and t < 0
    t, p = paired_t_test(a, a)
    assert p == 1.0


def test_rank_agreement_perfect():
    out = rank_agreement([1, 2, 3, 4], [2, 4, 6, 8])
    assert out["spearman"] == pytest.approx(1.0)
    assert out["kendall"] == pytest.approx(1.0)


def test_tail_analysis():
    scores = np.exp(-np.linspace(0, 5, 100))
    out = tail_analysis(scores)
    assert out["head_mean"] > out["tail_mean"]
    assert 0 <= out["tail_head_ratio"] < 1
    assert out["decay_rate"] < 0


def test_evaluate_run_aggregates():
    out = evaluate_run([[1, 2], [3, 4]], [{1}, {9}], k=2)
    assert out["mean_recall@k"] == pytest.approx(0.5)
    assert out["mean_mrr"] == pytest.approx(0.5)
    assert out["n_queries"] == 2


def test_rbo():
    assert rbo_stability([1, 2, 3], [1, 2, 3]) == pytest.approx(
        (1 - 0.9) * (1 + 0.9 + 0.81))
    assert rbo_stability([1, 2], [3, 4]) == 0.0


def test_topology_metrics_smoke():
    rng = np.random.default_rng(0)
    # two well-separated clusters
    emb = np.vstack([rng.normal(0, 0.1, size=(20, 8)) + 1,
                     rng.normal(0, 0.1, size=(20, 8)) - 1])
    g, n2c = build_topology_graph(emb, knn_k=5)
    assert g.number_of_nodes() == 40
    # a result set inside one cluster has high community purity
    assert compute_modularity_delta({0, 1, 2, 3}, n2c) == 1.0
    tf = compute_topology_factor(g, 0, [1, 2, 21], n2c)
    assert len(tf) == 3
    assert all(0 <= t <= 1.5 for t in tf)
    rel = [1.0, 0.0, 1.0]
    assert g_rbp(rel, tf, k=3) > 0
    assert 0 <= td_ndcg(rel, tf, k=3) <= 1.0 + 1e-9
    assert it_err(rel, tf, k=3) > 0
    assert mrr_topo(rel, tf) == pytest.approx(tf[0] / 1)
    assert sqi(g, [1, 2, 3], 0, n2c) > 0


def test_mrr_topo_no_relevant():
    assert mrr_topo([0, 0], [0.5, 0.5]) == 0.0
