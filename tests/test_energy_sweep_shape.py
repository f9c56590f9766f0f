"""Pin the EnergyMaps diffusion-sweep SHAPE (reference recorded behavior).

Reference sweep (tests/output/1761234699_v0_18_energymaps_8_sweep/
diffusion_sweep_results.csv): best configs in the low-eta region
(eta=0.05 -> MRR 1.0, nDCG 0.99), degenerate at high eta x steps
(eta=0.1, steps=8 -> nDCG 0.0).  This framework reproduces the shape via
explicit-Euler diffusion with a real stability limit (energy/maps._diffuse)
plus map-mediated retrieval (ops/search.energy_routed_topk_batch): small
steps denoise the energy map, steps past the stability limit blow it up
and retrieval collapses.

Protocol = bench_8's: heteroscedastic corpus, relevant set := standard
build's cosine top-10, directional query perturbation.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.protocols import heteroscedastic_clusters
from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.eval.ir import mrr, ndcg_at_k

GP = {"eps": 1.31, "k": 25, "topk": 15, "p": 2.0, "sigma": 0.535}
N_QUERIES = 15


@pytest.fixture(scope="module")
def protocol():
    corpus, _, _, _ = heteroscedastic_clusters(80, 21, 384, scaling=12.0)
    aspace_std, gl_std = ArrowSpaceBuilder.build(GP, corpus)
    rng = np.random.default_rng(8)
    qidx = rng.choice(corpus.shape[0], N_QUERIES, replace=False)
    gq = rng.normal(size=(N_QUERIES, corpus.shape[1]))
    gq /= np.linalg.norm(gq, axis=1, keepdims=True)
    norms = np.linalg.norm(corpus[qidx], axis=1, keepdims=True)
    queries = corpus[qidx] + 0.05 * norms * gq
    relevant = [set(i for i, _ in aspace_std.search(q, gl_std, 1.0)[:10])
                for q in queries]
    return corpus, queries, relevant


def _energy_metrics(corpus, queries, relevant, eta, steps):
    cfg = {"optical_tokens": 40, "eta": eta, "steps": steps}
    aspace, gl = ArrowSpaceBuilder.build_energy(corpus, cfg, GP)
    mrrs, ndcgs = [], []
    for q, rel in zip(queries, relevant):
        hits = [i for i, _ in aspace.search_energy(q, gl, 20, 1.0, 0.5)]
        mrrs.append(mrr(hits, rel))
        ndcgs.append(ndcg_at_k(hits, rel, 10))
    return float(np.mean(mrrs)), float(np.mean(ndcgs))


def test_energy_sweep_shape(protocol):
    corpus, queries, relevant = protocol
    best_mrr, best_ndcg = _energy_metrics(corpus, queries, relevant,
                                          0.05, 6)
    mid_mrr, _ = _energy_metrics(corpus, queries, relevant, 0.25, 4)
    worst_mrr, worst_ndcg = _energy_metrics(corpus, queries, relevant,
                                            0.25, 8)

    # Best region: low eta, MRR >= 0.9 (reference: MRR 1.0 at 0.05/6).
    assert best_mrr >= 0.9, (best_mrr, best_ndcg)
    assert best_ndcg >= 0.7
    # Degradation toward the high-eta corner; the eta x steps extreme
    # is degenerate relative to the best region (reference: nDCG 0.0).
    assert worst_mrr <= mid_mrr + 0.05
    assert worst_mrr < 0.75 * best_mrr, (best_mrr, mid_mrr, worst_mrr)
    assert worst_ndcg < 0.75 * best_ndcg
