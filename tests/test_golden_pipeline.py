"""End-to-end golden test: an independent pure-numpy re-implementation of
the whole build + search pipeline, compared against the framework at small
scale.  Catches plumbing bugs (ELL packing, masking, padding) that unit
tests of individual ops can miss."""

import numpy as np
import pytest

from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.spectral.taumode import TAU_MIX


def golden_build_and_search(items, gp, query, tau):
    """Straight-line numpy reference of the documented pipeline."""
    n, f = items.shape
    eps, k, topk, p = gp["eps"], gp["k"], gp["topk"], gp["p"]
    sigma = gp["sigma"] if gp.get("sigma") is not None else eps * 0.5

    # item graph: rectified cosine, eps filter, k cap, union symmetrize
    xu = items / np.linalg.norm(items, axis=1, keepdims=True)
    dmat = 1.0 - np.maximum(xu @ xu.T, 0.0)
    np.fill_diagonal(dmat, np.inf)
    adj = np.zeros((n, n), dtype=bool)
    for r in range(n):
        nbrs = np.argsort(dmat[r], kind="stable")[:k]
        keep = dmat[r][nbrs] <= eps
        adj[r, nbrs[keep]] = True
    adj |= adj.T
    w = np.where(adj, 1.0 / (1.0 + (dmat / sigma) ** p), 0.0)
    # Default build semantics: auto-widen keeps EVERY union edge
    # (reference parity, GRAPH_VARIABLES.md:7-10) — so the effective
    # width cap is unbounded.  The rank machinery below still mirrors
    # the documented highest-weight-first / ties-by-column placement an
    # EXPLICIT ell_width would cap at (tests/test_hub_cap.py covers the
    # capped path).
    m = n
    rank = np.full((n, n), n * n, dtype=int)
    for r in range(n):
        cols_r = np.nonzero(adj[r])[0]
        order = sorted(cols_r, key=lambda c: (-w[r, c], c))
        for pos, c in enumerate(order):
            rank[r, c] = pos
    survives = adj & (rank < m) & (rank.T < m)
    w = np.where(survives, w, 0.0)
    lap = np.diag(w.sum(1)) - w

    # feature graph: binary Euclidean k-NN over raw columns, k_f = topk
    cols = items.T
    cd = np.sqrt(np.maximum(
        (cols**2).sum(1)[:, None] + (cols**2).sum(1)[None, :]
        - 2 * cols @ cols.T, 0))
    np.fill_diagonal(cd, np.inf)
    fmask = np.zeros((f, f), dtype=bool)
    kk = min(topk, f - 1)
    for r in range(f):
        fmask[r, np.argsort(cd[r], kind="stable")[:kk]] = True
    fmask |= fmask.T
    wf = fmask.astype(float)
    lf = np.diag(wf.sum(1)) - wf

    # taumode lambdas
    def lam(x):
        e = float(x @ lf @ x)
        m = np.array([wf[a, c] * (x[a] - x[c]) ** 2
                      for a in range(f) for c in range(a + 1, f)])
        tot = m.sum()
        g = min(((m / tot) ** 2).sum(), 1.0) if tot > 0 else 0.0
        return e, g

    es = np.array([lam(x)[0] for x in items])
    gs = np.array([lam(x)[1] for x in items])
    ts = np.median(es)
    lams = TAU_MIX * es / (es + ts) + (1 - TAU_MIX) * gs

    eq, gq = lam(query)
    lam_q = TAU_MIX * eq / (eq + ts) + (1 - TAU_MIX) * gq

    cos = xu @ (query / np.linalg.norm(query))
    score = tau * cos + (1 - tau) / (1 + np.abs(lams - lam_q))
    order = np.argsort(-score, kind="stable")[:topk]
    return lap, lams, lam_q, [(int(i), float(score[i])) for i in order]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pipeline_matches_golden(seed):
    rng = np.random.default_rng(seed)
    n, f = 60, 10
    items = rng.normal(size=(n, f)) + 0.3
    gp = {"eps": 0.8, "k": 5, "topk": 6, "p": 2.0, "sigma": 0.3}
    query = items[seed + 3] * 1.04
    tau = 0.7

    lap_g, lams_g, lam_q_g, hits_g = golden_build_and_search(
        items, gp, query, tau)
    aspace, gl = ArrowSpaceBuilder.build(gp, items)

    np.testing.assert_allclose(gl.to_dense(), lap_g, atol=1e-9)
    np.testing.assert_allclose(aspace.lambdas(), lams_g, rtol=1e-9)
    assert aspace.prepare_query_item(query, gl) == pytest.approx(lam_q_g,
                                                                 rel=1e-9)
    hits = aspace.search(query, gl, tau)
    assert [h[0] for h in hits] == [h[0] for h in hits_g]
    np.testing.assert_allclose([h[1] for h in hits],
                               [h[1] for h in hits_g], rtol=1e-9)
