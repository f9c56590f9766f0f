"""EnergyMaps pipeline behavior (reference src/lib.rs:303-376; test_8/9
protocol shape)."""

import numpy as np
import pytest

from pyarrowspace_tpu import ArrowSpaceBuilder

GP = {"eps": 1.31, "k": 10, "topk": 8, "p": 2.0, "sigma": 0.535}


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(8)
    base = rng.normal(size=(20, 32))
    items = np.repeat(base, 40, axis=0) + 0.2 * rng.normal(size=(800, 32))
    return items * 12.0


def test_energy_build_shapes(corpus):
    aspace, gle = ArrowSpaceBuilder.build_energy(
        corpus, {"optical_tokens": 30, "eta": 0.05, "steps": 4}, GP)
    assert aspace.nitems == 800
    assert len(aspace.lambdas()) == 800          # lambdas_len == nitems
    # Nodes: optical_tokens + 2 per split centroid; split fraction is
    # 1 - split_quantile (default 0.9) => ~3 splits of 30.
    assert 30 <= gle.nnodes <= 3 * 30
    assert gle.shape() == (gle.nnodes, gle.nnodes)


def test_energy_compression_dominates(corpus):
    """graph_nodes must be orders of magnitude below nitems (observed:
    313,841 items -> 120 nodes in the reference)."""
    _, gle = ArrowSpaceBuilder.build_energy(
        corpus, {"optical_tokens": 25}, GP)
    assert gle.nnodes < 100 < corpus.shape[0] * 12


def test_energy_search_path(corpus):
    aspace, gle = ArrowSpaceBuilder.build_energy(
        corpus, {"optical_tokens": 30, "eta": 0.05, "steps": 4}, GP)
    rng = np.random.default_rng(0)
    q = corpus[100] + 0.05 * rng.normal(size=32)
    hits = aspace.search_energy(q, gle, 20)
    assert len(hits) == 20
    scores = [s for _, s in hits]
    assert scores == sorted(scores, reverse=True)
    # default weight parity (w_lambda=1.0, w_dirichlet=0.5)
    assert hits == aspace.search_energy(q, gle, 20, 1.0, 0.5)


def test_oversmoothing_degenerates_node_table(corpus):
    """Reference sweep: the largest eta x steps configs are degenerate
    (BASELINE.md worst config, nDCG 0.0).  Diffusion is explicit-Euler
    heat with a true stability limit (energy/maps._diffuse): past it the
    high-frequency modes amplify and the node energies blow up — the
    degenerate regime — while a small step size keeps them at the
    undiffused scale."""
    a_light, _ = ArrowSpaceBuilder.build_energy(
        corpus, {"optical_tokens": 30, "eta": 0.05, "steps": 2}, GP)
    a_heavy, _ = ArrowSpaceBuilder.build_energy(
        corpus, {"optical_tokens": 30, "eta": 0.25, "steps": 8}, GP)
    light_spread = np.std(np.asarray(a_light._energy_maps.node_dirichlet))
    heavy_spread = np.std(np.asarray(a_heavy._energy_maps.node_dirichlet))
    assert np.isfinite(heavy_spread)       # diverged, not NaN
    assert heavy_spread > 10.0 * light_spread


def test_energy_defaults_without_params(corpus):
    aspace, gle = ArrowSpaceBuilder.build_energy(corpus[:200])
    assert aspace.nitems == 200
    assert gle.nnodes >= 2


def test_energy_build_tiny_corpus():
    """README quickstart shape: build_energy on a 3-item corpus (the
    sampler clamps K below optical_tokens; the pipeline must follow the
    actual centroid count)."""
    items = np.array([[0.1, 0.2, 0.3], [0.0, 0.5, 0.1], [0.9, 0.1, 0.0]])
    aspace, gle = ArrowSpaceBuilder.build_energy(
        items, {"optical_tokens": 40, "eta": 0.05, "steps": 4},
        {"eps": 1.0, "k": 6, "topk": 3, "p": 2.0, "sigma": 1.0})
    hits = aspace.search_energy(np.array([0.05, 0.2, 0.25]), gle, k=20)
    assert len(hits) == 3


def test_routed_equals_fallback_when_pool_covers(corpus):
    """One scoring formula on both paths (VERDICT r3 item 9): with a
    probe wide enough that the candidate pool covers the whole corpus,
    the routed search must return the SAME ranking and scores as the
    exact fallback scan — no discontinuity between paths (reference pool
    semantics, src/lib.rs:311-323)."""
    import jax.numpy as jnp
    from pyarrowspace_tpu.ops import search as search_ops

    aspace, gle = ArrowSpaceBuilder.build_energy(
        corpus, {"optical_tokens": 30, "eta": 0.05, "steps": 4,
                 "candidate_m": 10_000}, GP)
    rng = np.random.default_rng(3)
    for qi in (5, 250, 617):
        q = corpus[qi] + 0.05 * rng.normal(size=32)
        routed = aspace.search_energy(q, gle, 12)
        # Exact fallback on the full corpus, bypassing routing.
        from pyarrowspace_tpu.ops.rayleigh import (rayleigh_batch,
                                                   dispersion_batch)
        from pyarrowspace_tpu.spectral.taumode import synthesize
        qj = jnp.asarray(q, dtype=aspace._data.dtype).reshape(1, -1)
        e_q = rayleigh_batch(qj, aspace._lap_f, normalized=False)
        g_q = dispersion_batch(qj, aspace._w_f, e_q)
        lam_q = synthesize(e_q, g_q, aspace._tau_star, aspace._tau_mix)
        idx, vals = search_ops.energy_topk(
            aspace._data, aspace._lambdas, aspace._e_raw, aspace._lap_f,
            qj[0], lam_q[0], e_q[0], aspace._tau_star,
            jnp.asarray(1.0, dtype=aspace._data.dtype),
            jnp.asarray(0.5, dtype=aspace._data.dtype), 12)
        exact = [(int(i), float(s)) for i, s in zip(np.asarray(idx),
                                                    np.asarray(vals))]
        assert [i for i, _ in routed] == [i for i, _ in exact]
        np.testing.assert_allclose([s for _, s in routed],
                                   [s for _, s in exact], rtol=1e-9)
